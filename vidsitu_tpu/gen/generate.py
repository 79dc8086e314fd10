"""Task-level generation wrappers (reference: forward_gen methods +
EvalB_Gen wiring, mdl_sf_base.py:657-675, evl_vsitu.py:159-214)."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from ..models.srl_models import SRLModel
from .beam import (
    GenConfig,
    ancestry_reorder,
    beam_search,
    tile_for_beams,
)

SRL_DECODE_LEN = 60  # fallback when cfg.gen.max_len_b is unset (<=0)


def make_srl_generator(
    model: SRLModel,
    gen_cfg: GenConfig,
    vocab_size: int,
    pad_id: int,
    bos_id: int,
    eos_id: int,
    unk_id=None,
    max_len: int = 0,
    max_positions: int = 1024,
    mesh=None,
    ancestry: bool = True,
    seg_min: int = 64,
) -> Callable[[Any, Dict[str, jnp.ndarray]], jnp.ndarray]:
    """Build a jitted generate(variables, inp) -> (B, 5, 1, max_len).

    Decoding is verb-forced: the first generated token is the event's
    verb id, as in the reference (prefix_tokens, mdl_sf_base.py:660-663).

    Decode length honors ``cfg.gen.max_len_b`` (ref default 200,
    configs/vsitu_cfg.yml:80) capped at the decoder's position table, the
    same bound fairseq applies (seq_gen.py:233-239).

    Latency contract: the decode runs SEGMENTED (``seg_min`` > 0, the
    default) — the KV cache starts at ``seg_min`` positions and doubles
    between while_loop segments, so a generous max_len_b budget costs
    like the length actually generated when every beam hits EOS early
    (the quota early-exit skips the remaining segments). Token-exact vs
    the single-loop decode; set seg_min=0 (cfg.tpu.seg_decode_min) to
    disable.
    """
    if max_len <= 0:
        max_len = gen_cfg.max_len_b if gen_cfg.max_len_b > 0 else SRL_DECODE_LEN
        # fairseq budget: max_len_a * src_len + max_len_b
        # (seq_gen.py:233-239). The reference's forward_gen always sets
        # src_tokens to the single forced verb token
        # (mdl_sf_base.py:658-663), so src_len == 1 for every SRL model.
        max_len += int(gen_cfg.max_len_a) * 1
    max_len = min(max_len, max_positions - 1)
    k = gen_cfg.beam_size

    n_steps = max_len + 1
    seg_bounds: tuple = ()
    if seg_min and seg_min > 0:
        b = int(seg_min)
        while b < n_steps:
            seg_bounds = seg_bounds + (b,)
            b *= 2
    cache_len0 = (seg_bounds[0] + 1) if seg_bounds else (max_len + 1)

    # shard decode over the data mesh like training: params replicated,
    # batch split on the data axis (the per-row beam state stays local to
    # each device — no collectives in the decode loop); policy lives in
    # parallel/mesh.maybe_shard_jit
    from ..parallel.mesh import maybe_shard_jit

    def generate(variables, inp):
        toks = inp["seq_out_by_ev"][:, :, 0, :]
        b = toks.shape[0]
        rows = b * 5
        prefix = toks.reshape(rows, -1)[:, :1].astype(jnp.int32)

        enc_out, enc_mask = model.apply(
            variables, inp, method=SRLModel.gen_encode
        )
        if enc_out is not None:
            enc_out = tile_for_beams(enc_out, k)
        enc_mask_t = tile_for_beams(enc_mask, k) if enc_mask is not None else None

        cache = model.apply(
            variables, rows * k, cache_len0, enc_out,
            method=SRLModel.gen_build_cache,
        )
        reorder_fn = None
        if ancestry and k > 1:
            # ancestry-mode beam decode: KV rows stay slot-major; the
            # (rows, K, L) int32 table below replaces the per-step
            # full-cache gather (gen/beam.ancestry_reorder,
            # transformer.attend_ancestry)
            cache["anc"] = jnp.tile(
                jnp.arange(k, dtype=jnp.int32)[None, :, None],
                (rows, 1, cache_len0),
            )
            reorder_fn = ancestry_reorder

        def grow_cache(cache_, new_len):
            """Pad the self-attention K/V (and the ancestry table) from
            the current segment length to ``new_len``. Cross K/V are
            enc-length and never grow. New ancestry positions are the
            identity, the same state the unsegmented table holds beyond
            the write cursor (each step's trailing identity write in
            ancestry_reorder re-establishes it before first read)."""
            out = dict(cache_)
            new_layers = []
            for entry in cache_["layers"]:
                e2 = dict(entry)
                for kk in ("self_k", "self_v"):
                    x = entry[kk]
                    pad = jnp.zeros(
                        (x.shape[0], new_len - x.shape[1]) + x.shape[2:],
                        x.dtype,
                    )
                    e2[kk] = jnp.concatenate([x, pad], axis=1)
                new_layers.append(e2)
            out["layers"] = new_layers
            if "anc" in cache_:
                a = cache_["anc"]
                ident = jnp.tile(
                    jnp.arange(k, dtype=a.dtype)[None, :, None],
                    (a.shape[0], 1, new_len - a.shape[2]),
                )
                out["anc"] = jnp.concatenate([a, ident], axis=2)
            return out

        def step_fn(last_tok, pos, cache_):
            from ..models.common import make_padding_mask

            m = make_padding_mask(enc_mask_t) if enc_mask_t is not None else None
            logits, cache2 = model.apply(
                variables, last_tok, pos, cache_, m,
                method=SRLModel.gen_decode_step,
            )
            return logits[:, 0], cache2

        seqs, scores, lens = beam_search(
            step_fn,
            cache,
            batch_size=rows,
            max_len=max_len,
            bos_id=bos_id,
            eos_id=eos_id,
            pad_id=pad_id,
            vocab_size=vocab_size,
            gen_cfg=gen_cfg,
            prefix_tokens=prefix,
            unk_id=unk_id,
            reorder_cache_fn=reorder_fn,
            seg_bounds=seg_bounds if seg_bounds else None,
            grow_cache_fn=grow_cache if seg_bounds else None,
        )
        # top beam only, shaped like the reference out_sents (B, 5, 1, L);
        # L = max_len + 1 (content budget + terminating eos)
        return seqs[:, 0].reshape(b, 5, 1, seqs.shape[-1])

    return maybe_shard_jit(generate, mesh)
