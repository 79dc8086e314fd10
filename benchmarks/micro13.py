"""Beam-5 decode cost decomposition (round 3, VERDICT weak #4).

Round 2 reported 74.1 ms/video for beam-5 vs 5.6 greedy (13x for 5x the
beams) with no breakdown. This reconstructs the bench decode5 geometry
(flagship sfpret_txe_txd_vbarg, tiny graft dims, bs=16 videos -> 80
sentences x 5 beams = 400 rows, 200-token budget) and times cumulative
variants of the while_loop body:

  A  step_fn only                (model KV-cache step cost)
  B  + lprobs/topk/grow          (candidate machinery)
  C  + finalize bookkeeping      (EOS quota logic)
  D  + cache gather (production) (beam reordering traffic)
  D' D but gather self-cache only (static cross-K/V excluded)

plus the production beam_search at K=5 and K=1 for calibration.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _setup
from vidsitu_tpu.data import build_comm
from vidsitu_tpu.gen.beam import (
    GenConfig,
    NEG_INF,
    _gather_beams,
    beam_search,
    tile_for_beams,
)
from vidsitu_tpu.models.common import make_padding_mask
from vidsitu_tpu.models.srl_models import SRLModel


def timed(fn, iters=5):
    trivial = jax.jit(lambda: jnp.zeros((1,), jnp.int32))
    np.asarray(fn())
    np.asarray(trivial())
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(trivial())
    rtt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn())
    return (time.perf_counter() - t0) / iters - rtt


def main():
    bs = 16
    cfg, model, variables, batch = _setup(bs=bs)
    cfg.gen.beam_size = 5
    comm = build_comm(cfg)
    gen = GenConfig.from_cfg(cfg.gen)
    k = gen.beam_size
    max_len = min(gen.max_len_b, 1023)
    n_steps = max_len + 1
    seq_len = n_steps + 1
    vocab = len(comm.gpt2_hf_tok)
    pad_id = comm.gpt2_hf_tok.pad_token_id
    eos_id = comm.gpt2_hf_tok.eos_token_id

    dev_batch = {kk: jnp.asarray(v) for kk, v in batch.items()}
    toks = dev_batch["seq_out_by_ev"][:, :, 0, :]
    sent = bs * 5
    rows = sent * k

    enc_out, enc_mask = model.apply(
        variables, dev_batch, method=SRLModel.gen_encode
    )
    enc_out_t = tile_for_beams(enc_out, k) if enc_out is not None else None
    enc_mask_t = tile_for_beams(enc_mask, k) if enc_mask is not None else None
    cache0 = model.apply(
        variables, rows, max_len + 1, enc_out_t,
        method=SRLModel.gen_build_cache,
    )

    cache_mb = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(cache0)
    ) / 1e6
    self_mb = sum(
        x.size * x.dtype.itemsize
        for e in cache0["layers"] for kk, x in e.items()
        if kk.startswith("self_")
    ) / 1e6
    print(f"rows={rows} vocab={vocab} steps={n_steps} "
          f"cache={cache_mb:.1f}MB (self {self_mb:.1f}MB, "
          f"cross {cache_mb - self_mb:.1f}MB)")

    def step_fn(last_tok, pos, cache_):
        m = make_padding_mask(enc_mask_t) if enc_mask_t is not None else None
        logits, cache2 = model.apply(
            variables, last_tok, pos, cache_, m,
            method=SRLModel.gen_decode_step,
        )
        return logits[:, 0], cache2

    # ---------------- cumulative variants ----------------
    def make_variant(level):
        """level: 'A' step only, 'B' +cand, 'C' +fin, 'D' +gather,
        'S' gather self-only."""

        @jax.jit
        def run():
            alive_seq = jnp.full((rows, seq_len), pad_id, jnp.int32)
            alive_scores = jnp.tile(
                jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (sent,)
            ).reshape(sent, k)
            fin_seq = jnp.full((sent, k, seq_len), pad_id, jnp.int32)
            fin_scores = jnp.full((sent, k), NEG_INF, jnp.float32)
            fin_lens = jnp.zeros((sent, k), jnp.int32)

            def body(state):
                t, aseq, ascores, cache, fseq, fscores, flens = state
                last = jax.lax.dynamic_slice(aseq, (0, t), (rows, 1))
                logits, cache = step_fn(last, t, cache)
                out_carry = logits.mean()
                if level == "A":
                    return (t + 1, aseq, ascores, cache, fseq,
                            fscores + out_carry * 1e-20, flens)
                lp = jax.nn.log_softmax(
                    logits.reshape(rows, vocab).astype(jnp.float32), axis=-1
                )
                cand = ascores.reshape(rows, 1) + lp
                cand = cand.reshape(sent, k * vocab)
                top_scores, top_idx = jax.lax.top_k(cand, 2 * k)
                beam_idx = top_idx // vocab
                tok_idx = top_idx % vocab
                src = aseq.reshape(sent, k, seq_len)
                grown = jnp.take_along_axis(src, beam_idx[:, :, None], axis=1)
                grown = jax.lax.dynamic_update_slice(
                    grown, tok_idx[:, :, None].astype(jnp.int32), (0, 0, t + 1)
                )
                is_eos = tok_idx == eos_id
                alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
                new_ascores, alive_sel = jax.lax.top_k(alive_cand, k)
                new_aseq = jnp.take_along_axis(
                    grown, alive_sel[:, :, None], axis=1
                ).reshape(rows, seq_len)
                if level in ("C", "D", "S"):
                    rank_ok = jnp.arange(2 * k)[None, :] < k
                    eos_valid = is_eos & rank_ok & (top_scores > NEG_INF / 2)
                    eos_scores = jnp.where(eos_valid, top_scores, NEG_INF)
                    allf = jnp.concatenate([fscores, eos_scores], axis=1)
                    alls = jnp.concatenate([fseq, grown], axis=1)
                    alll = jnp.concatenate(
                        [flens, jnp.full(eos_scores.shape, t + 1, jnp.int32)],
                        axis=1)
                    big = 10 * k
                    ep = jnp.where(fscores > NEG_INF / 2,
                                   jnp.arange(k)[None, :],
                                   big + jnp.arange(k)[None, :])
                    cp = jnp.where(eos_valid, k + jnp.arange(2 * k)[None, :],
                                   2 * big + jnp.arange(2 * k)[None, :])
                    _, sel = jax.lax.top_k(
                        -jnp.concatenate([ep, cp], axis=1), k)
                    fscores = jnp.take_along_axis(allf, sel, axis=1)
                    fseq = jnp.take_along_axis(alls, sel[:, :, None], axis=1)
                    flens = jnp.take_along_axis(alll, sel, axis=1)
                if level in ("D", "S"):
                    orig_beam = jnp.take_along_axis(beam_idx, alive_sel, axis=1)
                    if level == "D":
                        cache = _gather_beams(cache, orig_beam, sent, k)
                    else:
                        dyn = {"layers": [
                            {kk: e[kk] for kk in ("self_k", "self_v")}
                            for e in cache["layers"]]}
                        dyn = _gather_beams(dyn, orig_beam, sent, k)
                        cache = {"layers": [
                            dict(e, **d) for e, d in
                            zip(cache["layers"], dyn["layers"])]}
                return (t + 1, new_aseq, new_ascores, cache, fseq,
                        fscores, flens)

            def cond(state):
                return state[0] < n_steps

            state = (jnp.asarray(0, jnp.int32), alive_seq, alive_scores,
                     cache0, fin_seq, fin_scores, fin_lens)
            out = jax.lax.while_loop(cond, body, state)
            return out[2].sum() + out[5].sum()

        return run

    for level, label in [("A", "A step_fn only"),
                         ("B", "B +cand/topk/grow"),
                         ("C", "C +finalize"),
                         ("D", "D +gather FULL cache (production)"),
                         ("S", "D' gather self-cache only")]:
        dt = timed(make_variant(level))
        print(f"{label:<38} {dt * 1000:8.1f} ms total  "
              f"{dt / bs * 1000:6.2f} ms/video")

    # production beam_search end-to-end, K=5 and K=1
    for kk in (5, 1):
        cfg.gen.beam_size = kk
        g = GenConfig.from_cfg(cfg.gen)
        rows_k = sent * kk
        enc_t = tile_for_beams(enc_out, kk) if enc_out is not None else None
        msk_t = tile_for_beams(enc_mask, kk) if enc_mask is not None else None
        c0 = model.apply(variables, rows_k, max_len + 1, enc_t,
                         method=SRLModel.gen_build_cache)

        def sf(last_tok, pos, cache_, msk_t=msk_t):
            m = make_padding_mask(msk_t) if msk_t is not None else None
            logits, c2 = model.apply(
                variables, last_tok, pos, cache_, m,
                method=SRLModel.gen_decode_step)
            return logits[:, 0], c2

        prefix = toks.reshape(sent, -1)[:, :1].astype(jnp.int32)

        @jax.jit
        def full():
            seqs, scores, lens = beam_search(
                sf, c0, batch_size=sent, max_len=max_len,
                bos_id=comm.gpt2_hf_tok.bos_token_id, eos_id=eos_id,
                pad_id=pad_id, vocab_size=vocab, gen_cfg=g,
                prefix_tokens=prefix,
            )
            return scores.sum()

        dt = timed(full)
        print(f"production beam_search K={kk:<2}            "
              f"{dt * 1000:8.1f} ms total  {dt / bs * 1000:6.2f} ms/video")


if __name__ == "__main__":
    main()
