"""Fixed-shape beam search / greedy decoding under XLA.

TPU-native re-derivation of the reference's fairseq ``SeqGenCustom``
(vidsitu_code/seq_gen.py:190-772). Fairseq shrinks the batch as sentences
finish and keeps per-sentence hypothesis lists — shapes XLA cannot
compile. Here the whole search is a ``lax.while_loop`` over static
shapes with a dual beam state (alive / finished), the standard XLA
formulation:

  * alive beams extend by raw cumulative log-prob;
  * candidates that emit EOS move to the finished set, scored by
    fairseq's normalization ``score / (step + 1) ** len_penalty``
    (seq_gen.py:625-626);
  * early exit when EVERY sentence's finalized quota is full (the
    whole-batch expression of fairseq's per-sentence batch shrinking;
    there is no score-based termination — matching fairseq, which also
    only drops a sentence once beam_size hypotheses finalize).

Feature parity with ``cfg.gen``: beam_size, max_len_b, min_len,
normalize_scores, len_penalty, unk_penalty, temperature, prefix forcing
(seq_gen.py:546-573), no_repeat_ngram_size (seq_gen.py:739-772).

fairseq-exact beam semantics (verified step-for-step against a numpy
port of SequenceGenerator in tests/test_beam_fairseq_parity.py):
  * 2*beam candidates per step; EOS finalizes only from the top
    ``beam_size`` ranks (seq_gen.py:407-413);
  * finalized hypotheses are never evicted — later, better EOS
    candidates only fill remaining quota slots, exactly like fairseq's
    append-until-quota ``finalize_hypos`` (seq_gen.py:416-464);
  * one extra final step with lprobs forced to EOS so every hypothesis
    terminates (seq_gen.py:302-304).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclass(frozen=True)
class GenConfig:
    """Mirror of cfg.gen (configs/vsitu_cfg.yml:76-85)."""

    beam_size: int = 1
    max_len_a: int = 0
    max_len_b: int = 200
    min_len: int = 0
    normalize_scores: bool = True
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    temperature: float = 1.0
    no_repeat_ngram_size: int = 0

    @classmethod
    def from_cfg(cls, gen_cfg) -> "GenConfig":
        return cls(
            beam_size=int(gen_cfg.beam_size),
            max_len_a=int(gen_cfg.max_len_a),
            max_len_b=int(gen_cfg.max_len_b),
            min_len=int(gen_cfg.min_len),
            normalize_scores=bool(gen_cfg.normalize_scores),
            len_penalty=float(gen_cfg.len_penalty),
            unk_penalty=float(gen_cfg.unk_penalty),
            temperature=float(gen_cfg.temperature),
            no_repeat_ngram_size=int(gen_cfg.no_repeat_ngram_size),
        )


def tile_for_beams(tree: Any, beam_size: int) -> Any:
    """Repeat every leaf along axis 0: (B, ...) -> (B*beam, ...).

    Row order is [b0 x beam, b1 x beam, ...], matching
    fairseq's reorder convention (seq_gen.py:253-255).
    """
    return jax.tree.map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree
    )


def _gather_beams(tree: Any, beam_idx: jnp.ndarray, batch: int, beam: int):
    """Select beams: leaf (B*K, ...) -> rows beam_idx (B, K) within batch.

    Float leaves (the KV cache) are selected with a one-hot batched
    matmul instead of take_along_axis: the gather HLO moves the cache at
    ~58 GB/s on TPU while the (B,K,K)x(B,K,F) dot runs at memory speed —
    measured 74.5 -> 9-ish ms/video on beam-5 decode (benchmarks/
    micro13, BENCH.md round 3). Selection weights are exact 0/1, so the
    result is bit-identical to the gather. Integer leaves keep
    take_along_axis.

    NB: this module-global is the seam the gate-only pallas row-DMA
    gather probe monkeypatches (benchmarks/probe_beam_gather.py,
    driven by `python bench.py gates`). The kernel itself was EVICTED
    from the package in round 5 — it corrupted decode tokens under
    specific whole-program XLA buffer assignments (BENCH.md round 3,
    "pallas beam gather layout hazard") and no in-package flag may
    reach a known-corrupting path.
    """
    import os

    if os.environ.get("VIDSITU_PALLAS_BEAM_GATHER", "") not in ("", "0"):
        raise RuntimeError(
            "VIDSITU_PALLAS_BEAM_GATHER was removed: the pallas row-DMA "
            "beam gather corrupted decode tokens on the round-3/4 axon "
            "stacks and is no longer shipped in the package. It lives on "
            "as a gate-only probe — run `python bench.py gates` "
            "(benchmarks/probe_beam_gather.py) to A/B it on your stack."
        )
    onehot = jax.nn.one_hot(beam_idx, beam)  # (B, K_new, K_old)

    def gather(x):
        xs = x.reshape((batch, beam) + x.shape[1:])
        if jnp.issubdtype(x.dtype, jnp.floating):
            flat = xs.reshape(batch, beam, -1)
            # Precision.HIGHEST: with default precision the TPU MXU
            # truncates float32 operands to bfloat16, which would break
            # the bit-identical claim for f32 KV caches (bf16 caches are
            # exact either way: 0/1 weights select single terms)
            out = jax.lax.dot_general(
                onehot.astype(x.dtype), flat,
                (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape((batch * beam,) + x.shape[1:])
        return jnp.take_along_axis(
            xs,
            beam_idx.reshape((batch, beam) + (1,) * (x.ndim - 1)),
            axis=1,
        ).reshape((batch * beam,) + x.shape[1:])

    return jax.tree.map(gather, tree)


def ancestry_reorder(cache: Any, orig_beam: jnp.ndarray, batch: int,
                     beam: int, t: jnp.ndarray) -> Any:
    """Beam reorder for ancestry-mode caches: permute ONLY the tiny
    (B, K, L) int32 ancestry table; the KV leaves stay slot-major and
    ancestor rows are selected inside attention
    (models/transformer.MultiHeadAttention.attend_ancestry).

    This removes the per-step full-cache gather — the measured 96% of
    beam-5 decode cost (BENCH.md round-3 decomposition) — replacing
    fairseq's reorder_incremental_state (seq_gen.py:902-913) with an
    index permutation.

    Invariants:
      * before step s's attention, ``anc[:, :, s]`` is the identity (the
        step writes its own slot's K/V row at position s) — established
        by the identity init (generate.py), the identity padding in
        grow_cache, and the trailing write below at s = t+1; this holds
        at every entry to this function, so position t needs no
        re-write before the permute;
      * after this reorder, ``anc[b, k, t'] `` names the cache slot whose
        position-t' row belongs to NEW beam k's history, for all t' <= t.
    """
    anc = cache["anc"]
    k_ids = jnp.arange(beam, dtype=anc.dtype)[None, :]
    anc = jnp.take_along_axis(
        anc, orig_beam[:, :, None].astype(anc.dtype), axis=1
    )
    # restore the identity invariant for the next write position (the
    # final iteration's update lands on a dead slot: dynamic_update_slice
    # clamps t+1 into bounds, and the loop exits before reading it)
    anc = jax.lax.dynamic_update_slice(
        anc, jnp.tile(k_ids[:, :, None], (batch, 1, 1)), (0, 0, t + 1)
    )
    new = dict(cache)
    new["anc"] = anc
    return new


def _banned_ngram_mask(
    seqs: jnp.ndarray, t: jnp.ndarray, n: int, vocab: int
) -> jnp.ndarray:
    """(R, L) sequences -> (R, V) mask, NEG_INF where the token would
    complete an n-gram already present (fairseq no_repeat_ngram)."""
    r, l = seqs.shape
    m = n - 1
    # current (n-1)-gram ending at position t: seqs[:, t-m+1 : t+1]
    cur = jax.lax.dynamic_slice(
        seqs, (0, jnp.maximum(t - m + 1, 0)), (r, m)
    )  # (R, m)
    # all historical windows starting at p: gram seqs[:, p:p+m], next seqs[:, p+m]
    num_p = l - m
    grams = jnp.stack([seqs[:, p : p + m] for p in range(num_p)], axis=1)
    nexts = jnp.stack([seqs[:, p + m] for p in range(num_p)], axis=1)
    p_idx = jnp.arange(num_p)
    valid = (p_idx + m <= t) & (t - m + 1 >= 0)
    match = jnp.all(grams == cur[:, None, :], axis=-1) & valid[None, :]
    # scatter-max instead of a one-hot reduction: (R, num_p, V) bool
    # would be ~2 GB/step at real dims (R=200, V=50k) inside the
    # while_loop — the scatter is O(R*num_p)
    banned = jnp.zeros((r, vocab), jnp.bool_).at[
        jnp.arange(r, dtype=jnp.int32)[:, None], nexts
    ].max(match)
    return jnp.where(banned, NEG_INF, 0.0)


def beam_search(
    step_fn: Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]],
    init_cache: Any,
    batch_size: int,
    max_len: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    vocab_size: int,
    gen_cfg: GenConfig = GenConfig(),
    prefix_tokens: Optional[jnp.ndarray] = None,
    unk_id: Optional[int] = None,
    reorder_cache_fn: Optional[
        Callable[[Any, jnp.ndarray, int, int, jnp.ndarray], Any]
    ] = None,
    seg_bounds: Optional[Tuple[int, ...]] = None,
    grow_cache_fn: Optional[Callable[[Any, int], Any]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run beam search.

    Args:
      step_fn: (last_tokens (B*K, 1), position scalar, cache) ->
               (logits (B*K, V) or (B*K, 1, V), new cache). The cache must
               already be tiled to B*K rows (see ``tile_for_beams``).
      prefix_tokens: (B, P) forced first tokens (verb forcing in SRL decode).
      reorder_cache_fn: optional (cache, orig_beam (B,K), batch, beam, t)
               -> cache, replacing the default full-cache `_gather_beams`
               (used by ancestry-mode decode, see ``ancestry_reorder``).
      seg_bounds: optional ascending step bounds for SEGMENTED decode:
               the loop runs as consecutive while_loops capped at each
               bound, growing the cache between segments via
               ``grow_cache_fn(cache, new_len)`` (new_len = bound + 1,
               capped at max_len + 1). The caller must size ``init_cache``
               for the FIRST bound (length seg_bounds[0] + 1). Early
               steps then run on a small cache — under XLA's static
               shapes this is the only way to make a generous
               ``max_len_b`` budget cost like the length actually
               generated (fairseq instead shrinks the batch dynamically,
               seq_gen.py:430-464). Token-exact: positions beyond the
               write cursor are masked identically at every size.

    Returns:
      seqs:    (B, K, max_len+1) generated tokens (bos stripped; up to
               max_len content tokens plus the terminating eos, matching
               fairseq's "one extra step for EOS"), pad after eos
      scores:  (B, K) final (normalized if configured) scores, sorted desc
      lengths: (B, K) generated lengths incl. eos
    """
    k = gen_cfg.beam_size
    lp = gen_cfg.len_penalty
    rows = batch_size * k
    n_steps = max_len + 1  # fairseq: range(max_len + 1), eos forced at last
    seq_len = n_steps + 1  # slot 0 is bos

    alive_seq = jnp.full((rows, seq_len), pad_id, jnp.int32)
    alive_seq = alive_seq.at[:, 0].set(bos_id)
    alive_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (batch_size,)
    ).reshape(batch_size, k)
    fin_seq = jnp.full((batch_size, k, seq_len), pad_id, jnp.int32)
    fin_scores = jnp.full((batch_size, k), NEG_INF, jnp.float32)
    fin_lens = jnp.zeros((batch_size, k), jnp.int32)

    if prefix_tokens is not None:
        prefix_tokens = jnp.asarray(prefix_tokens, jnp.int32)
        prefix_len = prefix_tokens.shape[1]
    else:
        prefix_len = 0

    def norm(score, length):
        if not gen_cfg.normalize_scores:
            return score
        return score / (length.astype(jnp.float32) ** lp)

    def make_cond(bound):
        def cond(state):
            t, _, _, _, _, fin_scores_, _ = state
            # finalized hypotheses are never evicted, so a sentence with a
            # full quota is done — fairseq's per-sentence batch shrinking
            # (seq_gen.py:430-464) expressed as a whole-batch early exit
            quota_full = jnp.all(fin_scores_ > NEG_INF / 2)
            return (t < bound) & (~quota_full)

        return cond

    def body(state):
        t, alive_seq_, alive_scores_, cache, fin_seq_, fin_scores_, fin_lens_ = (
            state
        )
        last_tok = jax.lax.dynamic_slice(alive_seq_, (0, t), (rows, 1))
        logits, cache = step_fn(last_tok, t, cache)
        logits = logits.reshape(rows, vocab_size).astype(jnp.float32)
        if gen_cfg.temperature != 1.0:
            logits = logits / gen_cfg.temperature
        lprobs = jax.nn.log_softmax(logits, axis=-1)
        lprobs = lprobs.at[:, pad_id].set(NEG_INF)
        # a sentence with k finalized hypotheses is done (fairseq finalizes
        # at most beam_size hypos then drops the sentence, seq_gen.py:430-464)
        batch_done = jnp.all(fin_scores_ > NEG_INF / 2, axis=1)  # (B,)
        lprobs = jnp.where(
            jnp.repeat(batch_done, k)[:, None], NEG_INF, lprobs
        )
        if unk_id is not None and gen_cfg.unk_penalty != 0.0:
            lprobs = lprobs.at[:, unk_id].add(-gen_cfg.unk_penalty)
        if gen_cfg.min_len > 0:
            lprobs = jnp.where(
                (t < gen_cfg.min_len)
                & (jnp.arange(vocab_size) == eos_id)[None, :],
                NEG_INF,
                lprobs,
            )
        if gen_cfg.no_repeat_ngram_size > 0:
            lprobs = lprobs + _banned_ngram_mask(
                alive_seq_, t, gen_cfg.no_repeat_ngram_size, vocab_size
            )
        if prefix_len > 0:
            # force prefix token at steps t < prefix_len (seq_gen.py:546-573)
            ptok = jax.lax.dynamic_slice(
                prefix_tokens, (0, jnp.minimum(t, prefix_len - 1)), (batch_size, 1)
            )  # (B, 1)
            ptok_rows = jnp.repeat(ptok, k, axis=0)  # (B*K, 1)
            forced = jnp.where(
                jnp.arange(vocab_size)[None, :] == ptok_rows, lprobs, NEG_INF
            )
            lprobs = jnp.where(t < prefix_len, forced, lprobs)
        # final step: only eos may be emitted, so every hypothesis
        # terminates (fairseq seq_gen.py:302-304)
        eos_only = jnp.where(
            (jnp.arange(vocab_size) == eos_id)[None, :], lprobs, NEG_INF
        )
        lprobs = jnp.where(t >= n_steps - 1, eos_only, lprobs)

        cand = alive_scores_.reshape(rows, 1) + lprobs  # (B*K, V)
        cand = cand.reshape(batch_size, k * vocab_size)
        # top 2K candidates so EOS picks cannot starve the alive set
        top_scores, top_idx = jax.lax.top_k(cand, 2 * k)
        beam_idx = top_idx // vocab_size  # (B, 2K)
        tok_idx = top_idx % vocab_size

        # grow sequences: gather source rows for the 2K candidates
        src = alive_seq_.reshape(batch_size, k, seq_len)
        grown = jnp.take_along_axis(
            src, beam_idx[:, :, None], axis=1
        )  # (B, 2K, L)
        grown = jax.lax.dynamic_update_slice(
            grown, tok_idx[:, :, None].astype(jnp.int32), (0, 0, t + 1)
        )

        is_eos = tok_idx == eos_id

        # ---- finished update ------------------------------------------------
        # fairseq finalizes eos hypotheses only when they rank within the
        # top beam_size of the 2*beam candidates (seq_gen.py eos_mask
        # [:, :beam_size]); lower-ranked junk eos must not fill the quota.
        rank_ok = jnp.arange(2 * k)[None, :] < k
        eos_norm = norm(top_scores, t + 1)
        eos_valid = is_eos & rank_ok & (top_scores > NEG_INF / 2)
        eos_scores = jnp.where(eos_valid, eos_norm, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores_, eos_scores], axis=1)
        all_fin_seq = jnp.concatenate(
            [fin_seq_, grown], axis=1
        )
        all_fin_lens = jnp.concatenate(
            [fin_lens_, jnp.full(eos_scores.shape, t + 1, jnp.int32)],
            axis=1,
        )
        # fairseq's finalize_hypos APPENDS until the quota is full and never
        # evicts (seq_gen.py:416-464): existing finalized entries keep their
        # slots; new eos candidates fill remaining slots in rank order.
        # Select k entries by priority = (existing first, then candidates by
        # rank), realized as top_k over negated priorities (stable on ties).
        big = 10 * k
        exist_pri = jnp.where(
            fin_scores_ > NEG_INF / 2,
            jnp.arange(k)[None, :],
            big + jnp.arange(k)[None, :],  # empty slots last, stable order
        )
        cand_pri = jnp.where(
            eos_valid,
            k + jnp.arange(2 * k)[None, :],
            2 * big + jnp.arange(2 * k)[None, :],
        )
        all_pri = jnp.concatenate([exist_pri, cand_pri], axis=1)
        _, fin_sel = jax.lax.top_k(-all_pri, k)
        new_fin_scores = jnp.take_along_axis(all_fin_scores, fin_sel, axis=1)
        new_fin_seq = jnp.take_along_axis(
            all_fin_seq, fin_sel[:, :, None], axis=1
        )
        new_fin_lens = jnp.take_along_axis(all_fin_lens, fin_sel, axis=1)

        # ---- alive update ----------------------------------------------------
        alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
        new_alive_scores, alive_sel = jax.lax.top_k(alive_cand, k)
        new_alive_seq = jnp.take_along_axis(
            grown, alive_sel[:, :, None], axis=1
        ).reshape(rows, seq_len)
        # cache rows follow their beams; at k==1 every candidate comes
        # from beam 0 (beam_idx = top_idx // vocab over k*V = V entries
        # is identically 0), so the gather is the identity — skip the
        # per-step full-cache copy entirely on the greedy path
        if k > 1:
            orig_beam = jnp.take_along_axis(beam_idx, alive_sel, axis=1)
            if reorder_cache_fn is not None:
                cache = reorder_cache_fn(cache, orig_beam, batch_size, k, t)
            else:
                cache = _gather_beams(cache, orig_beam, batch_size, k)

        return (
            t + 1,
            new_alive_seq,
            new_alive_scores,
            cache,
            new_fin_seq,
            new_fin_scores,
            new_fin_lens,
        )

    bounds: Tuple[int, ...] = (n_steps,)
    if seg_bounds is not None and grow_cache_fn is not None:
        # the caller sized init_cache for its FIRST bound (+1); a bound
        # <= 0 would mean a length<=1 cache whose writes clamp and
        # silently corrupt the decode — reject instead
        assert all(int(b) >= 1 for b in seg_bounds), (
            f"seg_bounds must be >= 1, got {seg_bounds}"
        )
        # bounds >= n_steps-1 are safe to DROP (the cache sized for them
        # already covers the final loop) but would produce a zero-growth
        # cache copy plus a duplicate compiled loop for at most the
        # single forced-EOS step
        inner = sorted(
            {int(b) for b in seg_bounds if int(b) < n_steps - 1}
        )
        bounds = tuple(inner) + (n_steps,)

    state = (
        jnp.asarray(0, jnp.int32),
        alive_seq,
        alive_scores,
        init_cache,
        fin_seq,
        fin_scores,
        fin_lens,
    )
    for i, bound in enumerate(bounds):
        state = jax.lax.while_loop(make_cond(bound), body, state)
        if i + 1 < len(bounds):
            # grow the cache for the next segment (a no-op copy when the
            # quota filled early and the remaining loops run 0 iterations)
            new_len = min(bounds[i + 1] + 1, n_steps)
            state = state[:3] + (grow_cache_fn(state[3], new_len),) + state[4:]
    t, alive_seq, alive_scores, _, fin_seq, fin_scores, fin_lens = state

    # Degenerate fallback only (e.g. min_len >= the step budget blocks eos
    # entirely): surface still-alive beams. When the quota is full, fairseq
    # discards alive beams (the sentence left the batch) — mask them so
    # they can never displace a finalized hypothesis.
    alive_norm = norm(alive_scores, jnp.maximum(t, 1))
    quota_full = jnp.all(fin_scores > NEG_INF / 2, axis=1, keepdims=True)
    alive_norm = jnp.where(quota_full, NEG_INF, alive_norm)
    all_scores = jnp.concatenate([fin_scores, alive_norm], axis=1)
    all_seq = jnp.concatenate(
        [fin_seq, alive_seq.reshape(batch_size, k, seq_len)], axis=1
    )
    all_lens = jnp.concatenate(
        [fin_lens, jnp.full((batch_size, k), t, jnp.int32)], axis=1
    )
    final_scores, sel = jax.lax.top_k(all_scores, k)
    final_seq = jnp.take_along_axis(all_seq, sel[:, :, None], axis=1)
    final_lens = jnp.take_along_axis(all_lens, sel, axis=1)

    return final_seq[:, :, 1:], final_scores, final_lens
