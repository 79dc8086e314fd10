"""micro16: ancestry-attention variant A/B on the real chip.

The landed attend_ancestry (models/transformer.py) selects ancestor
scores and scatters probs with TWO Precision.HIGHEST one-hot einsums —
HIGHEST on f32 operands lowers to multi-pass MXU work. Both selections
are exact integer routing, so they can also be done without the MXU:

  v1 "gather+mask": logits via take_along_axis on the (B,K,H,J,T)
     score tensor (tiny; gather, not matmul) and the prob scatter via a
     VPU comparison mask  w = probs * (anc == j)  — bit-identical
     routing, zero HIGHEST passes.
  v2 "bf16 cache": cache K/V leaves stored bf16 under the f32 config —
     halves the dominant per-step cache-read traffic; NOT token-exact
     vs f32 (records drift, for the cfg knob decision).

Measures bench.py decode5 latency per variant by monkeypatching
MultiHeadAttention.attend_ancestry in-process (fresh jit per variant).

Run on an idle host: python benchmarks/micro16_ancestry_variants.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vidsitu_tpu.models.transformer import MultiHeadAttention


def attend_ancestry_gather_mask(self, q_in, k, v, anc, mask,
                                deterministic):
    """v1: exact ancestry routing without HIGHEST one-hot matmuls."""
    q = self.q_proj(q_in)
    depth = q.shape[-1]
    q = q / jnp.sqrt(depth).astype(q.dtype)
    bsz, beams, _ = anc.shape
    qh = q.reshape(bsz, beams, q.shape[-2], q.shape[-1])
    kh = k.reshape((bsz, beams) + k.shape[1:])
    vh = v.reshape((bsz, beams) + v.shape[1:])
    allp = jnp.einsum("bkhd,bjthd->bkhjt", qh, kh)
    # select j = anc[b,k,t] per (b,k,h,t): gather on the small score
    # tensor instead of a one-hot dot
    idx = anc[:, :, None, None, :].astype(jnp.int32)  # (B,K,1,1,T)
    idx = jnp.broadcast_to(
        idx, (bsz, beams, allp.shape[2], 1, allp.shape[-1])
    )
    logits = jnp.take_along_axis(allp, idx, axis=3)[:, :, :, 0, :]
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        self.dtype
    )
    # scatter probs onto the (j,t) grid with a comparison mask (VPU)
    j_ids = jnp.arange(beams, dtype=anc.dtype)[None, None, :, None]
    sel = (anc[:, :, None, :] == j_ids).astype(probs.dtype)  # (B,K,J,T)
    w = probs[:, :, :, None, :] * sel[:, :, None, :, :]  # (B,K,H,J,T)
    ctx = jnp.einsum("bkhjt,bjthd->bkhd", w, vh)
    ctx = ctx.reshape(bsz * beams, 1, ctx.shape[-2], ctx.shape[-1])
    return self.out_proj(ctx)


def measure(tag, bs=8, iters=5, beam=5, bf16_cache=False):
    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm
    from vidsitu_tpu.models.selector import build_srl_generate_fn

    cfg, model, variables, batch = _setup(bs=bs)
    cfg.gen.beam_size = beam
    comm = build_comm(cfg)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    if bf16_cache:
        import vidsitu_tpu.models.srl_models as srl_models
        orig = srl_models.SRLModel.gen_build_cache

        def bf16_build(self, rows, max_len, enc_out):
            cache = orig(self, rows, max_len, enc_out)
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                cache,
            )

        srl_models.SRLModel.gen_build_cache = bf16_build
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trivial = jax.jit(lambda: jnp.zeros((1,), jnp.int32))()
    out0 = np.asarray(gen_fn(variables, dev_batch))
    np.asarray(trivial)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(trivial)
    rtt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(gen_fn(variables, dev_batch))
    dt = (time.perf_counter() - t0) / iters - rtt
    ms = dt / bs * 1000
    print(f"{tag:14s} beam{beam} {ms:7.2f} ms/video")
    if bf16_cache:
        srl_models.SRLModel.gen_build_cache = orig
    return ms, out0


if __name__ == "__main__":
    print("devices:", jax.devices())
    base_ms, base_out = measure("landed")
    orig_fn = MultiHeadAttention.attend_ancestry
    MultiHeadAttention.attend_ancestry = attend_ancestry_gather_mask
    v1_ms, v1_out = measure("gather+mask")
    exact = bool(np.array_equal(base_out, v1_out))
    print(f"gather+mask token-exact vs landed: {exact}")
    MultiHeadAttention.attend_ancestry = orig_fn
    v2_ms, v2_out = measure("bf16-cache", bf16_cache=True)
    same = bool(np.array_equal(base_out, v2_out))
    ndiff = int((np.asarray(base_out) != np.asarray(v2_out)).sum())
    print(f"bf16-cache tokens identical: {same} (ndiff={ndiff}, "
          f"size={np.asarray(base_out).size})")
    # greedy guard: the variants must not perturb the k==1 path
    g_ms, _ = measure("greedy", beam=1)
