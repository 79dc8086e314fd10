"""Stem-epilogue probes (round 4): keep the packed-stem layout through
BN-affine + ReLU + pool, unpacking only the pooled (4x smaller) tensor.

BENCH.md named residuals: fast stem 18.3 ms vs ~8-10 floor, fast pool
5.0 vs ~2 (round-2 numbers at 120 clips). The unpack transpose plus
every post-conv elementwise/pool op on the unpacked C=8 tensor wastes
120/128 MXU-VPU lanes (micro21: relu on C=8 runs at 447 GB/s vs the
~686 ceiling). In packed layout (C=128) the affine fuses into the conv
epilogue at full lanes, and the (1,3,3) s(1,2,2) max pool becomes
shifted maxes that CONSUME the packed dh/dw axes:

  unpacked h = 2*hb + dh (gh=2)  =>  pool out[i] = max(y[2i-1], y[2i],
  y[2i+1]) = max(shift(y[dh=1])[i], y[dh=0][i], y[dh=1][i])

so the pooled tensor needs only a dt unpack (fast) or none (slow).

  F0: production fast chain — packed (4,2,2) conv + unpack -> BN
      inference affine -> relu -> max_pool
  F1: packed conv (no unpack) -> tiled affine -> relu -> packed pool
      -> dt-only unpack of the pooled tensor
  S0: production slow chain — plain (1,7,7) s2 F=64 conv -> affine ->
      relu -> pool
  S1: packed g=(1,1,2) conv -> tiled affine -> relu -> H pool + packed
      W pool (consumes dw; no unpack at all)

Weights are closure constants (the landed weight-frozen inference
program shape). Exactness: affine and max are elementwise, so the
packed chains must match BIT-EXACTLY.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vidsitu_tpu.models.video_backbone import _PackedStemConv


def timeit(fn, x, iters=10):
    @partial(jax.jit, static_argnums=1)
    def run(a, n):
        def body(_, carry):
            out = fn(a + carry)
            out = jax.lax.optimization_barrier(out)
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(x, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


def mk_affine_vecs(f, seed):
    r = np.random.default_rng(seed)
    mean = jnp.asarray(r.standard_normal(f), jnp.float32)
    var = jnp.asarray(r.uniform(0.5, 2.0, f), jnp.float32)
    scale = jnp.asarray(r.uniform(0.5, 1.5, f), jnp.float32)
    bias = jnp.asarray(r.standard_normal(f), jnp.float32)
    return mean, var, scale, bias


def affine(x, vecs, tile):
    # flax _normalize inference arithmetic: f32 math, cast at the end
    mean, var, scale, bias = vecs
    mul = jax.lax.rsqrt(var + 1e-5) * scale
    if tile > 1:
        mean, mul, bias = (jnp.tile(v, tile) for v in (mean, mul, bias))
    y = (x - mean) * mul + bias
    return y.astype(jnp.bfloat16)


def pool_hw(y):
    return nn.max_pool(
        y, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
    )


def packed_pool_fast(y, gt, gh, gw, f):
    """(n,tb,hb,wb,gt*gh*gw*f) -> pooled + dt-unpacked (n,tb*gt,hb,wb,f)."""
    n, tb, hb, wb, _ = y.shape
    y = y.reshape(n, tb, hb, wb, gt, gh, gw, f)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    # H pass consumes gh (axis 5)
    a, b = y[:, :, :, :, :, 0], y[:, :, :, :, :, 1]
    b_shift = jnp.concatenate(
        [jnp.full_like(b[:, :, :1], neg), b[:, :, :-1]], axis=2
    )
    h = jnp.maximum(jnp.maximum(a, b), b_shift)  # (n,tb,hb,wb,gt,gw,f)
    # W pass consumes gw (axis 5 after the H slice)
    a, b = h[..., 0, :], h[..., 1, :]
    b_shift = jnp.concatenate(
        [jnp.full_like(b[:, :, :, :1], neg), b[:, :, :, :-1]], axis=3
    )
    out = jnp.maximum(jnp.maximum(a, b), b_shift)  # (n,tb,hb,wb,gt,f)
    return out.transpose(0, 1, 4, 2, 3, 5).reshape(n, tb * gt, hb, wb, f)


def packed_pool_slow(y, f):
    """(n,t,h,wb,2f): standard H pool, then packed W pool consuming dw."""
    y = nn.max_pool(
        y, (1, 3, 1), strides=(1, 2, 1), padding=((0, 0), (1, 1), (0, 0))
    )
    n, t, h, wb, _ = y.shape
    y = y.reshape(n, t, h, wb, 2, f)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    a, b = y[..., 0, :], y[..., 1, :]
    b_shift = jnp.concatenate(
        [jnp.full_like(b[:, :, :, :1], neg), b[:, :, :, :-1]], axis=3
    )
    return jnp.maximum(jnp.maximum(a, b), b_shift)


def bind_conv(features, kernel, g, unpack, x_probe):
    mod = _PackedStemConv(
        features, kernel, g=g, dtype=jnp.bfloat16,
        param_dtype=jnp.float32, unpack=unpack,
    )
    params = mod.init(jax.random.PRNGKey(3), x_probe)
    return mod, params


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    rng = jax.random.PRNGKey(0)

    # ---------- fast stem ----------
    xf = jax.random.normal(rng, (B, 32, H, H, 3), jnp.bfloat16)
    probe = jnp.zeros((1, 8, 16, 16, 3), jnp.bfloat16)
    mod_u, params = bind_conv(8, (5, 7, 7), (4, 2, 2), True, probe)
    mod_p = _PackedStemConv(
        8, (5, 7, 7), g=(4, 2, 2), dtype=jnp.bfloat16,
        param_dtype=jnp.float32, unpack=False,
    )
    vecs = mk_affine_vecs(8, 11)

    def f0(x):
        y = mod_u.apply(params, x)
        return pool_hw(jax.nn.relu(affine(y, vecs, 1)))

    def f1(x):
        y = mod_p.apply(params, x)
        y = jax.nn.relu(affine(y, vecs, 16))
        return packed_pool_fast(y, 4, 2, 2, 8)

    r0 = np.asarray(jax.jit(f0)(xf))
    r1 = np.asarray(jax.jit(f1)(xf))
    print("fast: shapes", r0.shape, r1.shape,
          "bit-equal:", np.array_equal(r0, r1),
          "" if np.array_equal(r0, r1) else
          f"maxdiff {np.abs(r0.astype(np.float32) - r1.astype(np.float32)).max()}")

    print(f"F0 unpack->affine->pool   : {timeit(f0, xf):7.2f} ms")
    print(f"F1 packed epilogue        : {timeit(f1, xf):7.2f} ms")

    # ---------- slow stem ----------
    xs = jax.random.normal(rng, (B, 8, H, H, 3), jnp.bfloat16)
    vecs64 = mk_affine_vecs(64, 13)
    plain = nn.Conv(
        64, kernel_size=(1, 7, 7), strides=(1, 2, 2),
        padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    pparams = plain.init(jax.random.PRNGKey(5), jnp.zeros((1, 1, 16, 16, 3), jnp.bfloat16))
    mod_s = _PackedStemConv(
        64, (1, 7, 7), g=(1, 1, 2), dtype=jnp.bfloat16,
        param_dtype=jnp.float32, unpack=False,
    )

    def s0(x):
        y = plain.apply(pparams, x)
        return pool_hw(jax.nn.relu(affine(y, vecs64, 1)))

    def s1(x):
        y = mod_s.apply(pparams, x)
        y = jax.nn.relu(affine(y, vecs64, 2))
        return packed_pool_slow(y, 64)

    r0 = np.asarray(jax.jit(s0)(xs))
    r1 = np.asarray(jax.jit(s1)(xs))
    d = np.abs(r0.astype(np.float32) - r1.astype(np.float32)).max()
    print("slow: shapes", r0.shape, r1.shape,
          "bit-equal:", np.array_equal(r0, r1), f"maxdiff {d}")

    print(f"S0 plain conv chain       : {timeit(s0, xs):7.2f} ms")
    print(f"S1 packed (1,1,2) epilogue: {timeit(s1, xs):7.2f} ms")


if __name__ == "__main__":
    main()
