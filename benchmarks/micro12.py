"""Training-step op-level roofline (round 3).

Round 2 left two asserted-but-unmeasured attributions (BENCH.md):
  (1) train-mode forward = 2.0x inference forward "because of BN
      batch-stat passes";
  (2) backward = 2.8x train-forward "dgrad+wgrad+BN-backward on
      HBM-bound stages".
This measures both at the op level, micro9-style, on the two
representative slow-pathway geometries (s2: HBM-bound 64ch; s4: MXU-mix
256ch), plus the levers the verdict asks about: bf16 stat reductions
and where the stat/normalize passes actually land.

All operands are explicit jit arguments (closed-over arrays become HLO
constants and blow the remote-compile request past its size limit).

Geometry: b=8 videos = 40 clips; slow path T=8.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

BW = 700e9  # achieved XLA elementwise HBM bandwidth on this stack


def timeit(fn, *args, iters=5):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            out = fn(xs[0] + carry, *xs[1:])
            out = jax.lax.optimization_barrier(out)
            return (out * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(*args, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)


def conv(x, w, stride=(1, 1, 1)):
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    return lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=DN,
    )


def bn_train(y, scale, bias, stat_dtype=jnp.float32, eps=1e-5):
    """flax-style one-pass batch stats (mean + mean-of-squares) then
    normalize; stat reductions in ``stat_dtype``; normalize arithmetic
    stays in y.dtype (per-channel scale/shift broadcast)."""
    red = tuple(range(y.ndim - 1))
    yc = y.astype(stat_dtype)
    mean = jnp.mean(yc, axis=red)
    var = jnp.mean(yc * yc, axis=red) - mean * mean
    inv = lax.rsqrt(var + eps) * scale
    shift = bias - mean * inv
    return (y * inv.astype(y.dtype) + shift.astype(y.dtype))


def bn_inf(y, inv, shift):
    """Inference BN with PRE-FOLDED per-channel inv/shift (what the real
    model does: stats are running averages, foldable outside the loop)."""
    return y * inv.astype(y.dtype) + shift.astype(y.dtype)


def gb(*arrs):
    return sum(a.size * a.dtype.itemsize for a in arrs) / 1e9


def report(name, ms, traffic_gb=None, flops=None):
    extra = ""
    if traffic_gb is not None:
        extra += f"  roofline {traffic_gb / BW * 1e12:6.2f} ms" \
                 f" ({traffic_gb * 1000 / ms:5.0f} GB/s)"
    if flops is not None:
        extra += f"  MXU {flops / (ms / 1e3) / 197e12 * 100:5.1f}%"
    print(f"{name:<44} {ms:8.2f} ms{extra}", flush=True)


def bench_geometry(tag, shape, cin, cinner, cout, temp_k):
    print(f"\n=== {tag}: x{shape} inner={cinner} out={cout} "
          f"temp_k={temp_k} ===", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    B, T, H, W, _ = shape
    npix = B * T * H * W

    wa = jax.random.normal(key, (temp_k, 1, 1, cin, cinner),
                           jnp.bfloat16) * 0.05
    wb = jax.random.normal(key, (1, 3, 3, cinner, cinner),
                           jnp.bfloat16) * 0.05
    wc = jax.random.normal(key, (1, 1, 1, cinner, cout), jnp.bfloat16) * 0.05
    sc = jnp.ones((cinner,), jnp.float32)
    bi = jnp.zeros((cinner,), jnp.float32)
    ya = conv(x, wa)
    bx, bya = gb(x), gb(ya)
    flops_a = 2 * npix * cin * cinner * temp_k

    # ---- (1) the BN-train tax on the a-conv --------------------------------
    report("a-conv only (fwd)",
           timeit(lambda x, wa: conv(x, wa).mean(), x, wa),
           bx + bya, flops_a)
    report("a-conv + BN inference (folded)",
           timeit(lambda x, wa, sc, bi: bn_inf(conv(x, wa), sc, bi).mean(),
                  x, wa, sc, bi),
           bx + bya)
    report("a-conv + stats only (no normalize)",
           timeit(lambda x, wa: (
               lambda y: jnp.mean(y.astype(jnp.float32))
               + jnp.mean(jnp.square(y.astype(jnp.float32))))(conv(x, wa)),
               x, wa),
           bx + 2 * bya)
    report("a-conv + BN train (f32 stats)",
           timeit(lambda x, wa, sc, bi: bn_train(conv(x, wa), sc, bi).mean(),
                  x, wa, sc, bi),
           bx + 3 * bya)
    report("a-conv + BN train (bf16 stats)",
           timeit(lambda x, wa, sc, bi: bn_train(
               conv(x, wa), sc.astype(jnp.bfloat16), bi.astype(jnp.bfloat16),
               stat_dtype=jnp.bfloat16).mean(), x, wa, sc, bi),
           bx + 3 * bya)

    # ---- (2) backward per op (explicit cotangents via vjp) -----------------
    def dgrad_a(dy, x, wa):
        _, vjp = jax.vjp(lambda xx: conv(xx, wa), x)
        return vjp(dy)[0].mean()

    def wgrad_a(dy, x, wa):
        _, vjp = jax.vjp(lambda ww: conv(x, ww), wa)
        return vjp(dy)[0].mean()

    report("a-conv dgrad", timeit(dgrad_a, ya, x, wa), bya + bx, flops_a)
    report("a-conv wgrad", timeit(wgrad_a, ya, x, wa), bya + bx, flops_a)

    def bn_bwd(dy, y, sc, bi):
        _, vjp = jax.vjp(lambda yy: bn_train(yy, sc, bi), y)
        return vjp(dy)[0].mean()

    report("BN-train bwd (dx)", timeit(bn_bwd, ya, ya, sc, bi), 3 * bya)

    flops_b = 2 * npix * cinner * cinner * 9

    def dgrad_b(dy, ya, wb):
        _, vjp = jax.vjp(lambda yy: conv(yy, wb), ya)
        return vjp(dy)[0].mean()

    def wgrad_b(dy, ya, wb):
        _, vjp = jax.vjp(lambda ww: conv(ya, ww), wb)
        return vjp(dy)[0].mean()

    report("b-conv only (fwd)",
           timeit(lambda ya, wb: conv(ya, wb).mean(), ya, wb),
           2 * bya, flops_b)
    report("b-conv dgrad", timeit(dgrad_b, ya, ya, wb), 2 * bya, flops_b)
    report("b-conv wgrad", timeit(wgrad_b, ya, ya, wb), 2 * bya, flops_b)

    # ---- (3) whole bottleneck: fwd inf / fwd train / fwd+bwd ---------------
    sco = jnp.ones((cout,), jnp.float32)
    bio = jnp.zeros((cout,), jnp.float32)

    def block(x, wa, wb, wc, train):
        bn = bn_train if train else bn_inf
        args1 = (sc, bi)
        y = jax.nn.relu(bn(conv(x, wa), *args1))
        y = jax.nn.relu(bn(conv(y, wb), *args1))
        y = bn(conv(y, wc), sco, bio)
        return jax.nn.relu(x + y)

    mi = timeit(lambda x, wa, wb, wc: block(x, wa, wb, wc, False).mean(),
                x, wa, wb, wc)
    mt = timeit(lambda x, wa, wb, wc: block(x, wa, wb, wc, True).mean(),
                x, wa, wb, wc)
    report("bottleneck fwd (inference BN)", mi)
    report("bottleneck fwd (train BN)", mt)

    def fwdbwd(x, wa, wb, wc):
        def loss(ws):
            return block(x, *ws, True).astype(jnp.float32).mean()

        l, g = jax.value_and_grad(loss)((wa, wb, wc))
        return l + sum(jnp.sum(t) for t in jax.tree.leaves(g)) * 1e-12

    mfb = timeit(fwdbwd, x, wa, wb, wc)
    report("bottleneck fwd+bwd (train)", mfb)
    print(f"  ratios: train-fwd/inf-fwd {mt / mi:.2f}   "
          f"bwd-part/train-fwd {(mfb - mt) / mt:.2f}", flush=True)


if __name__ == "__main__":
    # slow-s2 interior block (HBM-bound)
    bench_geometry("slow-s2", (40, 8, 56, 56, 256), 256, 64, 256, 1)
    # slow-s4 interior block (MXU-mix; temporal kernel 3 on the a-conv)
    bench_geometry("slow-s4", (40, 8, 14, 14, 1024), 1024, 256, 1024, 3)
