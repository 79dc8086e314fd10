"""Honest re-measure of micro12/micro12b with BARRIERED tensor sinks.

micro12/micro12b used scalar ``.mean()`` sinks; XLA's algebraic
simplifier factors reductions through linear ops (mean(dy @ W^T) never
materializes the matmul; mean of a 1x1 conv partially collapses too),
so several of those numbers were fake-fast. Here every measured fn
returns its FULL output tensor(s); the harness optimization_barriers
them BEFORE reducing, forcing materialization. Rooflines include the
sink's extra read of the output.

slow-s2 geometry (HBM-bound): x (40,8,56,56,256), inner 64.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

BW = 700e9


def timeit(fn, *args, iters=5):
    """fn returns a tensor or tuple of tensors; barriered then reduced."""

    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            outs = fn(xs[0] + carry, *xs[1:])
            outs = jax.tree.map(
                lambda o: jax.lax.optimization_barrier(o),
                outs if isinstance(outs, tuple) else (outs,),
            )
            s = sum(jnp.mean(o.astype(jnp.float32)) for o in outs)
            return (s * 1e-9).astype(jnp.bfloat16)

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


def conv(x, w):
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=DN,
    )


def bn_train(y, scale, bias, stat_dtype=jnp.float32, eps=1e-5):
    red = tuple(range(y.ndim - 1))
    yc = y.astype(stat_dtype)
    mean = jnp.mean(yc, axis=red)
    var = jnp.mean(yc * yc, axis=red) - mean * mean
    inv = lax.rsqrt(var + eps) * scale
    shift = bias - mean * inv
    return y * inv.astype(y.dtype) + shift.astype(y.dtype)


def bn_inf(y, inv, shift):
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


def main():
    key = jax.random.PRNGKey(0)
    shape = (40, 8, 56, 56, 256)
    cin, cinner = 256, 64
    x = jax.random.normal(key, shape, jnp.bfloat16)
    B, T, H, W, _ = shape
    npix = B * T * H * W
    wa = jax.random.normal(key, (1, 1, 1, cin, cinner), jnp.bfloat16) * 0.05
    wb = jax.random.normal(key, (1, 3, 3, cinner, cinner),
                           jnp.bfloat16) * 0.05
    wc = jax.random.normal(key, (1, 1, 1, cinner, cin), jnp.bfloat16) * 0.05
    sc = jnp.ones((cinner,), jnp.float32)
    bi = jnp.zeros((cinner,), jnp.float32)
    ya = conv(x, wa)
    bx, bya, bwa = gb(x), gb(ya), gb(wa)
    flops_a = 2 * npix * cin * cinner

    # ---------------- forward + BN tax ----------------
    report("a-conv fwd", timeit(lambda x, wa: conv(x, wa), x, wa),
           bx + 2 * bya, flops_a)
    report("a-conv + BN inference (folded)",
           timeit(lambda x, wa, sc, bi: bn_inf(conv(x, wa), sc, bi),
                  x, wa, sc, bi), bx + 2 * bya)
    report("a-conv + BN train (f32 stats)",
           timeit(lambda x, wa, sc, bi: bn_train(conv(x, wa), sc, bi),
                  x, wa, sc, bi), bx + 4 * bya)
    report("a-conv + BN train (bf16 stats)",
           timeit(lambda x, wa, sc, bi: bn_train(
               conv(x, wa), sc.astype(jnp.bfloat16),
               bi.astype(jnp.bfloat16), stat_dtype=jnp.bfloat16),
               x, wa, sc, bi), bx + 4 * bya)

    # ---------------- 1x1 backward ----------------
    def dgrad_conv(dy, x, wa):
        _, vjp = jax.vjp(lambda xx: conv(xx, wa), x)
        return vjp(dy)[0]

    def wgrad_conv(dy, x, wa):
        _, vjp = jax.vjp(lambda ww: conv(x, ww), wa)
        return vjp(dy)[0]

    report("1x1 dgrad (conv formulation)", timeit(dgrad_conv, ya, x, wa),
           2 * bx + bya, flops_a)
    report("1x1 wgrad (conv formulation)", timeit(wgrad_conv, ya, x, wa),
           bx + bya + 2 * bwa, flops_a)

    def wgrad_dot(dy, x):
        out = lax.dot_general(
            x.reshape(npix, cin), dy.reshape(npix, cinner),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out

    report("1x1 wgrad (flattened dot)", timeit(wgrad_dot, ya, x),
           bx + bya + 2 * bwa, flops_a)

    def dgrad_dot(dy, wa):
        out = lax.dot_general(
            dy.reshape(npix, cinner), wa.reshape(cin, cinner),
            (((1,), (1,)), ((), ())),
        )
        return out

    report("1x1 dgrad (flattened dot)", timeit(dgrad_dot, ya, wa),
           2 * bx + bya, flops_a)

    # ---------------- BN backward ----------------
    def bn_bwd_auto(dy, y, sc, bi):
        _, vjp = jax.vjp(lambda yy: bn_train(yy, sc, bi), y)
        return vjp(dy)[0]

    report("BN bwd (autodiff)", timeit(bn_bwd_auto, ya, ya, sc, bi), 4 * bya)

    def bn_bwd_closed(dy, y, sc):
        red = tuple(range(y.ndim - 1))
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=red)
        var = jnp.mean(yf * yf, axis=red) - mean * mean
        inv = lax.rsqrt(var + 1e-5)
        yhat = (y - mean.astype(y.dtype)) * inv.astype(y.dtype)
        m_dy = jnp.mean(dy.astype(jnp.float32), axis=red)
        m_dyy = jnp.mean((dy * yhat).astype(jnp.float32), axis=red)
        dx = (sc * inv).astype(y.dtype) * (
            dy - m_dy.astype(y.dtype) - yhat * m_dyy.astype(y.dtype))
        return dx

    report("BN bwd (closed form)", timeit(bn_bwd_closed, ya, ya, sc),
           4 * bya)

    # ---------------- 3x3 ----------------
    flops_b = 2 * npix * cinner * cinner * 9
    report("3x3 fwd", timeit(lambda ya, wb: conv(ya, wb), ya, wb),
           3 * bya, flops_b)

    def dgrad_b(dy, ya, wb):
        _, vjp = jax.vjp(lambda yy: conv(yy, wb), ya)
        return vjp(dy)[0]

    def wgrad_b(dy, ya, wb):
        _, vjp = jax.vjp(lambda ww: conv(ya, ww), wb)
        return vjp(dy)[0]

    report("3x3 dgrad (conv formulation)", timeit(dgrad_b, ya, ya, wb),
           3 * bya, flops_b)
    report("3x3 wgrad (conv formulation)", timeit(wgrad_b, ya, ya, wb),
           2 * bya, flops_b)

    # ---------------- whole bottleneck ----------------
    sco = jnp.ones((cin,), jnp.float32)
    bio = jnp.zeros((cin,), jnp.float32)

    def block(x, wa, wb, wc, train):
        bn = bn_train if train else bn_inf
        y = jax.nn.relu(bn(conv(x, wa), sc, bi))
        y = jax.nn.relu(bn(conv(y, wb), sc, bi))
        y = bn(conv(y, wc), sco, bio)
        return jax.nn.relu(x + y)

    mi = timeit(lambda x, wa, wb, wc: block(x, wa, wb, wc, False),
                x, wa, wb, wc)
    mt = timeit(lambda x, wa, wb, wc: block(x, wa, wb, wc, True),
                x, wa, wb, wc)
    report("bottleneck fwd (inference BN)", mi)
    report("bottleneck fwd (train BN)", mt)

    def fwdbwd(x, wa, wb, wc):
        def loss(ws):
            return block(x, *ws, True).astype(jnp.float32).mean()

        l, g = jax.value_and_grad(loss)((wa, wb, wc))
        return tuple(jax.tree.leaves(g))

    mfb = timeit(fwdbwd, x, wa, wb, wc)
    report("bottleneck fwd+bwd (train)", mfb)
    print(f"  ratios: train-fwd/inf-fwd {mt / mi:.2f}   "
          f"bwd-part/train-fwd {(mfb - mt) / mt:.2f}", flush=True)


if __name__ == "__main__":
    main()
