"""Round-3 follow-up probes on the micro12 backward sinks (slow-s2).

micro12 measured, per op on the HBM-bound slow-s2 geometry:
  a-conv (1x1) wgrad  1.71 ms (377 GB/s, MXU 9.8%)  vs fwd 0.60
  BN-train bwd (dx)   1.65 ms (234 GB/s)            vs roofline 0.55
  b-conv (3x3) dgrad  1.74 ms (148 GB/s)
Probes: (1) 1x1 wgrad as an explicit flattened dot_general;
(2) the whole 1x1 conv as a dot (autodiff then derives dot grads);
(3) closed-form BN backward. Wins get landed in the model.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from micro12 import BW, DN, bn_train, conv, gb, report, timeit


def main():
    key = jax.random.PRNGKey(0)
    shape = (40, 8, 56, 56, 256)
    cin, cinner = 256, 64
    x = jax.random.normal(key, shape, jnp.bfloat16)
    B, T, H, W, _ = shape
    npix = B * T * H * W
    wa = jax.random.normal(key, (1, 1, 1, cin, cinner), jnp.bfloat16) * 0.05
    ya = conv(x, wa)
    bx, bya = gb(x), gb(ya)
    flops_a = 2 * npix * cin * cinner

    # (1) wgrad as explicit dot: (npix,cin)^T @ (npix,cinner)
    def wgrad_dot(dy, x):
        xf = x.reshape(npix, cin)
        dyf = dy.reshape(npix, cinner)
        return lax.dot_general(
            xf, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).mean()

    report("1x1 wgrad as flattened dot", timeit(wgrad_dot, ya, x),
           bx + bya, flops_a)

    # (2) whole 1x1 conv as dot; autodiff grads of the dot
    def fwd_dot(x, w):
        return (x.reshape(npix, cin) @ w.reshape(cin, cinner)).mean()

    report("1x1 fwd as dot", timeit(fwd_dot, x, wa), bx + bya, flops_a)

    def wgrad_of_dot(dy, x, w):
        _, vjp = jax.vjp(
            lambda ww: (x.reshape(npix, cin)
                        @ ww.reshape(cin, cinner)).reshape(ya.shape), w)
        return vjp(dy)[0].mean()

    report("1x1 wgrad via autodiff-of-dot", timeit(wgrad_of_dot, ya, x, wa),
           bx + bya, flops_a)

    def dgrad_of_dot(dy, x, w):
        _, vjp = jax.vjp(
            lambda xx: (xx.reshape(npix, cin)
                        @ w.reshape(cin, cinner)).reshape(ya.shape), x)
        return vjp(dy)[0].mean()

    report("1x1 dgrad via autodiff-of-dot", timeit(dgrad_of_dot, ya, x, wa),
           bx + bya, flops_a)

    # (3) closed-form BN backward: dx = inv*(dy - mean(dy) - yhat*mean(dy*yhat))
    sc = jnp.ones((cinner,), jnp.float32)
    bi = jnp.zeros((cinner,), jnp.float32)

    def bn_bwd_closed(dy, y):
        red = tuple(range(y.ndim - 1))
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=red)
        var = jnp.mean(yf * yf, axis=red) - mean * mean
        inv = lax.rsqrt(var + 1e-5)
        yhat = (y - mean.astype(y.dtype)) * inv.astype(y.dtype)
        dyf = dy
        m_dy = jnp.mean(dyf.astype(jnp.float32), axis=red)
        m_dyy = jnp.mean((dyf * yhat).astype(jnp.float32), axis=red)
        dx = (sc * inv).astype(y.dtype) * (
            dy - m_dy.astype(y.dtype) - yhat * m_dyy.astype(y.dtype)
        )
        return dx.mean()

    report("BN bwd closed-form", timeit(bn_bwd_closed, ya, ya), 3 * bya)

    def bn_bwd_autodiff(dy, y):
        _, vjp = jax.vjp(lambda yy: bn_train(yy, sc, bi), y)
        return vjp(dy)[0].mean()

    report("BN bwd autodiff (ref)", timeit(bn_bwd_autodiff, ya, ya), 3 * bya)

    # (4) 3x3 dgrad reference + im2col-free alt: transposed conv explicit
    wb = jax.random.normal(key, (1, 3, 3, cinner, cinner), jnp.bfloat16) * 0.05

    def dgrad_b(dy, ya):
        _, vjp = jax.vjp(lambda yy: conv(yy, wb), ya)
        return vjp(dy)[0].mean()

    report("3x3 dgrad autodiff (ref)", timeit(dgrad_b, ya, ya), 2 * bya)

    def dgrad_b_flip(dy, ya):
        # dgrad = conv(dy, flip(w).transpose(io)); same shape (stride 1)
        wflip = jnp.flip(wb, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        return conv(dy, wflip).mean()

    report("3x3 dgrad as flipped conv", timeit(dgrad_b_flip, ya, ya), 2 * bya)


if __name__ == "__main__":
    main()
