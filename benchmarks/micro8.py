"""Test: is the fast stem's 41% MXU exactly the Cin=3->8 pad?
And: s2d-packed input (host-side) stem variants with temporal packing.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            out = fn(xs[0] + carry, *xs[1:])
            out = jax.lax.optimization_barrier(out)
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

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


rng = jax.random.PRNGKey(0)
B = 120


def conv(x, w, strides, pads):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


# current champion: (4,2,2) packed on raw input, Cin=3
x3 = jax.random.normal(rng, (B, 32, 224, 224, 3), jnp.bfloat16)
w3 = jax.random.normal(rng, (8, 9, 9, 3, 128), jnp.bfloat16) * 0.02
ms = timeit(lambda x: conv(x, w3, (4, 4, 4),
                           ((2, 2), (3, 2), (3, 2))), x3)
print(f"raw Cin=3  (8,9,9)s(4,4,4)Co128    {ms:7.2f} ms")

# SAME shapes but Cin=8: same padded K -> should cost ~the same if the
# sublane-pad theory is right (2.67x more useful FLOPs)
x8 = jax.random.normal(rng, (B, 32, 224, 224, 8), jnp.bfloat16)
w8 = jax.random.normal(rng, (8, 9, 9, 8, 128), jnp.bfloat16) * 0.02
ms = timeit(lambda x: conv(x, w8, (4, 4, 4),
                           ((2, 2), (3, 2), (3, 2))), x8)
print(f"pad-test Cin=8 same geometry       {ms:7.2f} ms")

# s2d(2x2) input prepared AT THE SOURCE (host would emit this layout):
# (120, 32, 112, 112, 12). The canonical (5,7,7)s(1,2,2) conv becomes
# (5,4,4)s(1,1,1) over 12 channels (7x7 kernel zero-padded into 8x8 then
# phase-split). Output-pack (gt,gh,gw) on top: kernel
# (gt+4, gh+3, gw+3), strides (gt, gh, gw), Cout = gt*gh*gw*8.
xs2d = jax.random.normal(rng, (B, 32, 112, 112, 12), jnp.bfloat16)
for gt, gh, gw in [(4, 2, 2), (2, 2, 4), (2, 4, 2), (1, 4, 4), (2, 2, 2),
                   (8, 2, 1), (4, 4, 1)]:
    co = gt * gh * gw * 8
    kt, kh, kw = gt + 4, gh + 3, gw + 3
    w = jax.random.normal(rng, (kt, kh, kw, 12, co), jnp.bfloat16) * 0.02
    K = kt * kh * kw * 12
    R = K / 735

    def f(x, w=w, gt=gt, gh=gh, gw=gw, kt=kt, kh=kh, kw=kw, co=co):
        t_out, h_out, w_out = 32 // gt, 112 // gh, 112 // gw
        pt_l = 2
        pt_r = max(gt * (t_out - 1) + kt - pt_l - 32, 0)
        # canonical s2d conv (5,4,4) has pad (1,2) rows (7x7 in 8x8 with
        # the canonical pad 3 = s2d pad 1/2 asymmetric)
        ph_l = 1
        ph_r = max(gh * (h_out - 1) + kh - ph_l - 112, 0)
        pw_l = 1
        pw_r = max(gw * (w_out - 1) + kw - pw_l - 112, 0)
        y = conv(x, w, (gt, gh, gw),
                 ((pt_l, pt_r), (ph_l, ph_r), (pw_l, pw_r)))
        n = y.shape[0]
        y = y.reshape(n, t_out, h_out, w_out, gt, gh, gw, 8)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return y.reshape(n, 32, 112, 112, 8)

    try:
        ms = timeit(f, xs2d)
        print(f"s2d-in gt{gt} gh{gh} gw{gw} Co{co:4d} K={K:5d} R={R:4.2f} {ms:7.2f} ms")
    except Exception as e:
        print(f"s2d-in gt{gt} gh{gh} gw{gw}: FAIL {str(e)[:90]}")
