"""Microbench: stem conv packing variants + pallas DMA floor re-check.

Fast stem canonical: conv (5,7,7) stride (1,2,2) C3->C8 on (120,32,224,224,3).
Packed variants pack gt x gh x gw output positions into channels:
  kernel (gt+4, 2gh+5, 2gw+5), strides (gt, 2gh, 2gw), Cout = 8*gt*gh*gw
  redundancy R = 3(gt+4)(2gh+5)(2gw+5)/735.
Slow stem canonical: conv (1,7,7) stride (1,2,2) C3->C64 on (120,8,224,224,3).
  packed: kernel (1, 2gh+5, 2gw+5), strides (1, 2gh, 2gw), Cout = 64*gh*gw.
"""
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


# ---- fast stem variants ----
xf = jax.random.normal(rng, (B, 32, 224, 224, 3), jnp.bfloat16)

def fast_packed(gt, gh, gw):
    kt, khp, kwp = gt + 4, 2 * gh + 5, 2 * gw + 5
    cout = 8 * gt * gh * gw
    w = jax.random.normal(rng, (kt, khp, kwp, 3, cout), jnp.bfloat16) * 0.02

    def f(x):
        # pads chosen to produce exactly (32/gt, 112/gh, 112/gw) packed grid
        t_out, h_out, w_out = 32 // gt, 112 // gh, 112 // gw
        def pr(k_can, stride_can, n_in, span, st):
            pad_l = k_can // 2
            reach = st * (span - 1) + (st and 0)
            return pad_l, max(st * (span - 1) + (kt if 0 else 0), 0)
        # temporal: canonical k=5 stride1 pad 2; packed reads frames
        # [gt*m - 2 .. gt*m + gt+1]
        pt_l = 2
        pt_r = max(gt * (t_out - 1) + kt - pt_l - 32, 0)
        ph_l = 3
        ph_r = max(2 * gh * (h_out - 1) + khp - ph_l - 224, 0)
        pw_l = 3
        pw_r = max(2 * gw * (w_out - 1) + kwp - pw_l - 224, 0)
        y = conv(x, w, (gt, 2 * gh, 2 * gw),
                 ((pt_l, pt_r), (ph_l, ph_r), (pw_l, pw_r)))
        n = y.shape[0]
        y = y.reshape(n, t_out, h_out, w_out, gt, gh, gw, 8)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return y.reshape(n, 32, 112, 112, 8)

    return f


w_can = jax.random.normal(rng, (5, 7, 7, 3, 8), jnp.bfloat16) * 0.02
ms = timeit(lambda x: conv(x, w_can, (1, 2, 2),
                           ((2, 2), (3, 3), (3, 3))), xf)
print(f"fast plain (5,7,7)s(1,2,2)C8        {ms:7.2f} ms")
for gt, gh, gw in [(1, 4, 4), (4, 2, 2), (2, 2, 4), (2, 4, 2), (2, 2, 2),
                   (4, 4, 1), (8, 2, 1), (8, 1, 2), (4, 1, 4)]:
    R = 3 * (gt + 4) * (2 * gh + 5) * (2 * gw + 5) / 735
    try:
        ms = timeit(fast_packed(gt, gh, gw), xf)
        print(f"fast packed gt{gt} gh{gh} gw{gw} Cout{8*gt*gh*gw:4d} R={R:4.2f} {ms:7.2f} ms")
    except Exception as e:
        print(f"fast packed gt{gt} gh{gh} gw{gw}: FAIL {str(e)[:80]}")

# ---- slow stem variants ----
xs_ = jax.random.normal(rng, (B, 8, 224, 224, 3), jnp.bfloat16)
ws_can = jax.random.normal(rng, (1, 7, 7, 3, 64), jnp.bfloat16) * 0.02
ms = timeit(lambda x: conv(x, ws_can, (1, 2, 2),
                           ((0, 0), (3, 3), (3, 3))), xs_)
print(f"slow plain (1,7,7)s(1,2,2)C64       {ms:7.2f} ms")


def slow_packed(gh, gw):
    khp, kwp = 2 * gh + 5, 2 * gw + 5
    cout = 64 * gh * gw
    w = jax.random.normal(rng, (1, khp, kwp, 3, cout), jnp.bfloat16) * 0.02

    def f(x):
        h_out, w_out = 112 // gh, 112 // gw
        ph_l = pw_l = 3
        ph_r = max(2 * gh * (h_out - 1) + khp - ph_l - 224, 0)
        pw_r = max(2 * gw * (w_out - 1) + kwp - pw_l - 224, 0)
        y = conv(x, w, (1, 2 * gh, 2 * gw),
                 ((0, 0), (ph_l, ph_r), (pw_l, pw_r)))
        n = y.shape[0]
        y = y.reshape(n, 8, h_out, w_out, gh, gw, 64)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6)
        return y.reshape(n, 8, 112, 112, 64)

    return f


for gh, gw in [(2, 1), (1, 2), (2, 2)]:
    R = 3 * (2 * gh + 5) * (2 * gw + 5) / 147
    ms = timeit(slow_packed(gh, gw), xs_)
    print(f"slow packed gh{gh} gw{gw} Cout{64*gh*gw:4d} R={R:4.2f}   {ms:7.2f} ms")

# ---- pallas DMA floor re-check: simple block-pipelined copy ----
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jax.random.normal(rng, (6144, 65536), jnp.bfloat16)  # 768MB


def copy_kernel(i_ref, o_ref):
    o_ref[:] = i_ref[:]


def pallas_copy(x, bm=512, bn=2048):
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // bm, x.shape[1] // bn),
        in_specs=[pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x)


gb = x.size * 2 / 1e9
ms = timeit(lambda a: a * 1.0001, x)
print(f"XLA elementwise copy 768MB          {ms:7.2f} ms  {3*gb/ms*1000:6.1f} GB/s")
for bm, bn in [(512, 2048), (256, 4096), (1024, 1024), (256, 8192)]:
    try:
        ms = timeit(lambda a, f=partial(pallas_copy, bm=bm, bn=bn): f(a), x)
        print(f"pallas copy block ({bm},{bn})      {ms:7.2f} ms  {3*gb/ms*1000:6.1f} GB/s")
    except Exception as e:
        print(f"pallas copy ({bm},{bn}): FAIL {str(e)[:100]}")
