"""Isolated slow-s2 block: fused pallas vs XLA unfused chain."""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

import importlib.util as _ilu
from pathlib import Path as _P

_spec = _ilu.spec_from_file_location(
    "probe_fused_bottleneck",
    _P(__file__).resolve().parent / "probe_fused_bottleneck.py")
_probe = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_probe)
fused_bottleneck_frames = _probe.fused_bottleneck_frames


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
B, H, W = 960, 56, 56
CIN, CMID, COUT = 256, 64, 256
dt = jnp.bfloat16

x = jax.random.normal(rng, (B, H, W, CIN), dt)
wa = jax.random.normal(rng, (CIN, CMID), dt) * 0.05
ba = jnp.zeros((1, CMID), jnp.float32)
wb = jax.random.normal(rng, (3, 3, CMID, CMID), dt) * 0.05
bb = jnp.zeros((1, CMID), jnp.float32)
wc = jax.random.normal(rng, (CMID, COUT), dt) * 0.05
bc = jnp.zeros((1, COUT), jnp.float32)

ms = timeit(lambda a: fused_bottleneck_frames(a, wa, ba, wb, bb, wc, bc), x)
gb = (x.size + x.size) * 2 / 1e9
print(f"fused pallas block      {ms:7.2f} ms   ({gb:.2f} GB min traffic -> {gb/ms*1000:5.0f} GB/s)")


def xla_chain(x):
    h1 = jnp.maximum(
        jax.lax.dot_general(x, wa, (((3,), (0,)), ((), ()))) + ba.astype(dt), 0
    )
    h2 = jax.lax.conv_general_dilated(
        h1, wb, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h2 = jnp.maximum(h2 + bb.astype(dt), 0)
    y = jax.lax.dot_general(h2, wc, (((3,), (0,)), ((), ()))) + bc.astype(dt)
    return jnp.maximum(y + x, 0)


ms = timeit(xla_chain, x)
print(f"XLA unfused chain       {ms:7.2f} ms")

# variant: 4 frames per grid step
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
_kernel = _probe._kernel


def fused_multi(x, frames_per_step=4):
    b, h, w, cin = x.shape
    cout = COUT
    fp = frames_per_step
    wp = jnp.zeros((1, 1), x.dtype)
    bp = jnp.zeros((1, 1), x.dtype)

    def kern(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
             wp_ref, bp_ref, o_ref):
        for f in range(fp):
            xf = x_ref[f].reshape(h * w, cin)
            h1 = jnp.maximum(
                jnp.dot(xf, wa_ref[:], preferred_element_type=jnp.float32)
                + ba_ref[:], 0.0).astype(x_ref.dtype)
            h1p = jnp.pad(h1.reshape(h, w, CMID), ((1, 1), (1, 1), (0, 0)))
            acc = jnp.broadcast_to(bb_ref[:], (h * w, CMID)).astype(jnp.float32)
            for dh in range(3):
                for dw in range(3):
                    sl = h1p[dh:dh + h, dw:dw + w].reshape(h * w, CMID)
                    acc = acc + jnp.dot(sl, wb_ref[dh, dw],
                                        preferred_element_type=jnp.float32)
            h2 = jnp.maximum(acc, 0.0).astype(x_ref.dtype)
            y = jnp.dot(h2, wc_ref[:], preferred_element_type=jnp.float32)
            y = y + bc_ref[:] + xf.astype(jnp.float32)
            o_ref[f] = jnp.maximum(y, 0.0).astype(x_ref.dtype).reshape(h, w, cout)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=(b // fp,),
        in_specs=[
            pl.BlockSpec((fp, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wa.shape), full(ba.shape), full(wb.shape), full(bb.shape),
            full(wc.shape), full(bc.shape), full(wp.shape), full(bp.shape),
        ],
        out_specs=pl.BlockSpec((fp, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, wa, ba, wb, bb, wc, bc, wp, bp)


for fp in (2,):
    try:
        ms = timeit(lambda a: fused_multi(a, fp), x)
        print(f"fused pallas {fp}-frame   {ms:7.2f} ms")
    except Exception as e:
        print(f"multi {fp}: FAIL {str(e)[:150]}")
