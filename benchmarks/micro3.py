"""Push the pallas copy floor: block sizes, dimension semantics, manual DMA."""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
x = jax.random.normal(rng, (6144, 65536), jnp.bfloat16)  # 768MB
gb = x.size * 2 / 1e9


def copy_kernel(i_ref, o_ref):
    o_ref[:] = i_ref[:]


def pallas_copy(x, bm, bn, sem=None, vmem=None):
    cp = {}
    if sem:
        cp["dimension_semantics"] = sem
    if vmem:
        cp["vmem_limit_bytes"] = vmem
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // bm, x.shape[1] // bn),
        in_specs=[pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(**cp) if cp else None,
    )(x)


ms = timeit(lambda a: a * 1.0001, x)
print(f"XLA elementwise                     {ms:7.2f} ms  {3*gb/ms*1000:6.1f} GB/s")

V = 128 * 1024 * 1024
for bm, bn, sem, vmem, tag in [
    (512, 2048, None, None, "base"),
    (512, 4096, None, V, "4MB blocks vmem128M"),
    (1024, 4096, None, V, "8MB blocks vmem128M"),
    (512, 2048, ("parallel", "parallel"), None, "parallel sem"),
    (512, 2048, ("arbitrary", "arbitrary"), None, "arbitrary sem"),
    (6144, 512, None, V, "column-major-ish"),
    (128, 2048, None, None, "small 0.5MB"),
]:
    try:
        ms = timeit(lambda a, f=partial(pallas_copy, bm=bm, bn=bn, sem=sem,
                                        vmem=vmem): f(a), x)
        print(f"pallas ({bm:5d},{bn:5d}) {tag:22s} {ms:7.2f} ms  {3*gb/ms*1000:6.1f} GB/s")
    except Exception as e:
        print(f"pallas ({bm},{bn}) {tag}: FAIL {str(e)[:90]}")


# manual double-buffered DMA: input in HBM (ANY), copy chunks via DMA
def manual_kernel(hbm_ref, o_hbm_ref):
    CH = 512  # rows per chunk

    def body(scratch, sem_in, sem_out):
        n_chunks = hbm_ref.shape[0] // CH

        def get_in(slot, i):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(i * CH, CH)], scratch.at[slot],
                sem_in.at[slot])

        def put_out(slot, i):
            return pltpu.make_async_copy(
                scratch.at[slot], o_hbm_ref.at[pl.ds(i * CH, CH)],
                sem_out.at[slot])

        get_in(0, 0).start()

        def loop(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < n_chunks)
            def _():
                get_in(nxt, i + 1).start()

            get_in(slot, i).wait()
            # write out from the same buffer (pure HBM->VMEM->HBM copy)
            @pl.when(i >= 2)
            def _():
                put_out(slot, i - 2).wait()
            put_out(slot, i).start()
            return _

        jax.lax.fori_loop(0, n_chunks, loop, None)
        put_out((n_chunks - 2) % 2, n_chunks - 2).wait()
        put_out((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, 512, x.shape[1]), x.dtype),
        sem_in=pltpu.SemaphoreType.DMA((2,)),
        sem_out=pltpu.SemaphoreType.DMA((2,)),
    )


def manual_copy(x):
    return pl.pallas_call(
        manual_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=V),
    )(x)


try:
    ms = timeit(manual_copy, x)
    print(f"manual dbl-buffered HBM->VMEM->HBM  {ms:7.2f} ms  {3*gb/ms*1000:6.1f} GB/s")
except Exception as e:
    print(f"manual: FAIL {str(e)[:200]}")


# pure HBM->HBM giant DMA
def hbm2hbm_kernel(hbm_ref, o_hbm_ref):
    def body(sem):
        dma = pltpu.make_async_copy(hbm_ref, o_hbm_ref, sem)
        dma.start()
        dma.wait()

    pl.run_scoped(body, sem=pltpu.SemaphoreType.DMA(()))


def hbm2hbm(x):
    return pl.pallas_call(
        hbm2hbm_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


try:
    ms = timeit(hbm2hbm, x)
    print(f"one giant HBM->HBM DMA              {ms:7.2f} ms  {3*gb/ms*1000:6.1f} GB/s")
except Exception as e:
    print(f"hbm2hbm: FAIL {str(e)[:200]}")
