"""Temporal fuse conv (7,1,1)/(alpha,1,1) reformulations."""
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

# s1_fuse geometry: fast (120, 32, 56, 56, 8) -> (120, 8, 56, 56, 16)
for (B, T, H, C, CO, tag) in [
    (120, 32, 56, 8, 16, "s1_fuse"),
    (120, 32, 56, 32, 64, "s2_fuse"),
    (120, 32, 28, 64, 128, "s3_fuse"),
    (120, 32, 14, 128, 256, "s4_fuse"),
]:
    x = jax.random.normal(rng, (B, T, H, H, C), jnp.bfloat16)
    w = jax.random.normal(rng, (7, 1, 1, C, CO), jnp.bfloat16) * 0.05

    def plain(x, w=w):
        return jax.lax.conv_general_dilated(
            x, w, (4, 1, 1), ((3, 3), (0, 0), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    ms = timeit(plain, x)
    print(f"{tag}: plain strided conv      {ms:7.2f} ms")

    def shifted(x, w=w, T=T, C=C, CO=CO):
        to = T // 4
        acc = None
        for d in range(-3, 4):
            wd = w[d + 3, 0, 0]          # (C, CO)
            if d < 0:
                sl = x[:, 4 + d::4][:, :to - 1]
                sl = jnp.pad(sl, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            else:
                sl = x[:, d::4][:, :to]
                if sl.shape[1] < to:
                    sl = jnp.pad(
                        sl, ((0, 0), (0, to - sl.shape[1]), (0, 0), (0, 0),
                             (0, 0)))
            y = jax.lax.dot_general(sl, wd, (((4,), (0,)), ((), ())))
            acc = y if acc is None else acc + y
        return acc

    ms2 = timeit(shifted, x)
    print(f"{tag}: 7x shifted matmul-sum   {ms2:7.2f} ms")

    # concat-then-one-matmul variant
    def concat_mm(x, w=w, T=T, C=C, CO=CO):
        to = T // 4
        parts = []
        for d in range(-3, 4):
            if d < 0:
                sl = x[:, 4 + d::4][:, :to - 1]
                sl = jnp.pad(sl, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            else:
                sl = x[:, d::4][:, :to]
                if sl.shape[1] < to:
                    sl = jnp.pad(
                        sl, ((0, 0), (0, to - sl.shape[1]), (0, 0), (0, 0),
                             (0, 0)))
            parts.append(sl)
        xa = jnp.concatenate(parts, axis=-1)       # (..., 7C)
        wf = w[:, 0, 0].reshape(7 * C, CO)
        return jax.lax.dot_general(xa, wf, (((4,), (0,)), ((), ())))

    ms3 = timeit(concat_mm, x)
    print(f"{tag}: concat + one matmul     {ms3:7.2f} ms")
