"""Fresh per-stage breakdown of the featext model (temporal-packed stem)."""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

from vidsitu_tpu.models.video_backbone import SlowFastBackbone, VideoCfg


def timeit(fn, *args, iters=10):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            out = fn(xs[0] + carry, xs[1] + carry, *xs[2:])
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
slow = jax.random.normal(rng, (B, 8, 224, 224, 3), jnp.bfloat16)
fast = jax.random.normal(rng, (B, 32, 224, 224, 3), jnp.bfloat16)

cfg = VideoCfg(
    dtype=jnp.bfloat16, param_dtype=jnp.float32,
)
prev = 0.0
for k in range(5):
    mdl = SlowFastBackbone(cfg, num_stages=k)
    v = jax.jit(mdl.init)(jax.random.PRNGKey(1), slow, fast)

    def f(s, fst, v=v, mdl=mdl):
        ys, yf = mdl.apply(v, s, fst, train=False)
        return ys.mean() + yf.mean()

    ms = timeit(f, slow, fast)
    print(f"num_stages={k}: {ms:7.2f} ms   (delta {ms - prev:+7.2f})")
    prev = ms
