"""Training-step decomposition: where do 437ms/step (b=8) go?

fwd at 40 clips ~= 57ms (from featext 694.9 clips/s scaled), so
fwd+bwd+Adam 'should' be ~180-200ms. Measure: fwd-only with BN updates,
fwd+bwd per truncated depth, optimizer alone.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from vidsitu_tpu.models.video_backbone import SlowFastBackbone, VideoCfg


def timeit(fn, *args, iters=5):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            out = fn(xs[0] + carry, xs[1] + carry, *xs[2:])
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


rng = jax.random.PRNGKey(0)
B = 40  # 8 videos x 5 events
slow = jax.random.normal(rng, (B, 8, 224, 224, 3), jnp.bfloat16)
fast = jax.random.normal(rng, (B, 32, 224, 224, 3), jnp.bfloat16)

cfg = VideoCfg(dtype=jnp.bfloat16, param_dtype=jnp.float32)

for k in range(5):
    mdl = SlowFastBackbone(cfg, num_stages=k)
    v = jax.jit(mdl.init)(jax.random.PRNGKey(1), slow, fast)
    params, stats = v["params"], v["batch_stats"]

    def fwd(s, f, params=params, stats=stats, mdl=mdl):
        (ys, yf), new = mdl.apply(
            {"params": params, "batch_stats": stats}, s, f, train=True,
            mutable=["batch_stats"],
        )
        return ys.mean() + yf.mean()

    def fwdbwd(s, f, params=params, stats=stats, mdl=mdl):
        def loss(p):
            (ys, yf), new = mdl.apply(
                {"params": p, "batch_stats": stats}, s, f, train=True,
                mutable=["batch_stats"],
            )
            return (ys.mean() + yf.mean()).astype(jnp.float32)

        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-12

    mf = timeit(fwd, slow, fast)
    mb = timeit(fwdbwd, slow, fast)
    print(f"stages={k}: fwd(BN) {mf:7.2f} ms   fwd+bwd {mb:7.2f} ms"
          f"   bwd-part {mb - mf:7.2f}")
