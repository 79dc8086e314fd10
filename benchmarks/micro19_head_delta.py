"""Attribute the round-2 'head + harness' delta: full bench model 172.7ms
vs micro6 backbone 151.7ms at b=120 clips (BENCH.md per-stage table).

Measures, same stack, same day:
  A. backbone only, 5-D inputs, micro6 harness      (micro6 repro)
  B. backbone + trimmed_head, 5-D inputs            (isolates the head)
  C. full VbVideoModel.features, 6-D (24,5,...)     (isolates fold+normalize)
  D. bench.py's exact run loop                      (isolates harness)
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

from vidsitu_tpu.models.video_backbone import (
    SlowFastBackbone, VideoCfg, trimmed_head,
)
from vidsitu_tpu.models.vb_models import VbVideoModel


def timeit2(fn, a, b, iters=10):
    @partial(jax.jit, static_argnums=2)
    def run(x, y, n):
        def body(_, carry):
            out = fn(x + carry, y + carry)
            out = jax.lax.optimization_barrier(out)
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(a, b, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(a, b, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


rng = jax.random.PRNGKey(0)
B = 120
slow = jax.random.normal(rng, (B, 8, 224, 224, 3), jnp.bfloat16)
fast = jax.random.normal(rng, (B, 32, 224, 224, 3), jnp.bfloat16)
slow6 = slow.reshape(24, 5, 8, 224, 224, 3)
fast6 = fast.reshape(24, 5, 32, 224, 224, 3)

cfg = VideoCfg(dtype=jnp.bfloat16, param_dtype=jnp.float32)

# A: backbone only (micro6 repro)
bb = SlowFastBackbone(cfg)
vbb = jax.jit(bb.init)(jax.random.PRNGKey(1), slow, fast)


def f_a(s, fst):
    ys, yf = bb.apply(vbb, s, fst, train=False)
    return ys.mean() + yf.mean()


ms_a = timeit2(f_a, slow, fast)
print(f"A backbone only            : {ms_a:7.2f} ms")

# B: backbone + trimmed head
def f_b(s, fst):
    ys, yf = bb.apply(vbb, s, fst, train=False)
    return trimmed_head([ys, yf])


ms_b = timeit2(f_b, slow, fast)
print(f"B backbone + head          : {ms_b:7.2f} ms   (head {ms_b - ms_a:+.2f})")

# C: full model.features on 6-D inputs
mdl = VbVideoModel(vid_cfg=cfg, num_classes=0)
batch = {"frms_ev_fast_tensor": fast6, "frms_ev_slow_tensor": slow6}
vfull = jax.jit(mdl.init)(jax.random.PRNGKey(1), batch)


def f_c(s6, f6):
    return mdl.apply(
        vfull, {"frms_ev_fast_tensor": f6, "frms_ev_slow_tensor": s6}
    )["feats"]


ms_c = timeit2(f_c, slow6, fast6)
print(f"C VbVideoModel (6-D)       : {ms_c:7.2f} ms   (fold/normalize {ms_c - ms_b:+.2f})")

# D: bench.py's exact loop (dict rebuild inside the body)
@partial(jax.jit, static_argnums=2)
def run_bench(v, x, n):
    def body(_, carry):
        inp = {
            "frms_ev_fast_tensor": x["frms_ev_fast_tensor"] + carry,
            "frms_ev_slow_tensor": x["frms_ev_slow_tensor"] + carry,
        }
        f = mdl.apply(v, inp)["feats"]
        return (f.mean() * 1e-9).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))


iters = 10
float(run_bench(vfull, batch, iters))
trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
float(trivial())
t0 = time.perf_counter()
float(trivial())
rtt = time.perf_counter() - t0
t0 = time.perf_counter()
float(run_bench(vfull, batch, iters))
ms_d = ((time.perf_counter() - t0) - rtt) / iters * 1000
print(f"D bench.py exact loop      : {ms_d:7.2f} ms   (harness {ms_d - ms_c:+.2f})")
print(f"implied clips/s (D): {B / ms_d * 1000:.1f}")
