"""Find the ~14ms cost of the 6-D (B,5,...) input path vs pre-folded 5-D
(micro19 C-B delta): dump/grep HLO for materialized copies/transposes and
A/B candidate fixes.

Variants (b=120 clips, bf16):
  V0: production features() on 6-D inputs            (repro, ~163.5)
  V1: normalize removed (astype is identity on bf16) (isolate astype)
  V2: fold before add: harness pre-folds to 5-D, model sees (B*5,...)
  V3: 6-D inputs but reshape done INSIDE one fused point (lax.collapse)
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
mdl = VbVideoModel(vid_cfg=cfg, num_classes=0)
batch = {"frms_ev_fast_tensor": fast6, "frms_ev_slow_tensor": slow6}
vfull = jax.jit(mdl.init)(jax.random.PRNGKey(1), batch)

bb = SlowFastBackbone(cfg)
vbb = jax.jit(bb.init)(jax.random.PRNGKey(1), slow, fast)

if "--hlo" in sys.argv:
    # count copies/transposes in the compiled 6-D program
    def f_c(s6, f6):
        return mdl.apply(
            vfull, {"frms_ev_fast_tensor": f6, "frms_ev_slow_tensor": s6}
        )["feats"]

    txt = jax.jit(f_c).lower(slow6, fast6).compile().as_text()
    import re
    big = [ln.strip()[:180] for ln in txt.splitlines()
           if re.search(r"(transpose|copy)", ln)
           and re.search(r"224,224", ln)]
    print(f"{len(big)} big transpose/copy lines:")
    for ln in big[:40]:
        print(" ", ln)
    sys.exit(0)


def f_v0(s6, f6):
    return mdl.apply(
        vfull, {"frms_ev_fast_tensor": f6, "frms_ev_slow_tensor": s6}
    )["feats"]


if "--v0" in sys.argv:
    print(f"V0 production 6-D          : {timeit2(f_v0, slow6, fast6):7.2f} ms")


def f_v1(s6, f6):
    # bypass normalize: fold + backbone + head directly
    s = s6.reshape((-1,) + s6.shape[2:])
    f = f6.reshape((-1,) + f6.shape[2:])
    ys, yf = bb.apply(vbb, s, f, train=False)
    p = trimmed_head([ys, yf])
    return p.reshape(24, 5, -1)


print(f"V1 fold+backbone, no norm  : {timeit2(f_v1, slow6, fast6):7.2f} ms")


def f_v2(s, f):
    ys, yf = bb.apply(vbb, s, f, train=False)
    p = trimmed_head([ys, yf])
    return p.reshape(24, 5, -1)


print(f"V2 pre-folded 5-D add      : {timeit2(f_v2, slow, fast):7.2f} ms")


def f_v3(s6, f6):
    s = jax.lax.collapse(s6, 0, 2)
    f = jax.lax.collapse(f6, 0, 2)
    ys, yf = bb.apply(vbb, s, f, train=False)
    p = trimmed_head([ys, yf])
    return p.reshape(24, 5, -1)


print(f"V3 lax.collapse fold       : {timeit2(f_v3, slow6, fast6):7.2f} ms")


# V4: pre-folded 5-D with variables passed as jit ARGUMENTS (the honest
# production harness — isolates micro19's D-C "harness" delta)
@partial(jax.jit, static_argnums=3)
def run_args(v, x, y, n):
    def body(_, carry):
        ys, yf = bb.apply(v, x + carry, y + carry, train=False)
        p = trimmed_head([ys, yf])
        return (p.mean() * 1e-9).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))


iters = 10
float(run_args(vbb, slow, fast, iters))
trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
float(trivial())
t0 = time.perf_counter()
float(trivial())
rtt = time.perf_counter() - t0
t0 = time.perf_counter()
float(run_args(vbb, slow, fast, iters))
ms4 = ((time.perf_counter() - t0) - rtt) / iters * 1000
print(f"V4 5-D, vars as jit args   : {ms4:7.2f} ms   ({120/ms4*1000:.1f} clips/s)")
