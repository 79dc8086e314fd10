"""micro26: persistent-compilation-cache receipt (utils/compile_cache).

Measures time-to-first-featext-batch in a FRESH process, cold vs warm
cache: the child jits the production clip_features program (128 clips,
weight-frozen closure constants, same shape as bench.py/extract.py) and
reports (a) wall time of the first call (trace + compile + run) and
(b) the persistent-cache hit count.

Run on the real chip:  python benchmarks/micro26_compile_cache.py
CPU fallback:          VIDSITU_PLATFORM=cpu python benchmarks/micro26_compile_cache.py

Caveat for the tunneled (axon) stack: the relay may cache compiles
server-side, which would shrink the cold/warm gap independently of this
feature — the cache-hit counter is the ground truth for whether OUR
cache served the executable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

CHILD = r"""
import json, os, time
import jax, jax.numpy as jnp
if os.environ.get("VIDSITU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VIDSITU_PLATFORM"])

from vidsitu_tpu.utils.compile_cache import enable_compile_cache
from vidsitu_tpu.utils.config import get_cfg_with_overrides
from vidsitu_tpu.models.vb_models import VbVideoModel, build_feat_extractor

cfg = get_cfg_with_overrides(
    "micro26", **{"mdl.mdl_name": "sf_base",
                  "tpu.compile_cache_dir": os.environ["M26_CACHE"]}
)
enable_compile_cache(cfg)

from jax._src import monitoring
hits = []
monitoring.register_event_listener(
    lambda name, **kw: hits.append(name))

model = build_feat_extractor(cfg)
rng = jax.random.PRNGKey(0)
clips = int(os.environ.get("M26_CLIPS", "128"))
fast = jax.random.normal(rng, (clips, 32, 224, 224, 3), jnp.bfloat16)
slow = jax.random.normal(rng, (clips, 8, 224, 224, 3), jnp.bfloat16)
batch = {"frms_ev_fast_tensor": fast, "frms_ev_slow_tensor": slow}
variables = jax.jit(
    lambda r, b: model.init(r, b, method=VbVideoModel.clip_features)
)(jax.random.PRNGKey(1), batch)

fwd = jax.jit(lambda b: model.apply(variables, b,
                                    method=VbVideoModel.clip_features))
t0 = time.perf_counter()
out = fwd(batch)
out.block_until_ready()
t1 = time.perf_counter()
print(json.dumps({
    "first_call_s": t1 - t0,
    "cache_hits": sum("compilation_cache/cache_hits" in h for h in hits),
}))
"""


def run_child(cache_dir: str, platform: str) -> dict:
    env = dict(os.environ, M26_CACHE=cache_dir)
    # a pre-set external cache would override M26_CACHE inside
    # enable_compile_cache and pre-warm the 'cold' child
    env.pop('VIDSITU_COMPILE_CACHE', None)
    if platform:
        env["VIDSITU_PLATFORM"] = platform
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True,
        text=True, timeout=900, cwd=str(Path(__file__).parent.parent),
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    platform = os.environ.get("VIDSITU_PLATFORM", "")
    with tempfile.TemporaryDirectory() as d:
        cold = run_child(d, platform)
        warm = run_child(d, platform)
    print(json.dumps({
        "cold_first_call_s": round(cold["first_call_s"], 2),
        "warm_first_call_s": round(warm["first_call_s"], 2),
        "cold_cache_hits": cold["cache_hits"],
        "warm_cache_hits": warm["cache_hits"],
        "speedup": round(cold["first_call_s"] / warm["first_call_s"], 2),
    }))


if __name__ == "__main__":
    main()
