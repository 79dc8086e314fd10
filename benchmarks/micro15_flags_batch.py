"""micro15: featext XLA-flag + batch re-sweep on the current stack.

Two cheap, previously-unswept knobs on the north-star bench:
  (a) XLA_FLAGS that plausibly change TPU conv tiling/scheduling
      (scoped VMEM limit up/down, latency-hiding scheduler off);
  (b) batch size around the landed optimum b=24 — the round-2 sweep
      predates the temporal-packed stem, which changes stem VMEM
      pressure and could shift the optimum.

Runs `bench.py featext` in a fresh subprocess per variant (XLA_FLAGS is
read at backend init, so in-process changes would be ignored).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(tag, clips=120, flags=""):
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    p = subprocess.run(
        [sys.executable, "bench.py", "featext", str(clips)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if not line:
        print(f"{tag:48s} FAIL rc={p.returncode} {p.stderr.strip()[-160:]}")
        return None
    val = json.loads(line[-1])["value"]
    print(f"{tag:48s} {val:8.1f} clips/s")
    return val


def main():
    run("baseline b=24 (landed)")
    for clips, tag in [(100, "b=20"), (140, "b=28"), (160, "b=32"),
                       (200, "b=40")]:
        run(f"batch {tag}", clips=clips)
    for flags, tag in [
        ("--xla_tpu_scoped_vmem_limit_kib=32768", "scoped_vmem=32M"),
        ("--xla_tpu_scoped_vmem_limit_kib=65536", "scoped_vmem=64M"),
        ("--xla_tpu_scoped_vmem_limit_kib=8192", "scoped_vmem=8M"),
        ("--xla_tpu_enable_latency_hiding_scheduler=false", "lhs=off"),
    ]:
        run(f"flags {tag}", flags=flags)


if __name__ == "__main__":
    main()
