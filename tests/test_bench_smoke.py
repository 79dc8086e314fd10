"""Smoke tests for bench.py's small modes so the benchmark entry the
driver runs cannot rot (the featext/vbtrain modes build the full R50 and
only run on real hardware; srl/decode use the tiny graft-entry model)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def test_bench_srl_and_decode_modes_emit_contract():
    import bench

    r = bench.bench_srl_train(bs=4, iters=2)
    # driver contract + roofline certification keys (VERDICT r4 #7)
    assert {"metric", "value", "unit", "vs_baseline",
            "hbm_gbps", "tflops", "roofline_frac"} <= set(r)
    assert r["value"] > 0
    assert r["vs_baseline"] == 0.0  # tiny dims: no anchor claimed
    assert 0 <= r["roofline_frac"]

    r = bench.bench_srl_decode(bs=2, iters=1)
    assert r["metric"] == "srl_greedy_decode_latency"
    assert r["value"] > 0
    assert "roofline_frac" not in r  # analytic model is real-dims-only

    r = bench.bench_srl_decode(bs=2, iters=1, beam=2)
    assert r["metric"] == "srl_beam2_decode_latency"
    assert r["value"] > 0


def test_seg_schedule_partitions_budget():
    import bench

    for budget, seg_min in [(201, 64), (201, 0), (201, 400), (1024, 64),
                            (7, 2)]:
        sched = bench._seg_schedule(budget, seg_min)
        assert sum(n for n, _ in sched) == budget
        assert all(c >= n for n, c in sched)
        # cache never shrinks across segments
        caps = [c for _, c in sched]
        assert caps == sorted(caps)


def test_bench_cli_prints_one_json_line():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # env alone is overridden by the axon sitecustomize; bench.py's
    # VIDSITU_PLATFORM hook re-pins the config to cpu
    env["VIDSITU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "bench.py", "srl", "4", "2"], cwd=str(REPO),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
