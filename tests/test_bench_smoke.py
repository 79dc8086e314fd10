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
    assert set(r) == {"metric", "value", "unit", "vs_baseline"}
    assert r["value"] > 0

    r = bench.bench_srl_decode(bs=2, iters=1)
    assert r["metric"] == "srl_greedy_decode_latency"
    assert r["value"] > 0

    r = bench.bench_srl_decode(bs=2, iters=1, beam=2)
    assert r["metric"] == "srl_beam2_decode_latency"
    assert r["value"] > 0


def test_bench_cli_prints_one_json_line():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "bench.py", "srl", "4", "2"], cwd=str(REPO),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
