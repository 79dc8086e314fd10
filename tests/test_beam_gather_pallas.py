"""Gate-only pallas row-select cache gather probe
(benchmarks/probe_beam_gather): correctness in interpret mode, the
probe-side routing it reconstructs, and the package-side eviction
contract (the old VIDSITU_PALLAS_BEAM_GATHER env flip must fail loudly,
not silently do nothing)."""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.gen.beam import _gather_beams

_spec = importlib.util.spec_from_file_location(
    "probe_beam_gather",
    Path(__file__).resolve().parent.parent
    / "benchmarks" / "probe_beam_gather.py",
)
probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(probe)


def test_beam_gather_rows_matches_numpy():
    k = jax.random.PRNGKey(0)
    # rows must span >= 8 lane-tiles (F >= 1024): the layout hazard
    # guard in the probe (BENCH.md round 3)
    for r, f in ((20, 1024), (12, 1152), (40, 2560)):
        x = jax.random.normal(k, (r, f), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(r), (r,), 0, r)
        out = probe.beam_gather_rows(x, idx, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(x)[np.asarray(idx)]
        )


def test_beam_gather_rows_rejects_narrow_leaves():
    """F/128 < 8 leaves are outside the kernel's layout-safe contract
    (the hazard comment in the probe) and must be refused, not silently
    mis-gathered."""
    x = jax.random.normal(jax.random.PRNGKey(0), (12, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (12,), 0, 12)
    with pytest.raises(AssertionError):
        probe.beam_gather_rows(x, idx, interpret=True)


def test_probe_routing_narrow_leaves_to_fallback(monkeypatch):
    """pallas_gather_beams (the reconstructed in-package routing) must
    send leaves under the M>=8 eligibility floor to the fallback and
    only eligible leaves to the kernel — and match the package's exact
    one-hot-dot gather bit for bit."""
    batch, beam = 4, 5
    k = jax.random.PRNGKey(2)
    tree = {
        "wide": jax.random.normal(k, (batch * beam, 1024), jnp.float32),
        "narrow": jax.random.normal(k, (batch * beam, 128), jnp.float32),
        "ints": jax.random.randint(k, (batch * beam, 7), 0, 100),
    }
    beam_idx = jax.random.randint(k, (batch, beam), 0, beam)

    seen = []
    real = probe.beam_gather_rows_multi

    def spy(xs, idx, **kw):
        seen.extend(x.shape[1] for x in xs)
        return real(xs, idx, interpret=True)

    monkeypatch.setattr(probe, "beam_gather_rows_multi", spy)
    got = probe.pallas_gather_beams(tree, beam_idx, batch, beam,
                                    fallback=_gather_beams)
    assert seen == [1024]  # narrow + int leaves never reached the kernel
    want = _gather_beams(tree, beam_idx, batch, beam)
    for key in tree:
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(want[key])
        )


def test_env_flip_raises_removed_error(monkeypatch):
    """The eviction contract: the historical env opt-in must raise (a
    stale script setting it would otherwise silently run the dot path
    believing the kernel engaged)."""
    tree = {"x": jnp.zeros((4, 8), jnp.float32)}
    beam_idx = jnp.zeros((2, 2), jnp.int32)
    for v in ("1", "unsafe-acknowledged"):
        monkeypatch.setenv("VIDSITU_PALLAS_BEAM_GATHER", v)
        with pytest.raises(RuntimeError, match="removed"):
            _gather_beams(tree, beam_idx, 2, 2)
    monkeypatch.setenv("VIDSITU_PALLAS_BEAM_GATHER", "0")
    _gather_beams(tree, beam_idx, 2, 2)  # explicit off stays accepted


def test_no_pallas_gather_in_package():
    import vidsitu_tpu

    pkg = Path(vidsitu_tpu.__file__).resolve().parent
    assert not (pkg / "ops" / "beam_gather.py").exists()
    assert not (pkg / "ops" / "fused_bottleneck.py").exists()
    import vidsitu_tpu.gen.beam as beam_mod

    assert "beam_gather_rows" not in Path(beam_mod.__file__).read_text()
