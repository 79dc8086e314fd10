"""Pallas row-select cache gather: correctness (interpret mode) + the
opt-in routing in gen/beam (VIDSITU_PALLAS_BEAM_GATHER)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.gen.beam import _gather_beams
from vidsitu_tpu.ops.beam_gather import beam_gather_rows


def test_beam_gather_rows_matches_numpy():
    k = jax.random.PRNGKey(0)
    # rows must span >= 8 lane-tiles (F >= 1024): the layout hazard
    # guard in ops/beam_gather (BENCH.md round 3)
    for r, f in ((20, 1024), (12, 1152), (40, 2560)):
        x = jax.random.normal(k, (r, f), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(r), (r,), 0, r)
        out = beam_gather_rows(x, idx, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(x)[np.asarray(idx)]
        )


def test_beam_gather_rows_rejects_narrow_leaves():
    """F/128 < 8 leaves are outside the kernel's layout-safe contract
    (ops/beam_gather hazard comment) and must be refused, not silently
    mis-gathered."""
    x = jax.random.normal(jax.random.PRNGKey(0), (12, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (12,), 0, 12)
    with pytest.raises(AssertionError):
        beam_gather_rows(x, idx, interpret=True)


def test_gather_beams_routes_narrow_leaves_to_dot(monkeypatch):
    """With the pallas routing forced on, leaves under the M>=8
    eligibility floor must still be selected (via the exact dot), and
    only eligible leaves may reach the kernel."""
    import vidsitu_tpu.ops.beam_gather as bg

    batch, beam = 4, 5
    k = jax.random.PRNGKey(2)
    tree = {
        "wide": jax.random.normal(k, (batch * beam, 1024), jnp.float32),
        "narrow": jax.random.normal(k, (batch * beam, 128), jnp.float32),
    }
    beam_idx = jax.random.randint(k, (batch, beam), 0, beam)

    seen = []
    real = bg.beam_gather_rows_multi

    def spy(xs, idx, **kw):
        seen.extend(x.shape[1] for x in xs)
        return real(xs, idx, **kw)

    monkeypatch.setattr(bg, "beam_gather_rows_multi", spy)
    monkeypatch.setenv("VIDSITU_PALLAS_BEAM_GATHER", "unsafe-acknowledged")
    got = _gather_beams(tree, beam_idx, batch, beam)
    assert seen == [1024]  # narrow leaf never reached the kernel
    idx = np.asarray(beam_idx)
    for key in tree:
        xs = np.asarray(tree[key]).reshape(batch, beam, -1)
        exp = np.stack([xs[b][idx[b]] for b in range(batch)]).reshape(
            np.asarray(tree[key]).shape
        )
        np.testing.assert_array_equal(np.asarray(got[key]), exp, err_msg=key)


def test_gather_beams_dot_path_is_exact():
    """The production one-hot matmul selection is bit-identical to the
    take_along_axis gather for float and int leaves."""
    k = jax.random.PRNGKey(1)
    batch, beam = 4, 5
    tree = {
        "f": jax.random.normal(k, (batch * beam, 7, 128), jnp.bfloat16),
        "i": jax.random.randint(k, (batch * beam, 3), 0, 99),
    }
    beam_idx = jax.random.randint(k, (batch, beam), 0, beam)
    got = _gather_beams(tree, beam_idx, batch, beam)
    for key in tree:
        xs = np.asarray(tree[key]).reshape((batch, beam) + tree[key].shape[1:])
        idx = np.asarray(beam_idx)
        exp = np.stack(
            [xs[b][idx[b]] for b in range(batch)]
        ).reshape(np.asarray(tree[key]).shape)
        np.testing.assert_array_equal(np.asarray(got[key]), exp, err_msg=key)


def test_beam_gather_rows_multi_matches_numpy():
    from vidsitu_tpu.ops.beam_gather import beam_gather_rows_multi

    k = jax.random.PRNGKey(3)
    xs = [
        jax.random.normal(jax.random.PRNGKey(i), (20, 1024 * (i + 1)),
                          jnp.float32)
        for i in range(3)
    ]
    idx = jax.random.randint(k, (20,), 0, 20)
    outs = beam_gather_rows_multi(xs, idx, interpret=True)
    for x, o in zip(xs, outs):
        np.testing.assert_array_equal(
            np.asarray(o), np.asarray(x)[np.asarray(idx)]
        )


def test_stale_enable_value_raises(monkeypatch):
    """Quarantine: the pre-round-4 enable value '1' must raise loudly so
    stale scripts cannot reach the known-corrupting kernel by accident
    (BENCH.md round-3 'layout hazard'; re-verify via bench.py gates)."""
    import pytest

    from vidsitu_tpu.gen.beam import _pallas_gather_enabled

    monkeypatch.setenv("VIDSITU_PALLAS_BEAM_GATHER", "1")
    with pytest.raises(RuntimeError, match="gates"):
        _pallas_gather_enabled()
    monkeypatch.setenv("VIDSITU_PALLAS_BEAM_GATHER", "0")
    assert _pallas_gather_enabled() is False
    monkeypatch.delenv("VIDSITU_PALLAS_BEAM_GATHER")
    assert _pallas_gather_enabled() is False
