"""Checkpoint durability: a crash at ANY point must leave a restorable
checkpoint (preemption lands exactly in the save window — that is what
the preempt-file save exists for).

* pickle: tmp+atomic-rename writes; torn files load as None, not a
  crash.
* orbax: saves alternate between two generation dirs and a LIVE pointer
  (published only after the async save commits) names the one to
  restore — force-saving a single fixed dir would delete the previous
  checkpoint before the new one commits.
"""

import numpy as np
import pytest

from vidsitu_tpu.train.checkpoint import OrbaxBackend, PickleBackend


def _meta(it):
    return {"num_it": it, "num_epoch": 0, "rng": [0, 1]}


def test_pickle_save_is_atomic_and_torn_file_loads_none(tmp_path):
    be = PickleBackend()
    p = tmp_path / "m.ckpt"
    be.save(p, {"w": np.ones(3)}, {}, None, _meta(5))
    assert not list(tmp_path.glob("*.tmp"))  # renamed away
    loaded = be.load(p)
    assert loaded["meta"]["num_it"] == 5

    torn = tmp_path / "torn.ckpt"
    torn.write_bytes(b"\x80\x04 garbage, as if truncated mid-dump")
    assert be.load(torn) is None  # warn + resume-from-nothing, not crash


def test_orbax_previous_generation_survives_next_save_window(tmp_path):
    """Between save(N+1) and its commit/pointer publish, a fresh process
    must still restore save N — the exact window force=True on a fixed
    dir used to leave empty."""
    path = str(tmp_path / "g.ckpt")
    be = OrbaxBackend()
    be.save(path, {"w": np.ones(4, np.float32)}, {}, None, _meta(1))
    be.wait()  # commit + publish generation 1

    be.save(path, {"w": np.full(4, 2.0, np.float32)}, {}, None, _meta(2))
    # crash window: save 2 not yet waited on / pointer not published.
    # A fresh process (new backend instance) restores save 1.
    fresh = OrbaxBackend()
    loaded = fresh.load(path)
    assert loaded is not None and loaded["meta"]["num_it"] == 1
    w = fresh.restore_params({"w": np.zeros(4, np.float32)}, loaded)["w"]
    np.testing.assert_array_equal(w, np.ones(4))

    be.wait()  # commit + publish save 2
    fresh2 = OrbaxBackend()
    loaded2 = fresh2.load(path)
    assert loaded2["meta"]["num_it"] == 2
    w2 = fresh2.restore_params({"w": np.zeros(4, np.float32)}, loaded2)["w"]
    np.testing.assert_array_equal(w2, np.full(4, 2.0))


def test_orbax_alternates_generations_within_one_process(tmp_path):
    path = str(tmp_path / "alt.ckpt")
    be = OrbaxBackend()
    for it in (1, 2, 3):
        be.save(path, {"w": np.full(2, float(it), np.float32)}, {}, None,
                _meta(it))
    be.wait()
    d = be._dir(path)
    assert (d / "LIVE").read_text().strip() in ("tree.g0", "tree.g1")
    assert OrbaxBackend().load(path)["meta"]["num_it"] == 3


def test_orbax_legacy_single_tree_layout_still_loads(tmp_path):
    path = str(tmp_path / "leg.ckpt")
    be = OrbaxBackend()
    be.save(path, {"w": np.ones(2, np.float32)}, {}, None, _meta(9))
    be.wait()
    d = be._dir(path)
    live = (d / "LIVE").read_text().strip()
    (d / live).rename(d / "tree")  # simulate a pre-generation checkpoint
    (d / "LIVE").unlink()
    loaded = OrbaxBackend().load(path)
    assert loaded is not None and loaded["meta"]["num_it"] == 9


def test_orbax_resumed_process_does_not_overwrite_live_gen(tmp_path):
    """load() must seed the next-generation choice away from the live
    one: a resumed run's first save must not force-delete the very
    checkpoint it just restored."""
    path = str(tmp_path / "res.ckpt")
    be = OrbaxBackend()
    be.save(path, {"w": np.ones(2, np.float32)}, {}, None, _meta(1))
    be.wait()
    live = (be._dir(path) / "LIVE").read_text().strip()

    be2 = OrbaxBackend()
    assert be2.load(path)["meta"]["num_it"] == 1
    be2.save(path, {"w": np.full(2, 2.0, np.float32)}, {}, None, _meta(2))
    # in the crash window of save 2, the live generation is untouched
    assert (be2._dir(path) / live).exists()
    assert OrbaxBackend().load(path)["meta"]["num_it"] == 1
    be2.wait()
    assert OrbaxBackend().load(path)["meta"]["num_it"] == 2


def test_orbax_rejects_unknown_meta_keys(tmp_path):
    be = OrbaxBackend()
    with pytest.raises(AssertionError, match="does not persist"):
        be.save(str(tmp_path / "u.ckpt"), {"w": np.ones(1)}, {}, None,
                {**_meta(1), "brand_new_field": 3})
