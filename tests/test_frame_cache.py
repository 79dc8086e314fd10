"""Decoded-uint8 frame cache: correctness + write-through + prep CLI.

Host feed gap (BENCH.md): featext's device rate implies ~13 GB/s of
decoded frames, so per-epoch JPEG decode (reference dat_loader.py:454-475
does it in every worker, every epoch) starves the chip. The cache
decodes once into per-segment memmapped npys; these tests pin that the
cached path is BIT-IDENTICAL to the decode path and that it actually
replaces JPEG reads.
"""

import shutil

import numpy as np
import pytest

from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.utils.config import get_cfg_with_overrides

TINY_VID = {
    "vid_mdl.resnet.depth": 26,
    "vid_mdl.crop_size": 32,
    "vid_mdl.num_frames": 4,
    "vid_mdl.sampling_rate": 2,
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("fcache")
    paths = make_synth_dataset(
        root, n_train=8, n_valid=4, seed=71, with_frames=True
    )
    return paths, root


def mk(env_, uid, **kw):
    paths, root = env_
    return get_cfg_with_overrides(
        uid,
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            **TINY_VID,
            "train.bs": 4,
            "train.bsv": 4,
            "train.nw": 0,
            "train.nwv": 0,
            "misc.tmp_path": str(root / "tmp"),
            **kw,
        },
    )


def _first_batch(cfg):
    build_comm(cfg)
    data = get_data(cfg)
    return next(iter(data.train_dl))


def test_cached_batch_bit_identical_and_replaces_jpeg_reads(env, tmp_path):
    paths, root = env
    plain = _first_batch(mk(env, "fc_plain"))

    cache_dir = tmp_path / "cache"
    cfg = mk(env, "fc_cached", **{"tpu.frame_cache_dir": str(cache_dir)})
    cached = _first_batch(cfg)  # write-through populates the cache
    for k in ("frms_ev_fast_tensor", "frms_ev_slow_tensor"):
        np.testing.assert_array_equal(plain[k], cached[k], err_msg=k)
    cache_files = list(cache_dir.glob("*_32.npy"))
    assert len(cache_files) > 0

    # prove the hit path decodes NO JPEGs: remove the frame tree, copy it
    # aside first so other tests (module fixture) keep working
    frames_dir = paths["ds.vsitu.video_frms_tdir"]
    backup = tmp_path / "frames_backup"
    shutil.copytree(frames_dir, backup)
    try:
        shutil.rmtree(frames_dir)
        cfg2 = mk(env, "fc_hit", **{"tpu.frame_cache_dir": str(cache_dir)})
        hit = _first_batch(cfg2)
        for k in ("frms_ev_fast_tensor", "frms_ev_slow_tensor"):
            np.testing.assert_array_equal(plain[k], hit[k], err_msg=k)
    finally:
        shutil.copytree(backup, frames_dir, dirs_exist_ok=True)


def test_short_cache_track_treated_as_miss(env, tmp_path):
    """A cache file with fewer frames than max_frms (written by a
    different-geometry caller; filename keys on resolution only) must
    not be sliced past or silently substitute different frames."""
    from vidsitu_tpu.data.frames import load_event_clips, segment_cache_path

    paths, root = env
    frames_dir = paths["ds.vsitu.video_frms_tdir"]
    import pathlib

    seg = sorted(p.name for p in pathlib.Path(frames_dir).iterdir())[0]
    cache_dir = tmp_path / "short_cache"
    cache_dir.mkdir()
    short = np.zeros((100, 32, 32, 3), np.uint8)
    np.save(segment_cache_path(cache_dir, seg, 32), short)

    class _V:
        reverse_input_channel = False
        arch = "slowfast"

        class slowfast:
            alpha = 4

        mean = [0.45, 0.45, 0.45]
        std = [0.225, 0.225, 0.225]

    cent = {f"Ev{e}": 30 + 60 * (e - 1) for e in range(1, 6)}
    got = load_event_clips(
        frames_dir, seg, cent, frm_seq_len=64, sampling_rate=2, vid_cfg=_V,
        max_frms=300, out_hw=32, cache_dir=str(cache_dir), cache_write=False,
    )
    ref = load_event_clips(
        frames_dir, seg, cent, frm_seq_len=64, sampling_rate=2, vid_cfg=_V,
        max_frms=300, out_hw=32,
    )
    # short cache ignored -> falls back to JPEG decode, bit-identical
    np.testing.assert_array_equal(
        got["frms_ev_fast_tensor"], ref["frms_ev_fast_tensor"]
    )


def test_short_cache_rebuilt_when_writes_allowed(env, tmp_path):
    """With cache_write=True a too-short cache file is REBUILT in place
    (force overwrite) instead of silently falling back to per-epoch
    JPEG decode forever — write_segment_cache's exists() early-return
    used to make the stale file permanent."""
    from vidsitu_tpu.data.frames import (
        load_event_clips,
        segment_cache_path,
    )

    paths, root = env
    frames_dir = paths["ds.vsitu.video_frms_tdir"]
    import pathlib

    seg = sorted(p.name for p in pathlib.Path(frames_dir).iterdir())[0]
    cache_dir = tmp_path / "rebuild_cache"
    cache_dir.mkdir()
    np.save(segment_cache_path(cache_dir, seg, 32),
            np.zeros((100, 32, 32, 3), np.uint8))

    class _V:
        reverse_input_channel = False
        arch = "slowfast"

        class slowfast:
            alpha = 4

        mean = [0.45, 0.45, 0.45]
        std = [0.225, 0.225, 0.225]

    cent = {f"Ev{e}": 30 + 60 * (e - 1) for e in range(1, 6)}
    got = load_event_clips(
        frames_dir, seg, cent, frm_seq_len=64, sampling_rate=2, vid_cfg=_V,
        max_frms=300, out_hw=32, cache_dir=str(cache_dir), cache_write=True,
    )
    ref = load_event_clips(
        frames_dir, seg, cent, frm_seq_len=64, sampling_rate=2, vid_cfg=_V,
        max_frms=300, out_hw=32,
    )
    np.testing.assert_array_equal(
        got["frms_ev_fast_tensor"], ref["frms_ev_fast_tensor"]
    )
    rebuilt = np.load(segment_cache_path(cache_dir, seg, 32), mmap_mode="r")
    assert rebuilt.shape[0] == 300  # the stale file was replaced


def test_fast_cache_key_is_distinct():
    """fast (DCT-scaled, lossy) caches live under a distinct filename so
    they can never poison an exact-path reader."""
    from vidsitu_tpu.data.frames import segment_cache_path

    exact = segment_cache_path("/c", "v_seg", 224)
    fast = segment_cache_path("/c", "v_seg", 224, fast=True)
    assert exact != fast
    assert fast.name.endswith("_fast.npy")


def test_prep_cli_builds_cache(env, tmp_path):
    import json

    from vidsitu_tpu.prep import main as prep_main

    from pathlib import Path

    paths, root = env
    frames_dir = paths["ds.vsitu.video_frms_tdir"]
    segs = sorted(p.name for p in Path(frames_dir).iterdir())
    split_file = tmp_path / "segs.json"
    split_file.write_text(json.dumps(segs[:2]))
    cache_dir = tmp_path / "cli_cache"
    prep_main([
        "--task_type=build_frame_cache",
        f"--split_file={split_file}",
        f"--frames_dir={frames_dir}",
        f"--cache_dir={cache_dir}",
        "--out_hw=32",
        "--max_workers=2",
    ])
    built = sorted(p.name for p in cache_dir.glob("*_32.npy"))
    assert built == [f"{s}_32.npy" for s in segs[:2]]
    arr = np.load(cache_dir / built[0], mmap_mode="r")
    assert arr.shape == (300, 32, 32, 3) and arr.dtype == np.uint8


def test_short_segment_edge_clamped(env, tmp_path):
    """A legal 290-299-frame segment (prep and the reference's strict
    check both accept >= 290, dwn_yt.py:169-176) must load without a
    FileNotFoundError: the JPEG path edge-clamps to the frames on disk
    and the cache pads by repeating the last frame, bit-identically."""
    from pathlib import Path

    from vidsitu_tpu.data.frames import load_event_clips, write_segment_cache

    paths, root = env
    frames_dir = paths["ds.vsitu.video_frms_tdir"]
    seg = sorted(p.name for p in Path(frames_dir).iterdir())[1]
    short_root = tmp_path / "short_frames"
    shutil.copytree(Path(frames_dir) / seg, short_root / seg)
    for ix in range(294, 301):  # 293 frames on disk
        (short_root / seg / f"{seg}_{ix:06d}.jpg").unlink()

    class _V:
        reverse_input_channel = False
        arch = "slowfast"

        class slowfast:
            alpha = 4

        mean = [0.45, 0.45, 0.45]
        std = [0.225, 0.225, 0.225]

    # Ev5's window (center 270, half 32) requests frames up to 300
    cent = {f"Ev{e}": 30 + 60 * (e - 1) for e in range(1, 6)}
    jpg = load_event_clips(
        short_root, seg, cent, frm_seq_len=64, sampling_rate=2, vid_cfg=_V,
        max_frms=300, out_hw=32,
    )
    # frames past 293 duplicate the edge frame
    fast = jpg["frms_ev_fast_tensor"]
    np.testing.assert_array_equal(fast[4, -1], fast[4, -4])

    cache_dir = tmp_path / "short_seg_cache"
    p = write_segment_cache(short_root, seg, cache_dir, out_hw=32)
    track = np.load(p, mmap_mode="r")
    assert track.shape[0] == 300  # padded to the full geometry
    np.testing.assert_array_equal(track[293], track[299])
    cached = load_event_clips(
        short_root, seg, cent, frm_seq_len=64, sampling_rate=2, vid_cfg=_V,
        max_frms=300, out_hw=32, cache_dir=str(cache_dir), cache_write=False,
    )
    np.testing.assert_array_equal(
        cached["frms_ev_fast_tensor"], jpg["frms_ev_fast_tensor"]
    )


def test_empty_segment_raises(tmp_path):
    from vidsitu_tpu.data.frames import write_segment_cache

    (tmp_path / "frames" / "v_e_seg_0_10").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        write_segment_cache(tmp_path / "frames", "v_e_seg_0_10",
                            tmp_path / "c", out_hw=32)
