"""End-to-end featext from ON-DISK frames (round 3, VERDICT item 5).

The 696 clips/s headline is device-only; this measures the complete
user-facing pipeline — frames on disk -> loader -> host->device ->
SlowFast-R50 8x8 -> (5,2304) features written — on this 1-CPU-core
host, with and without the decoded-uint8 frame cache
(+ tpu.on_device_preproc), at the real 224p geometry.

Protocol: each extract_features call re-traces its jit and re-hits the
XLA compile cache (fixed overhead), so the steady-state rate is taken
as the DELTA between a big split and a small split:
    rate = (clips_big - clips_small) / (t_big - t_small)

Run: python -u benchmarks/micro14.py [n_big] [n_small]
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from pathlib import Path

import numpy as np


def _mk_cfg(paths, root, **kw):
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    return get_cfg_with_overrides(
        "fx_e2e",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
            "train.dtype": "bfloat16",
            "train.nw": 0,
            "misc.tmp_path": str(root / "tmp"),
            **kw,
        },
    )


def _run(paths, root, out_tag, **kw):
    from vidsitu_tpu.data.comm import build_comm
    from vidsitu_tpu.extract import extract_features

    cfg = _mk_cfg(paths, root, **kw)
    comm = build_comm(cfg)
    feats_out = root / f"feats_{out_tag}"
    t0 = time.perf_counter()
    counts = extract_features(cfg, comm, splits=["train"],
                              out_dir=str(feats_out), batch_size=2,
                              num_threads=4)
    dt = time.perf_counter() - t0
    one = np.load(next(feats_out.glob("*_feats.npy")))
    assert one.shape == (5, 2304), one.shape
    return counts["train"] * 5, dt


def main(n_big=12, n_small=2):
    import tempfile

    from vidsitu_tpu.data.frames import write_segment_cache
    from vidsitu_tpu.data.synth import make_synth_dataset

    roots, trees = {}, {}
    for tag, n in (("big", n_big), ("small", n_small)):
        root = Path(tempfile.mkdtemp(prefix=f"fx_e2e_{tag}_"))
        print(f"fabricating {n} segments of 300 x 224p JPEGs ({tag})...",
              flush=True)
        trees[tag] = make_synth_dataset(root, n_train=n, n_valid=1, seed=0,
                                        with_frames=True, frame_hw=224)
        roots[tag] = root

    # one-time cache build (timed on the big tree)
    caches = {}
    for tag in ("big", "small"):
        frames_dir = trees[tag]["ds.vsitu.video_frms_tdir"]
        cache_dir = roots[tag] / "frame_cache"
        segs = sorted(p.name for p in Path(frames_dir).iterdir())
        t0 = time.perf_counter()
        for seg in segs:
            write_segment_cache(frames_dir, seg, cache_dir, out_hw=224)
        if tag == "big":
            t_cache = time.perf_counter() - t0
            print(f"cache built: {len(segs)} segments in {t_cache:.1f}s "
                  f"({t_cache / len(segs):.2f}s/seg)", flush=True)
        caches[tag] = cache_dir

    for name, kw in (
        ("jpeg (reference strategy)", lambda tag: {}),
        ("cache + on_device_preproc", lambda tag: {
            "tpu.frame_cache_dir": str(caches[tag]),
            "tpu.frame_cache_write": False,
            "tpu.on_device_preproc": True}),
    ):
        # warm (real compile), then timed small + timed big (both pay
        # the same retrace + compile-cache-hit fixed overhead)
        _run(trees["small"], roots["small"], "warm", **kw("small"))
        c_s, t_s = _run(trees["small"], roots["small"], "s", **kw("small"))
        c_b, t_b = _run(trees["big"], roots["big"], "b", **kw("big"))
        rate = (c_b - c_s) / max(t_b - t_s, 1e-9)
        print(f"{name:<28} small {c_s} clips/{t_s:.1f}s, big {c_b} "
              f"clips/{t_b:.1f}s -> steady {rate:6.1f} clips/s "
              f"end-to-end", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]) if len(sys.argv) > 1 else ())
