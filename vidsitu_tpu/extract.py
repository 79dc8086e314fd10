"""Pre-extracted feature pipeline (reference:
vidsitu_code/feat_extractor.py): run the video backbone + trimmed head
over every segment of the requested splits and write one
``{seg}_feats.npy`` of shape (5, D) per segment — the input contract of
the SFPreFeats_* SRL models and the sfpret_* evrel models.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import VsituDS
from .data.loader import DataLoader, fold_frame_events
from .models.vb_models import build_feat_extractor


def default_feats_dir(cfg, mdl_name: Optional[str] = None) -> Path:
    """Per-model feature directory, like the reference's
    ``vsitu_frm_feats/{mdl_name}`` (feat_extractor.py:86): SRL training
    reads a named subdir (ds.vsitu.vsit_frm_feats_dir) and two backbones
    must never clobber each other's features."""
    return Path(cfg.ds.vsitu.vsitu_frm_feats) / (
        mdl_name or cfg.mdl.sf_mdl_name
    )


class FramesOnlyDS:
    """All-splits frames dataset (VsituDS_All, feat_extractor.py:20-74)."""

    def __init__(self, cfg, comm, split_type: str):
        base = VsituDS(cfg, comm, split_type, task_type="vb")
        self.base = base
        self.vseg_lst = base.vseg_lst

    def __len__(self):
        # delegate: VsituDS owns the debug-mode cap (dataset.py)
        return len(self.base)

    def __getitem__(self, idx: int):
        out = self.base.get_frms_all(idx)
        out["vseg_idx"] = np.asarray(idx, dtype=np.int64)
        return out


def extract_features(
    cfg,
    comm,
    variables=None,
    splits: Optional[List[str]] = None,
    out_dir: Optional[str] = None,
    batch_size: int = 4,
    num_threads: int = 0,
    mdl_name: Optional[str] = None,
    clip_batch: int = 128,
    n_devices: int = 1,
) -> Dict[str, int]:
    """Extract features for the given splits. Returns counts per split.

    The device consumes a FLAT clip stream in batches of exactly
    ``clip_batch`` clips (default 128): the whole inference program is
    batch-minor on current stacks, so the clip dim pads to 128-lane
    multiples, and 128 clips — zero padding waste, power-of-2 tiling —
    measures 810.9 vs 790.6 clips/s at the 120-clip video-granularity
    point (benchmarks/micro25; BENCH.md featext chapter). Videos load
    at ``batch_size`` granularity, the 5-event fold is a free host
    view, clips buffer until a full device batch is ready, and the
    (5, D) per-segment regroup happens host-side after the fetch (each
    segment's 5 clips are consecutive in stream order even when they
    span device batches). The final partial batch is zero-padded to
    ``clip_batch`` so the whole run uses ONE compiled executable.

    With ``n_devices > 1`` (or 0 = all local devices) the clip axis is
    additionally sharded over a local ``Mesh(('data',))`` — each device
    computes its own ``clip_batch`` clips, so one host drives all of a
    v5e's chips from the same flat stream (the global device batch is
    ``clip_batch * n_devices``). Params are replicated; per-clip
    inference needs no collectives. This composes with the multi-host
    process sharding below (hosts split segments, each host's chips
    split its clip stream).

    The input pipeline overlaps with device compute: JPEG decode runs in
    the loader's thread pool (``num_threads``), the next batch's
    host->device transfer is started while the current batch computes,
    and the previous batch's features are written to disk while the
    device works (dispatch is async, the np.asarray fetch synchronizes).
    """
    import os
    import uuid
    from collections import deque

    from .models.vb_models import VbVideoModel

    assert clip_batch >= 1, f"clip_batch must be >= 1, got {clip_batch}"
    ndev = n_devices if n_devices >= 1 else len(jax.local_devices())
    assert ndev <= len(jax.local_devices()), (
        f"n_devices={ndev} but only {len(jax.local_devices())} local "
        "devices are visible")
    clip_shard = repl = None
    if ndev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(jax.local_devices()[:ndev]), ("data",))
        clip_shard = NamedSharding(mesh, PartitionSpec("data"))
        repl = NamedSharding(mesh, PartitionSpec())
        if variables is not None:
            variables = jax.device_put(variables, repl)
    global_clip_batch = clip_batch * ndev
    splits = splits or ["valid", "train"]
    out_dir = Path(out_dir) if out_dir else default_feats_dir(cfg, mdl_name)
    out_dir.mkdir(parents=True, exist_ok=True)

    model = build_feat_extractor(cfg)
    counts: Dict[str, int] = {}
    # Weight-frozen inference specialization: the parameters are fixed
    # for the whole extraction run, so BAKE them into the executable as
    # closure constants instead of passing them per call — XLA then
    # pre-lays-out / pre-folds the weights at compile time, measuring
    # ~6% faster per batch than the params-as-arguments program at the
    # bench geometry (benchmarks/micro22: 151.7 vs 161.3 ms / 120 clips
    # on v5e, a gap layout-pinning does not close).
    _fwd_cache: Dict[int, object] = {}

    def fwd(b):
        # `variables` is deliberately a closure constant (baked into
        # the executable at first trace) — do NOT turn it into a
        # parameter: per-call params would defeat the constant folding,
        # and a param that is only read on the first call would
        # silently ignore later swaps
        if not _fwd_cache:
            _fwd_cache[0] = jax.jit(lambda bb: model.apply(
                variables, bb, method=VbVideoModel.clip_features))
        return _fwd_cache[0](b)
    # multi-host: shard segments across processes (featext is
    # embarrassingly parallel; without this every host would re-extract
    # the full split and race on the same output files)
    num_shards = jax.process_count()
    shard_id = jax.process_index()
    for split in splits:
        ds = FramesOnlyDS(cfg, comm, split)
        dl = DataLoader(ds, batch_size=batch_size, shuffle=False,
                        drop_last=False, num_threads=num_threads,
                        num_shards=num_shards, shard_id=shard_id)
        n = 0
        parts: List[Dict[str, np.ndarray]] = []  # buffered folded clips
        n_buf = 0
        keys: List[str] = []
        vid_queue: deque = deque()  # vseg indices in stream order
        row_buf: Optional[np.ndarray] = None  # <5 rows spanning flushes
        pending = None  # (device feats, n_valid) one step behind

        def write_seg(seg: str, arr: np.ndarray):
            nonlocal n
            # tmp + atomic rename: a crash (or, across hosts, the
            # sampler's pad duplicates) must never leave a torn
            # .npy that downstream training silently loads; pid is
            # not unique across hosts sharing the dir, hence the uuid
            tmp = out_dir / (
                f".{seg}_feats.{os.getpid()}_"
                f"{uuid.uuid4().hex[:8]}.npy.tmp"
            )
            with open(tmp, "wb") as f:  # np.save(path) would append .npy
                np.save(f, arr)
            os.replace(tmp, out_dir / f"{seg}_feats.npy")
            n += 1

        def flush(item):
            nonlocal row_buf
            out, n_valid = item
            # sync point; cast: a bfloat16 model body would otherwise
            # serialize raw-void ('|V2') npys that downstream np.load
            # can't interpret — the feature-file contract is float32
            # (reference feat_extractor.py saves f32)
            feats = np.asarray(out).astype(np.float32, copy=False)[:n_valid]
            rows = (feats if row_buf is None or not len(row_buf)
                    else np.concatenate([row_buf, feats]))
            k = rows.shape[0] // 5
            for i in range(k):
                seg = ds.vseg_lst[vid_queue.popleft()]
                write_seg(seg, rows[5 * i:5 * i + 5])
            row_buf = rows[5 * k:]

        def pop_clip_batch(n_take: int) -> Dict[str, np.ndarray]:
            nonlocal n_buf
            taken: Dict[str, list] = {k: [] for k in keys}
            got = 0
            while got < n_take:
                part = parts[0]
                avail = part[keys[0]].shape[0]
                take = min(n_take - got, avail)
                for k in keys:
                    taken[k].append(part[k][:take])
                if take == avail:
                    parts.pop(0)
                else:
                    for k in keys:
                        part[k] = part[k][take:]  # view, no copy
                got += take
            n_buf -= n_take
            return {k: (v[0] if len(v) == 1 else np.concatenate(v))
                    for k, v in taken.items()}

        def dispatch(dev_np: Dict[str, np.ndarray], n_valid: int):
            nonlocal variables, pending
            if variables is None:
                # init on a 1-clip slice: params are batch-independent,
                # and at ndev>1 the full global batch must never land on
                # one device
                one = {k: jnp.asarray(v[:1]) for k, v in dev_np.items()}
                variables = jax.jit(lambda r, b: model.init(
                    r, b, method=VbVideoModel.clip_features)
                )(jax.random.PRNGKey(0), one)
                if repl is not None:
                    variables = jax.device_put(variables, repl)
            if clip_shard is not None:
                dev = {k: jax.device_put(v, clip_shard)
                       for k, v in dev_np.items()}
            else:
                dev = {k: jnp.asarray(v) for k, v in dev_np.items()}
            out = fwd(dev)  # async dispatch
            if pending is not None:
                flush(pending)
            pending = (out, n_valid)

        for batch in dl:
            folded = fold_frame_events(batch)
            if not keys:
                keys = [k for k in
                        ("frms_ev_fast_tensor", "frms_ev_slow_tensor")
                        if folded.get(k) is not None]
            parts.append({k: np.asarray(folded[k]) for k in keys})
            n_buf += parts[-1][keys[0]].shape[0]
            vid_queue.extend(int(i) for i in np.asarray(batch["vseg_idx"]))
            while n_buf >= global_clip_batch:
                dispatch(pop_clip_batch(global_clip_batch),
                         global_clip_batch)
        if n_buf:
            tail = pop_clip_batch(n_buf)
            pad = global_clip_batch - tail[keys[0]].shape[0]
            tail = {k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                for k, v in tail.items()}
            dispatch(tail, global_clip_batch - pad)
        if pending is not None:
            flush(pending)
        assert not vid_queue and (row_buf is None or not len(row_buf)), (
            "clip-stream regroup invariant broken: leftover "
            f"{len(vid_queue)} videos / "
            f"{0 if row_buf is None else len(row_buf)} rows"
        )
        counts[split] = n
    return counts


def main(argv=None):
    """CLI: python -m vidsitu_tpu.extract --split=valid --split=train ...
    (reference: python vidsitu_code/feat_extractor.py, :115-179)."""
    import argparse
    import os

    import jax as _jax

    if os.environ.get("VIDSITU_PLATFORM"):
        _jax.config.update("jax_platforms", os.environ["VIDSITU_PLATFORM"])

    ap = argparse.ArgumentParser(description="extract video features")
    ap.add_argument("--split", action="append", default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument(
        "--mdl_name_used", default=None,
        help="subdirectory under ds.vsitu.vsitu_frm_feats (reference "
             "feat_extractor.py main arg; default: cfg.mdl.sf_mdl_name)",
    )
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument(
        "--clip_batch", type=int, default=128,
        help="PER-DEVICE batch in CLIPS (flat 5-event stream); 128 = "
             "zero 128-lane padding waste on batch-minor stacks "
             "(BENCH.md)")
    ap.add_argument(
        "--n_devices", type=int, default=0,
        help="local chips to shard the clip stream over (0 = all); "
             "composes with multi-host segment sharding")
    ap.add_argument("--num_threads", type=int, default=8,
                    help="JPEG-decode thread pool size")
    ap.add_argument("--ckpt", default="", help="converted SFBase checkpoint")
    ap.add_argument(
        "--allow_random_weights", action="store_true",
        help="extract from a randomly initialized backbone (testing only)",
    )
    ap.add_argument("overrides", nargs="*", help="--dotted.key=value")
    args, unknown = ap.parse_known_args(argv)

    from .data.comm import build_comm
    from .utils.config import get_cfg_with_overrides

    overrides = {}
    for tok in list(args.overrides) + list(unknown):
        assert tok.startswith("--") and "=" in tok, tok
        k, v = tok[2:].split("=", 1)
        overrides[k] = v
    cfg = get_cfg_with_overrides("featext", **overrides)
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache(cfg)
    comm = build_comm(cfg)
    variables = None
    if not args.ckpt and not args.allow_random_weights:
        # without a checkpoint the features would come from RANDOM
        # weights and downstream models would silently train on noise
        ap.error(
            "--ckpt is required (pass --allow_random_weights to extract "
            "from a randomly initialized backbone, e.g. for smoke tests)"
        )
    if args.ckpt:
        from .convert.hf_torch import load_torch_state_dict
        from .convert.slowfast_torch import convert_sfbase_checkpoint

        sd = load_torch_state_dict(args.ckpt)
        conv = convert_sfbase_checkpoint(sd, cfg.vid_mdl.arch)
        variables = {
            "params": {"backbone": conv["params"]["backbone"]},
            "batch_stats": {"backbone": conv["batch_stats"]["backbone"]},
        }
    counts = extract_features(
        cfg, comm, variables=variables,
        splits=args.split or ["valid", "train"],
        out_dir=args.out_dir, batch_size=args.batch_size,
        num_threads=args.num_threads, mdl_name=args.mdl_name_used,
        clip_batch=args.clip_batch, n_devices=args.n_devices,
    )
    print(counts)


if __name__ == "__main__":
    main()
