"""Data-layer tests: padding, sampling geometry, datasets, loader sharding."""

import numpy as np
import pytest

from vidsitu_tpu.data import (
    VsituDS,
    add_prev_tokens,
    build_comm,
    get_data,
    pad_tokens,
)
from vidsitu_tpu.data.frames import get_sequence, normalize_frames, pack_pathways
from vidsitu_tpu.data.loader import DataLoader, ShardedSampler
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.utils.config import get_cfg_with_overrides


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataroot")
    paths = make_synth_dataset(
        root, n_train=8, n_valid=5, n_test=3, seed=11, with_frames=True
    )
    return paths


def mk_cfg(paths, **kw):
    return get_cfg_with_overrides("datatest", **{**paths, **kw})


# ----------------------------- pad utils -----------------------------------


def test_pad_tokens_right_and_eos():
    ids, mask = pad_tokens([5, 6, 7], pad_index=0, pad_side="right",
                           append_eos=True, eos_index=9, max_len=6)
    assert ids.tolist() == [5, 6, 7, 9, 0, 0]
    assert mask == [1, 1, 1, 1, 0, 0]
    # truncation overwrites last with eos (dat_utils.py:204-207)
    ids2, mask2 = pad_tokens(list(range(10)), 0, "right", True, 9, 5)
    assert ids2.tolist() == [0, 1, 2, 3, 9]
    assert mask2 == [1] * 5
    # left pad
    ids3, mask3 = pad_tokens([5, 6], 0, "left", False, 9, 4)
    assert ids3.tolist() == [0, 0, 5, 6]
    assert mask3 == [0, 0, 1, 1]
    # left pad + eos: [pad..., seq, eos] — the eos used to land inside
    # the padding region with the mask covering a pad instead
    ids4, mask4 = pad_tokens([7, 8], 0, "left", True, 2, 6)
    assert ids4.tolist() == [0, 0, 0, 7, 8, 2]
    assert mask4 == [0, 0, 0, 1, 1, 1]


def test_add_prev_tokens():
    src = np.array([[4, 5, 6], [7, 8, 9]])
    prev = add_prev_tokens(src, pad_token=0, bos_token=1)
    assert prev.tolist() == [[1, 4, 5], [1, 7, 8]]


# ----------------------------- frame geometry --------------------------------


def test_get_sequence_clamping():
    # event 1 center=30, 64-window stride 2 -> starts below 0, clamped
    seq = get_sequence(30, 32, 2, 300)
    assert len(seq) == 32
    assert seq[0] == 0 and seq[-1] == 60
    seq2 = get_sequence(270, 32, 2, 300)
    assert seq2[-1] == 299  # clamped at top


def test_pack_pathways_slowfast():
    cfg = get_cfg_with_overrides()
    frames = np.zeros((32, 8, 8, 3), dtype=np.float32)
    paths = pack_pathways(frames, cfg.vid_mdl)
    assert paths["fast"].shape == (32, 8, 8, 3)
    assert paths["slow"].shape == (8, 8, 8, 3)
    cfg_i3d = get_cfg_with_overrides(**{"mdl.sf_mdl_name": "i3d_r50_8x8"})
    frames8 = np.zeros((8, 8, 8, 3), dtype=np.float32)
    assert set(pack_pathways(frames8, cfg_i3d.vid_mdl)) == {"fast"}


def test_normalize_frames():
    x = (np.ones((2, 4, 4, 3)) * 255).astype(np.uint8)
    out = normalize_frames(x, [0.45] * 3, [0.225] * 3)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, (1.0 - 0.45) / 0.225, rtol=1e-6)


# ----------------------------- datasets --------------------------------------


def test_vb_dataset_shapes(synth_cfg):
    cfg = mk_cfg(synth_cfg, task_type="vb")
    comm = build_comm(cfg)
    ds = VsituDS(cfg, comm, "train")
    item = ds[0]
    assert item["frms_ev_fast_tensor"].shape == (5, 32, 224, 224, 3)
    assert item["frms_ev_slow_tensor"].shape == (5, 8, 224, 224, 3)
    assert item["label_tensor"].shape == (5,)
    assert item["label_tensor10"].shape == (5, 10)
    dsv = VsituDS(cfg, comm, "valid")
    itv = dsv[0]
    # valid labels come from the 10-annotator vinfo matrix
    assert (itv["label_tensor10"] != comm.vb_id_vocab.pad_index).sum() == 50


def test_vb_arg_dataset_shapes(synth_cfg):
    cfg = mk_cfg(
        synth_cfg, task_type="vb_arg", **{"mdl.mdl_name": "sfpret_txed_vbarg"}
    )
    comm = build_comm(cfg)
    ds = VsituDS(cfg, comm, "train")
    item = ds[0]
    assert item["seq_out_by_ev"].shape == (5, 1, 60)
    assert item["seq_out_lens_by_ev"].shape == (5, 1, 60)
    assert item["vb_out_by_ev"].shape == (5, 1, 5)
    assert item["seq_out_ev_comb_tok"].shape == (1, 300)
    assert item["frm_feats"].shape == (5, 2048)
    # first token of each event seq is the verb's (single) added-token id
    av = comm.gpt2_hf_tok.get_added_vocab()
    first_toks = item["seq_out_by_ev"][:, 0, 0]
    assert all(t in av.values() for t in first_toks)
    # valid has 3 annotators
    dsv = VsituDS(cfg, comm, "valid")
    assert dsv[0]["seq_out_by_ev"].shape == (5, 3, 60)

    # token-only model skips features
    cfg2 = mk_cfg(synth_cfg, task_type="vb_arg", **{"mdl.mdl_name": "tx_only"})
    ds2 = VsituDS(cfg2, build_comm(cfg2), "train")
    assert "frm_feats" not in ds2[0]


def test_vb_arg_decode_roundtrip(synth_cfg):
    """Dataset token row decodes back to 'verb <ArgX> text...' format."""
    cfg = mk_cfg(synth_cfg, task_type="vb_arg", **{"mdl.mdl_name": "tx_only"})
    comm = build_comm(cfg)
    ds = VsituDS(cfg, comm, "train")
    item = ds[0]
    tok = comm.gpt2_hf_tok
    row = item["seq_out_by_ev"][0, 0]
    msk = item["seq_out_lens_by_ev"][0, 0]
    text = tok.decode(row[: msk.sum()][:-1])  # strip eos
    assert text.split(" ")[0].endswith(tuple(f".{i:02d}" for i in range(1, 100))) or (
        "." in text.split(" ")[0]
    )
    assert "<" in text  # contains arg separators


def test_evrel_dataset_shapes(synth_cfg):
    cfg = mk_cfg(synth_cfg, task_type="evrel", **{"mdl.mdl_name": "sfpret_evrel"})
    comm = build_comm(cfg)
    ds = VsituDS(cfg, comm, "valid")
    item = ds[0]
    assert item["evrel_seq_out"].shape == (4, 3, 120)
    assert item["evrel_labs"].shape == (4, 3)
    assert item["evrel_seq_out_ones"].shape == (5, 3, 60)
    assert item["evrel_vbonly_out_ones"].shape == (5, 3, 5)
    assert item["frm_feats"].shape == (5, 2048)
    # pair sequences contain the roberta sep token
    sep = comm.rob_hf_tok.sep_token_id
    assert (item["evrel_seq_out"][0, 0] == sep).sum() >= 1


# ----------------------------- loader -----------------------------------------


def test_sharded_sampler_partition():
    idx_all = set()
    for shard in range(4):
        s = ShardedSampler(10, shuffle=False, num_shards=4, shard_id=shard)
        got = list(s)
        assert len(got) == 3  # padded to 12 / 4
        idx_all.update(got)
    assert idx_all == set(range(10))


def test_sharded_sampler_more_shards_than_samples():
    """Padding must REPEAT the order enough times: with 2 samples over 8
    shards a single wrap left shards 4-7 empty while __len__ claimed 1 —
    an empty shard hangs a multi-host collective step."""
    idx_all = []
    for shard in range(8):
        s = ShardedSampler(2, shuffle=False, num_shards=8, shard_id=shard)
        got = list(s)
        assert len(got) == len(s) == 1, f"shard {shard} got {got}"
        idx_all += got
    assert set(idx_all) == {0, 1}


def test_loader_abandoned_iteration_stops_producer(synth_cfg):
    """Breaking out of iteration (the main.py warm-up `next(iter(dl))`
    pattern) must wake a producer blocked in q.put and let the thread
    exit instead of pinning decoded batches for the process lifetime."""
    import threading
    import time as _time

    cfg = mk_cfg(synth_cfg, task_type="vb_arg", **{"mdl.mdl_name": "tx_only"})
    comm = build_comm(cfg)
    ds = VsituDS(cfg, comm, "train")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_threads=1,
                    prefetch=1)
    before = {t.ident for t in threading.enumerate()}
    it = iter(dl)
    next(it)  # producer fills the queue and blocks in put on the next one
    it.close()  # generator finally -> stop.set()
    deadline = _time.time() + 10.0
    while _time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        _time.sleep(0.05)
    assert not extra, f"producer thread leaked: {extra}"


def test_sharded_sampler_epoch_shuffle():
    s = ShardedSampler(20, shuffle=True, num_shards=1, shard_id=0, seed=1)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert e0 != e1
    assert sorted(e0) == list(range(20))


def test_loader_batching_and_threads(synth_cfg):
    cfg = mk_cfg(synth_cfg, task_type="vb_arg", **{"mdl.mdl_name": "tx_only"})
    comm = build_comm(cfg)
    ds = VsituDS(cfg, comm, "train")
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, num_threads=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    assert batches[0]["seq_out_by_ev"].shape == (4, 5, 1, 60)
    # sequential equals threaded content-wise for same epoch
    dl0 = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, num_threads=0)
    b0 = list(dl0)
    np.testing.assert_array_equal(
        b0[0]["seq_out_by_ev"], batches[0]["seq_out_by_ev"]
    )


def test_get_data_end_to_end(synth_cfg):
    cfg = mk_cfg(
        synth_cfg,
        task_type="vb_arg",
        **{"mdl.mdl_name": "tx_only", "train.bs": 4, "train.bsv": 4},
    )
    data = get_data(cfg)
    b = next(iter(data.train_dl))
    assert b["seq_out_by_ev"].shape == (4, 5, 1, 60)
    bv = next(iter(data.valid_dl))
    assert bv["seq_out_by_ev"].shape == (4, 5, 3, 60)
    # global batch must divide across shards
    with pytest.raises(AssertionError):
        get_data(cfg, num_shards=3, shard_id=0)


def test_uint8_device_preproc_matches_host_path():
    """Host float preproc (normalize -> reverse) and uint8 on-device preproc
    (reverse host-side -> normalize on device) must produce identical
    tensors, including when reverse_input_channel is set
    (ref order: dat_loader.py:478-484 + video_utils.py:52)."""
    import jax.numpy as jnp
    from types import SimpleNamespace

    from vidsitu_tpu.data.frames import normalize_frames, pack_pathways
    from vidsitu_tpu.models.vb_models import _maybe_normalize
    from vidsitu_tpu.models.video_backbone import VideoCfg

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(8, 6, 6, 3), dtype=np.uint8)
    mean, std = (0.45, 0.41, 0.38), (0.225, 0.24, 0.26)

    for rev in (False, True):
        host_cfg = SimpleNamespace(
            reverse_input_channel=rev, arch="slowfast",
            slowfast=SimpleNamespace(alpha=4),
        )
        # host float path: normalize THEN reverse (reference order)
        host = pack_pathways(normalize_frames(frames, mean, std), host_cfg)
        # uint8 device path: reverse host-side, normalize on device
        dev_in = pack_pathways(frames, host_cfg)
        vcfg = VideoCfg(mean=mean, std=std, reverse_input_channel=rev)
        for k in ("fast", "slow"):
            dev = _maybe_normalize(
                jnp.asarray(np.ascontiguousarray(dev_in[k])), vcfg,
                jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(dev), host[k].astype(np.float32),
                rtol=1e-6, atol=1e-6,
            )


def test_loader_threaded_items_match_serial(synth_cfg):
    """Thread-pool item fetching yields identical batches in identical
    order vs the serial path."""
    from vidsitu_tpu.data.dataset import VsituDS
    from vidsitu_tpu.data.loader import DataLoader

    cfg = mk_cfg(synth_cfg, **{"task_type": "vb_arg"})
    ds = VsituDS(cfg, {}, split_type="train")
    a = DataLoader(ds, batch_size=3, shuffle=True, seed=3, num_threads=0)
    b = DataLoader(ds, batch_size=3, shuffle=True, seed=3, num_threads=4)
    a.set_epoch(1)
    b.set_epoch(1)
    for ba, bb in zip(list(a), list(b)):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_prefetch_to_device_preserves_order(synth_cfg):
    import jax
    from jax.sharding import Mesh

    from vidsitu_tpu.parallel.mesh import prefetch_to_device

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    batches = [{"x": np.full((2, 3), i)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, lookahead=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
