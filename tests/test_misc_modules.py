"""LSTM encoder, box utils, SRL beam>1 decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.models.lang_utils import LSTMEncoder
from vidsitu_tpu.utils.box_utils import bbox_overlaps_batch, box_iou


def test_lstm_encoder_shapes_and_masking():
    enc = LSTMEncoder(vocab_size=30, embed_dim=16, hidden_dim=16, pad_id=0)
    toks = jnp.array([[5, 6, 7, 0, 0], [8, 9, 10, 11, 0]], jnp.int32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), toks)
    out = jax.jit(lambda t: enc.apply(variables, t))(toks)
    assert out["outputs"].shape == (2, 5, 16)
    assert out["final"].shape == (2, 16)
    # padded positions are zeroed
    np.testing.assert_allclose(np.asarray(out["outputs"][0, 3:]), 0.0)
    # final state == last valid output
    np.testing.assert_allclose(
        np.asarray(out["final"][0]), np.asarray(out["outputs"][0, 2])
    )


def test_lstm_bidirectional():
    enc = LSTMEncoder(vocab_size=30, embed_dim=8, hidden_dim=8,
                      bidirectional=True, pad_id=0)
    toks = jnp.array([[5, 6, 7, 0]], jnp.int32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), toks)
    out = jax.jit(lambda t: enc.apply(variables, t))(toks)
    assert out["outputs"].shape == (1, 4, 16)


def test_lstm_bidirectional_pad_invariant():
    """Packed-sequence equivalence: trailing pads must not change the
    states at valid positions (the backward scan used to consume pad
    embeddings before the valid tokens) nor the final summary."""
    enc = LSTMEncoder(vocab_size=30, embed_dim=8, hidden_dim=8,
                      bidirectional=True, num_layers=2, pad_id=0)
    toks5 = jnp.array([[5, 6, 7, 0, 0]], jnp.int32)
    toks3 = jnp.array([[5, 6, 7]], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), toks5)
    out5 = enc.apply(variables, toks5)
    out3 = enc.apply(variables, toks3)
    np.testing.assert_allclose(
        np.asarray(out5["outputs"][:, :3]), np.asarray(out3["outputs"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out5["final"]), np.asarray(out3["final"]),
        rtol=1e-5, atol=1e-6,
    )
    # the backward half of `final` summarizes the WHOLE sequence (it is
    # the backward state at position 0), not just the last token
    np.testing.assert_allclose(
        np.asarray(out5["final"][:, 8:]),
        np.asarray(out5["outputs"][:, 0, 8:]),
        rtol=1e-6,
    )


def test_box_iou():
    a = np.array([[0, 0, 2, 2]], dtype=float)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], dtype=float)
    iou = box_iou(a, b)
    assert iou.shape == (1, 3)
    assert iou[0, 0] == pytest.approx(1 / 7)
    assert iou[0, 1] == pytest.approx(1.0)
    assert iou[0, 2] == 0.0
    batched = bbox_overlaps_batch(a, b[None])
    assert batched.shape == (1, 1, 3)


def test_srl_beam2_generation(tmp_path):
    """beam>1 through the full SRL generator: verb-forced, scored."""
    from vidsitu_tpu.data import build_comm, get_data
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.models.selector import (
        build_model,
        build_srl_generate_fn,
        init_model_variables,
    )
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4, seed=91)
    cfg = get_cfg_with_overrides(
        "beam2",
        **{
            **paths,
            "task_type": "vb_arg",
            "mdl.mdl_name": "tx_only",
            "tx_dec.decoder_embed_dim": 32,
            "tx_dec.decoder_ffn_embed_dim": 64,
            "tx_dec.decoder_layers": 1,
            "tx_dec.decoder_attention_heads": 2,
            "train.bs": 8,
            "train.bsv": 4,
            "train.nw": 0,
            "train.nwv": 0,
            "train.dtype": "float32",
            "gen.beam_size": 2,
            "gen.len_penalty": 1.0,
        },
    )
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.valid_dl))
    variables = init_model_variables(model, batch)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    out = np.asarray(
        gen_fn(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    assert out.shape[:3] == (4, 5, 1)
    # verb forcing survives beam expansion
    np.testing.assert_array_equal(
        out[:, :, 0, 0], batch["seq_out_by_ev"][:, :, 0, 0]
    )


def test_prep_parse_and_pool():
    from vidsitu_tpu.prep import MissingToolError, parse_seg_name, run_pool

    ytid, st, en = parse_seg_name("v_abc-123_xy_seg_25_35")
    assert ytid == "abc-123_xy" and st == 25.0 and en == 35.0

    res = run_pool(lambda x: x * 2, [1, 2, 3], max_workers=2)
    assert res == {1: 2, 2: 4, 3: 6}
    # exceptions are captured per-item, not raised
    res2 = run_pool(lambda x: 1 // x, [0, 1], max_workers=2)
    assert isinstance(res2[0], ZeroDivisionError) and res2[1] == 1

    # missing binaries produce the gated error
    import shutil

    if shutil.which("ffmpeg") is None:
        import pytest as _pytest

        from vidsitu_tpu.prep import extract_frames

        with _pytest.raises(MissingToolError, match="ffmpeg"):
            extract_frames("x.mp4", "/tmp/fr", "v_a_seg_0_10")


def test_download_clip_idempotent_rerun(tmp_path, monkeypatch):
    """An already-downloaded, size+frame-valid clip is kept as-is: no
    yt-dlp/ffmpeg subprocess runs on a rerun (round-5 review fix — a
    29k-segment rerun used to re-download everything)."""
    from vidsitu_tpu import prep

    seg = "v_abc_seg_10_20"
    out = tmp_path / f"{seg}.mp4"
    out.write_bytes(b"x" * 30_000)
    monkeypatch.setattr(prep.shutil, "which", lambda b: f"/bin/{b}")
    monkeypatch.setattr(prep, "count_frames", lambda p: 300)

    def no_run(*a, **k):
        raise AssertionError("no subprocess should run on a valid rerun")

    monkeypatch.setattr(prep.subprocess, "run", no_run)
    assert prep.download_clip(seg, tmp_path) == out


def test_download_clip_failure_leaves_no_partial(tmp_path, monkeypatch):
    """A persistently-undersized download returns None AND removes the
    bad mp4 (round-5 review fix — extract_frames treats any existing
    mp4 as good, so a leftover partial corrupted the frame dump)."""
    from vidsitu_tpu import prep

    seg = "v_abc_seg_10_20"
    out = tmp_path / f"{seg}.mp4"
    monkeypatch.setattr(prep.shutil, "which", lambda b: f"/bin/{b}")
    sleeps = []
    monkeypatch.setattr(prep.time, "sleep", sleeps.append)

    class _R:
        stdout = "http://u\n"

    def fake_run(cmd, **k):
        if cmd[0] == "ffmpeg":
            out.write_bytes(b"tiny")  # truncated stream product
        return _R()

    monkeypatch.setattr(prep.subprocess, "run", fake_run)
    assert prep.download_clip(seg, tmp_path, retries=2) is None
    assert not out.exists()
    assert len(sleeps) == 2  # backoff applies to the size-fail path too


def test_packed_stem_conv_matches_plain_conv():
    """_PackedStemConv (output-packed stride-2 conv) == plain nn.Conv with
    the same canonical kernel, for both fast-stem and odd-size geometry."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from vidsitu_tpu.models.video_backbone import _PackedStemConv

    rng = jax.random.PRNGKey(0)
    for (shape, f, kt, g) in (
        ((2, 4, 32, 32, 3), 8, 5, 4),
        ((1, 2, 64, 64, 3), 8, 1, 4),
        ((2, 8, 32, 32, 3), 8, 5, (4, 2, 2)),  # temporal-packed fast stem
        ((2, 4, 32, 32, 3), 8, 3, (2, 2, 2)),
        ((1, 4, 32, 32, 3), 64, 1, (1, 1, 2)),  # slow-stem geometry
    ):
        x = jax.random.normal(rng, shape, jnp.float32)
        packed = _PackedStemConv(f, (kt, 7, 7), g=g)
        v = packed.init(jax.random.PRNGKey(1), x)
        yp = packed.apply(v, x)
        ref = nn.Conv(
            f, kernel_size=(kt, 7, 7), strides=(1, 2, 2),
            padding=((kt // 2, kt // 2), (3, 3), (3, 3)), use_bias=False,
        )
        yr = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert yp.shape == yr.shape
        np.testing.assert_allclose(
            np.asarray(yp), np.asarray(yr), rtol=2e-5, atol=2e-5
        )


def test_stem_packed_epilogue_bit_exact():
    """The inference fast-stem fused epilogue (packed BN-affine + relu +
    shifted-max pool, Stem._packed_epilogue) must be BIT-EXACT vs the
    plain unpacked chain, and the param tree identical."""
    import jax
    import jax.numpy as jnp

    from vidsitu_tpu.models.video_backbone import Stem, VideoCfg

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 32, 32, 3), jnp.float32)
    outs, trees = [], []
    for epi in (True, False):
        cfg = VideoCfg(packed_stem_epilogue=epi)
        stem = Stem(8, 5, cfg)
        v = stem.init(jax.random.PRNGKey(1), x, True)
        # nonzero running stats so the affine actually does something
        stats = jax.tree.map(
            lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype),
            v["batch_stats"],
        )
        outs.append(stem.apply({**v, "batch_stats": stats}, x, False))
        trees.append(jax.tree_util.tree_structure(v))
    assert trees[0] == trees[1]
    assert outs[0].shape == outs[1].shape == (2, 8, 8, 8, 8)
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_stem_packed_epilogue_odd_t_falls_back():
    """Geometry the (4,2,2) packing can't take (t % 4 != 0) must route to
    the plain chain and still work."""
    import jax
    import jax.numpy as jnp

    from vidsitu_tpu.models.video_backbone import Stem, VideoCfg

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 32, 3), jnp.float32)
    stem = Stem(8, 5, VideoCfg(packed_stem_epilogue=True))
    v = stem.init(jax.random.PRNGKey(1), x, True)
    y = stem.apply(v, x, False)
    assert y.shape == (1, 2, 8, 8, 8)


def test_packed_stem_conv_gradients_match():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from vidsitu_tpu.models.video_backbone import _PackedStemConv

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 16, 16, 3))
    packed = _PackedStemConv(8, (3, 7, 7), g=4)
    v = packed.init(jax.random.PRNGKey(3), x)
    gp = jax.grad(lambda k: (packed.apply({"params": {"kernel": k}}, x) ** 2).sum())(
        v["params"]["kernel"]
    )
    ref = nn.Conv(8, kernel_size=(3, 7, 7), strides=(1, 2, 2),
                  padding=((1, 1), (3, 3), (3, 3)), use_bias=False)
    gr = jax.grad(lambda k: (ref.apply({"params": {"kernel": k}}, x) ** 2).sum())(
        v["params"]["kernel"]
    )
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_lstm_left_pad_equivalence():
    """Fairseq-convention LEFT-padded tokens (reference default,
    lang_utils.py:22) produce the same encoding as right-padded ones —
    the leading-pad shift mirrors utils.convert_padding_direction."""
    enc = LSTMEncoder(vocab_size=30, embed_dim=8, hidden_dim=8,
                      bidirectional=True, num_layers=2, pad_id=0)
    right = jnp.array([[5, 6, 7, 0, 0], [8, 9, 0, 0, 0]], jnp.int32)
    left = jnp.array([[0, 0, 5, 6, 7], [0, 0, 0, 8, 9]], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), right)
    out_r = enc.apply(variables, right)
    out_l = enc.apply(variables, left)
    np.testing.assert_allclose(
        np.asarray(out_l["outputs"]), np.asarray(out_r["outputs"]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out_l["final"]), np.asarray(out_r["final"]),
        rtol=1e-6, atol=1e-7,
    )


def test_lstm_dropout_training_mode():
    """dropout_in/dropout_out (reference defaults 0.1,
    lang_utils.py:19-20) are active only with deterministic=False."""
    enc = LSTMEncoder(vocab_size=30, embed_dim=8, hidden_dim=8,
                      num_layers=2, pad_id=0)
    toks = jnp.array([[5, 6, 7, 8, 9]], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), toks)
    out_eval = enc.apply(variables, toks)
    out_eval2 = enc.apply(variables, toks, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(out_eval["outputs"]), np.asarray(out_eval2["outputs"])
    )
    out_tr = enc.apply(variables, toks, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(
        np.asarray(out_tr["outputs"]), np.asarray(out_eval["outputs"])
    )


def test_build_comm_unknown_task_raises(tmp_path):
    """An unknown task_type fails at setup (reference raises
    NotImplementedError in dat_loader), not at the first dct_id read."""
    from vidsitu_tpu.data import build_comm
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    paths = make_synth_dataset(tmp_path / "d", n_train=2, n_valid=2, seed=3)
    cfg = get_cfg_with_overrides("commtest", **{**paths, "task_type": "vb"})
    cfg.task_type = "vbarg"  # typo'd value
    with pytest.raises(NotImplementedError, match="vbarg"):
        build_comm(cfg)


def test_prep_dwn_vids_webm_fallback(tmp_path, monkeypatch, capsys):
    """Failed downloads get a second pass with format=webm, like the
    reference (dwn_yt.py:197-202)."""
    import json
    from pathlib import Path

    import vidsitu_tpu.prep as prep

    calls = []

    def fake_download(seg, out_dir, fmt="22/best", retries=3, **kw):
        calls.append((seg, fmt))
        if seg == "v_bad_seg_0_10" and fmt != "webm":
            return None
        return Path(f"/fake/{seg}.mp4")

    monkeypatch.setattr(prep, "download_clip", fake_download)
    split = tmp_path / "segs.json"
    split.write_text(json.dumps(["v_ok_seg_0_10", "v_bad_seg_0_10"]))
    prep.main([
        "--task_type=dwn_vids", f"--split_file={split}",
        f"--video_dir={tmp_path}", "--max_workers=1",
    ])
    assert ("v_bad_seg_0_10", "webm") in calls
    assert ("v_ok_seg_0_10", "webm") not in calls
    assert "downloaded 2/2" in capsys.readouterr().out


def test_prep_setup_yaml_surface(tmp_path, monkeypatch, capsys):
    """The reference's setup-YAML surface (dwn_yt.py:285): defaults come
    from a vsitu_setup_cfg.yml with the REFERENCE key names
    (video_trimmed_dir / max_processes / split_dir / retry_count), the
    split list is the union of split_dir's *.json files, and explicit
    flags still override the YAML."""
    import json
    from pathlib import Path

    import vidsitu_tpu.prep as prep

    split_dir = tmp_path / "split_files"
    split_dir.mkdir()
    (split_dir / "a_split.json").write_text(
        json.dumps(["v_a_seg_0_10", "v_b_seg_0_10"])
    )
    (split_dir / "b_split.json").write_text(
        json.dumps(["v_b_seg_0_10", "v_c_seg_0_10"])
    )
    setup = tmp_path / "setup.yml"
    setup.write_text(
        f"video_trimmed_dir: '{tmp_path / 'vids'}'\n"
        f"split_dir: '{split_dir}'\n"
        "max_processes: 1\n"
        "retry_count: 7\n"
    )

    seen = []

    def fake_download(seg, out_dir, fmt="22/best", retries=3, **kw):
        seen.append((seg, str(out_dir), retries))
        return Path(f"/fake/{seg}.mp4")

    monkeypatch.setattr(prep, "download_clip", fake_download)
    prep.main(["--task_type=dwn_vids", f"--setup_cfg={setup}"])
    assert sorted(s for s, _, _ in seen) == [
        "v_a_seg_0_10", "v_b_seg_0_10", "v_c_seg_0_10"
    ]
    assert all(d == str(tmp_path / "vids") for _, d, _ in seen)
    assert all(r == 7 for _, _, r in seen)
    assert "downloaded 3/3" in capsys.readouterr().out

    # explicit flag overrides the YAML
    seen.clear()
    prep.main([
        "--task_type=dwn_vids", f"--setup_cfg={setup}",
        f"--video_dir={tmp_path / 'other'}",
    ])
    assert all(d == str(tmp_path / "other") for _, d, _ in seen)

    # the packaged default YAML parses
    from vidsitu_tpu.prep import _SETUP_CFG, _load_setup_cfg
    assert _SETUP_CFG.exists()
    mapped = _load_setup_cfg(_SETUP_CFG)
    assert mapped["max_workers"] == 30
    assert mapped["video_dir"] == "./data/vsitu_video_trimmed_dir"


def test_default_feats_dir_per_model(tmp_path):
    """Features default under vsitu_frm_feats/{mdl_name} (reference
    feat_extractor.py:86), so two backbones never clobber each other."""
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.extract import default_feats_dir
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    paths = make_synth_dataset(tmp_path / "d", n_train=2, n_valid=2, seed=4)
    cfg = get_cfg_with_overrides(
        "featdir", **{**paths, "task_type": "vb",
                      "ds.vsitu.vsitu_frm_feats": str(tmp_path / "feats")}
    )
    d = default_feats_dir(cfg)
    assert d == tmp_path / "feats" / cfg.mdl.sf_mdl_name
    assert default_feats_dir(cfg, "other") == tmp_path / "feats" / "other"
