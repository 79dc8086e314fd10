"""EXPTS.md drift guard: every `python main.py ...` row in the document
must still parse, build its data pipeline, and initialize its model.

The reference's EXPTS.md is the experiment contract users replay; ours
(repo-root EXPTS.md) maps each row 1:1 onto our CLI. This test parses
the ACTUAL document (not a copy of its commands) so a rename of a
model/task/key or a stale feature-dir path in the doc fails CI instead
of failing a user.

Tiny dims + synthetic data keep each row to seconds; the kpret row's
caffe2 checkpoint is fabricated with the converter round-trip helper
(tests/test_caffe2_converter._flax_to_caffe2_name).
"""

import pickle
import re
from pathlib import Path

import numpy as np
import pytest

from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.models.selector import build_model, init_model_variables
from vidsitu_tpu.utils.config import get_cfg_with_overrides

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

TINY_VID = {
    "vid_mdl.resnet.depth": 26,
    "vid_mdl.crop_size": 32,
    "vid_mdl.num_frames": 4,
    "vid_mdl.sampling_rate": 2,
}
TINY_TX = {
    "tx_dec.decoder_embed_dim": 32,
    "tx_dec.decoder_ffn_embed_dim": 64,
    "tx_dec.decoder_layers": 1,
    "tx_dec.decoder_attention_heads": 2,
    "tx_dec.encoder_embed_dim": 32,
    "tx_dec.encoder_ffn_embed_dim": 64,
    "tx_dec.encoder_layers": 1,
    "tx_dec.encoder_attention_heads": 2,
}
TINY_GPT2 = {
    "gpt2_mdl.d_model": 64,
    "gpt2_mdl.n_layers": 1,
    "gpt2_mdl.n_heads": 4,
    "gpt2_mdl.max_pos": 128,
}
TINY_ROB = {
    "rob_mdl.d_model": 64,
    "rob_mdl.n_layers": 2,
    "rob_mdl.n_heads": 4,
    "rob_mdl.ffn_dim": 128,
    "rob_mdl.max_pos": 130,
}


def _parse_expts_commands():
    """Collect every `python main.py <uid> --k=v ...` command (handling
    trailing-backslash continuations) from the repo-root EXPTS.md."""
    text = (REPO / "EXPTS.md").read_text()
    # join continuation lines
    text = re.sub(r"\\\n\s*", " ", text)
    cmds = []
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("python main.py "):
            continue
        toks = line.split()[2:]
        if "..." in toks:
            continue  # illustrative snippet (e.g. the frame-cache recipe)
        uid = toks[0]
        overrides = {}
        for t in toks[1:]:
            assert t.startswith("--") and "=" in t, f"{line!r}: bad token {t}"
            k, v = t[2:].split("=", 1)
            overrides[k] = v
        cmds.append((uid, overrides))
    assert len(cmds) >= 15, f"EXPTS.md parse found only {len(cmds)} commands"
    return cmds


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("expts")
    paths = make_synth_dataset(
        root, n_train=8, n_valid=4, seed=71, with_frames=True
    )
    # EXPTS rows point at slow_fast / i3d feature dirs; fabricate both
    # (get_head_dim keys the feature dim off the directory NAME)
    segs = []
    for fp in (root / "vidsitu_annotations" / "split_files").glob("*.json"):
        import json

        segs += json.loads(fp.read_text())
    rng = np.random.default_rng(0)
    for name, dim in (("slow_fast_synth", 2304), ("i3d_synth_kpret", 2048)):
        d = root / "vsitu_vid_feats" / name
        d.mkdir(parents=True, exist_ok=True)
        for seg in segs:
            np.save(d / f"{seg}_feats.npy",
                    rng.standard_normal((5, dim)).astype(np.float32))
    return paths, root


def _fabricate_tiny_caffe2(env_, tmp_path) -> str:
    """Tiny dual-pathway caffe2 pickle matching TINY_VID's slowfast tree."""
    from tests.test_caffe2_converter import _flax_to_caffe2_name
    from tests.test_slowfast_converter import _flatten

    paths, root = env_
    cfg = get_cfg_with_overrides(
        "expts_fab",
        **{**paths, "task_type": "vb", "mdl.mdl_name": "sf_base",
           "mdl.sf_mdl_name": "slow_fast_nl_r50_8x8", **TINY_VID,
           "train.bs": 4, "train.nw": 0, "train.dtype": "float32"},
    )
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch, seed=1)
    flat = {**_flatten(variables["params"]["backbone"], ("backbone",)),
            **_flatten(variables["batch_stats"]["backbone"], ("backbone",))}
    blobs = {}
    for path, arr in flat.items():
        name, kind = _flax_to_caffe2_name(path)
        a = np.asarray(arr)
        if kind == "conv":
            a = np.transpose(a, (4, 3, 0, 1, 2))
        blobs[name] = a
    out = tmp_path / "kinetics_tiny.pkl"
    with open(out, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    return str(out)


def test_every_expts_row_builds(env, tmp_path):
    from vidsitu_tpu.train.pretrained import load_pretrained_variables

    paths, root = env
    cmds = _parse_expts_commands()
    ckpt = None
    for uid, over in cmds:
        task = over.get("task_type")
        assert task in ("vb", "vb_arg", "evrel"), (uid, over)
        tiny = dict(TINY_VID) if task == "vb" else (
            dict(TINY_TX) if task == "vb_arg" else dict(TINY_ROB)
        )
        if over.get("mdl.mdl_name") == "new_gpt2_only":
            tiny.update(TINY_GPT2)
        # remap doc paths onto the synthetic tree
        if "ds.vsitu.vsit_frm_feats_dir" in over:
            v = over["ds.vsitu.vsit_frm_feats_dir"]
            name = "slow_fast_synth" if "slow_fast" in v else "i3d_synth_kpret"
            over["ds.vsitu.vsit_frm_feats_dir"] = str(
                root / "vsitu_vid_feats" / name
            )
        if "mdl.sf_pretrained_path" in over:
            if ckpt is None:
                ckpt = _fabricate_tiny_caffe2(env, tmp_path)
            over["mdl.sf_pretrained_path"] = ckpt
        cfg = get_cfg_with_overrides(
            f"expts_{uid}",
            **{**paths, **tiny, **over,
               "train.bs": 4, "train.bsv": 4, "train.nw": 0, "train.nwv": 0,
               "train.dtype": "float32",
               "misc.tmp_path": str(tmp_path / "tmp")},
        )
        comm = build_comm(cfg)
        data = get_data(cfg)
        batch = next(iter(data.train_dl))
        model = build_model(cfg, comm)
        variables = init_model_variables(model, batch, seed=2)
        if cfg.mdl.load_sf_pretrained:
            variables = load_pretrained_variables(cfg, model, variables)
        assert variables["params"], uid
