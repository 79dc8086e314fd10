"""Leaderboard CLI on the three TEST splits, end-to-end via subprocess.

The reference's offline scorer routes test splits through
``get_fname_key`` (evl_fns.py:709-761: test_verb / test_srl /
test_evrel). These tests drive OUR CLI (python -m
vidsitu_tpu.evaluation.evl_fns) exactly as a leaderboard user would:
prediction pickle + test-split GT paths on the command line, results
JSON written to --out_file.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evl_fns import (
    EvalFnCap,
    arg_mapper,
    read_gt_file,
)
from vidsitu_tpu.utils.config import get_cfg_with_overrides
from vidsitu_tpu.utils.io import write_pickle

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("clisplits")
    paths = make_synth_dataset(root, n_train=4, n_valid=4, n_test=5, seed=23)
    cfg = get_cfg_with_overrides("clisplit", **paths)
    return cfg, paths, root


def _run_cli(pred_file, task_type, paths, split_type, out_file):
    fname_key = split_type
    args = [
        sys.executable, "-m", "vidsitu_tpu.evaluation.evl_fns",
        f"--pred_file={pred_file}",
        f"--task_type={task_type}",
        f"--split_file_path={paths[f'ds.vsitu.split_files_lb.{fname_key}']}",
        f"--vinfo_file_path={paths[f'ds.vsitu.vinfo_files_lb.{fname_key}']}",
        "--vsitu_ann_file_path="
        + paths[f"ds.vsitu.vsitu_ann_files_lb.{fname_key}"],
        f"--split_type={split_type}",
        f"--out_file={out_file}",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=str(REPO) + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    proc = subprocess.run(
        args, capture_output=True, text=True, cwd=REPO, env=env, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert Path(out_file).exists(), "results file not written"
    return json.loads(Path(out_file).read_text()), proc.stdout


def test_cli_scores_test_verb_split(synth, tmp_path):
    cfg, paths, _ = synth
    gt = read_gt_file(cfg, "vb", "test_verb")
    preds = []
    for ix, seg in enumerate(gt["vseg_lst"]):
        vb_lsts = gt["vsitu_vinfo_dct"][seg]["vb_id_lst_eval"]
        preds.append({
            "pred_vbs_ev": [vb[:5] for vb in vb_lsts],
            "pred_scores_ev": [[0.9, 0.8, 0.7, 0.6, 0.5]] * 5,
            "ann_idx": ix,
        })
    pf = tmp_path / "test_verb_preds.pkl"
    write_pickle(preds, pf)
    out, stdout = _run_cli(
        pf, "vb", paths, "test_verb", tmp_path / "res_vb.json"
    )
    assert out["Per_Ev_Top_1"] == 1.0 and out["Per_Ev_Top_5"] == 1.0
    assert "Per_Ev_Top_1" in stdout  # CLI prints the metric table


def test_cli_scores_test_srl_split(synth, tmp_path):
    cfg, paths, _ = synth
    evl = EvalFnCap(cfg, None, met_keys=["cider", "bleu", "rouge"])
    evl.read_gt_file("test_srl")
    preds = []
    for ann_idx in sorted(evl.gts_dct.keys()):
        first = [y for yix, y in enumerate(evl.gts_dct[ann_idx])
                 if yix != 3][0]
        vb_out = {}
        for ev in range(1, 6):
            dct = {"vb_id": first[f"Ev{ev}"]["VerbID"]}
            for ag, txt in first[f"Ev{ev}"]["Args"].items():
                agn = arg_mapper(ag)
                if agn in evl.args_used:
                    dct[agn] = txt
            vb_out[f"Ev{ev}"] = dct
        preds.append({"ann_idx": ann_idx, "vb_output": vb_out})
    pf = tmp_path / "test_srl_preds.pkl"
    write_pickle(preds, pf)
    out, _ = _run_cli(
        pf, "vb_arg", paths, "test_srl", tmp_path / "res_srl.json"
    )
    assert out["rouge"] == pytest.approx(1.0)
    assert 0 < out["cider"] <= 10.0
    for cm in ("lea", "lea_soft", "MacroVb_cider", "MacroArg_cider"):
        assert cm in out, cm


def test_cli_scores_test_evrel_split(synth, tmp_path):
    cfg, paths, _ = synth
    gt = read_gt_file(cfg, "evrel", "test_evrel")
    preds = []
    for ix, seg in enumerate(gt["vseg_lst"]):
        anns = gt["vsitu_ann_dct"][seg][:3]
        pred_rows = [
            [a[f"Ev{ev}"]["EvRel"] for a in anns] for ev in (1, 2, 4, 5)
        ]
        preds.append({
            "pred_evrels_ev": pred_rows,
            "pred_scores_ev": [[0.9] * 3] * 4,
            "ann_idx": ix,
        })
    pf = tmp_path / "test_evrel_preds.pkl"
    write_pickle(preds, pf)
    out, _ = _run_cli(
        pf, "evrel", paths, "test_evrel", tmp_path / "res_evrel.json"
    )
    assert out["Top_1"] == 1.0 and out["Macro_Top_1"] == 1.0
