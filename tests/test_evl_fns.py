"""End-to-end scoring-contract tests on a synthetic dataset.

Fabricates predictions in the exact leaderboard pickle formats
(reference docs/README.md) and scores them through our evl_fns port.
"""

import pickle

import numpy as np
import pytest

from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evl_fns import (
    EvalFnCap,
    EvlFn_EvRel,
    EvlFn_Vb,
    arg_mapper,
    read_gt_file,
)
from vidsitu_tpu.utils.config import get_cfg_with_overrides
from vidsitu_tpu.utils.io import read_file_with_assertion, write_pickle


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    paths = make_synth_dataset(root, n_train=6, n_valid=5, n_test=3, seed=3)
    cfg = get_cfg_with_overrides("evltest", **paths)
    return cfg, root


def test_arg_mapper():
    assert arg_mapper("Arg0") == "Arg0"
    assert arg_mapper("Scene of the Event") == "AScn"
    assert arg_mapper("ArgM (direction)") == "ADir"
    assert arg_mapper("ArgM (location)") == "ALoc"
    assert arg_mapper("ArgM (manner)") == "AMnr"
    assert arg_mapper("ArgM (purpose)") == "APrp"
    assert arg_mapper("ArgM (goal)") == "AGol"
    with pytest.raises(AssertionError):
        arg_mapper("Bogus")


def test_vb_scoring_perfect_and_random(synth, tmp_path):
    cfg, _ = synth
    gt = read_gt_file(cfg, "vb", "valid")
    vseg_lst = gt["vseg_lst"]
    vinfo = gt["vsitu_vinfo_dct"]

    preds = []
    for ix, seg in enumerate(vseg_lst):
        vb_lsts = vinfo[seg]["vb_id_lst_eval"]
        preds.append(
            {
                "pred_vbs_ev": [vb[:5] for vb in vb_lsts],
                "pred_scores_ev": [[0.9, 0.8, 0.7, 0.6, 0.5]] * 5,
                "ann_idx": ix,
            }
        )
    pf = tmp_path / "vb_perfect.pkl"
    write_pickle(preds, pf)
    out = EvlFn_Vb(cfg, {}, ["acc"]).simple_acc(str(pf), split_type="valid")
    assert out["Per_Ev_Top_1"] == 1.0
    assert out["Per_Ev_Top_5"] == 1.0
    assert out["Per_Vid_Top_1"] == 1.0
    assert out["recall_macro_1_th_0"] > 0

    # garbage predictions -> 0
    for p in preds:
        p["pred_vbs_ev"] = [["zzz.99"] * 5 for _ in range(5)]
    pf2 = tmp_path / "vb_bad.pkl"
    write_pickle(preds, pf2)
    out2 = EvlFn_Vb(cfg, {}, ["acc"]).simple_acc(str(pf2), split_type="valid")
    assert out2["Per_Ev_Top_1"] == 0.0
    assert out2["Per_Ev_Top_5"] == 0.0


def test_vb_missing_prediction_asserts(synth, tmp_path):
    cfg, _ = synth
    pf = tmp_path / "vb_missing.pkl"
    write_pickle([], pf)
    with pytest.raises(AssertionError, match="Missing"):
        EvlFn_Vb(cfg, {}, ["acc"]).simple_acc(str(pf), split_type="valid")


def test_evrel_scoring(synth, tmp_path):
    cfg, _ = synth
    gt = read_gt_file(cfg, "evrel", "valid")
    vseg_lst = gt["vseg_lst"]
    ann_dct = gt["vsitu_ann_dct"]

    preds = []
    for ix, seg in enumerate(vseg_lst):
        anns = ann_dct[seg][:3]
        # predict each annotator's own label -> perfect on agreement subset
        pred_rows = []
        for ev in [1, 2, 4, 5]:
            pred_rows.append([a[f"Ev{ev}"]["EvRel"] for a in anns])
        preds.append(
            {
                "pred_evrels_ev": pred_rows,
                "pred_scores_ev": [[0.9] * 3] * 4,
                "ann_idx": ix,
            }
        )
    pf = tmp_path / "evrel_perfect.pkl"
    write_pickle(preds, pf)
    out = EvlFn_EvRel(cfg, {}, ["Top_1"]).simple_acc_evrel(
        str(pf), split_type="valid"
    )
    assert out["Top_1"] == 1.0
    assert out["Macro_Top_1"] == 1.0
    assert out["Len"] > 0

    for p in preds:
        p["pred_evrels_ev"] = [["__NONE__"] * 3 for _ in range(4)]
    pf2 = tmp_path / "evrel_bad.pkl"
    write_pickle(preds, pf2)
    out2 = EvlFn_EvRel(cfg, {}, ["Top_1"]).simple_acc_evrel(
        str(pf2), split_type="valid"
    )
    assert out2["Top_1"] == 0.0


def _build_srl_preds_from_gt(cfg, noise=False):
    """Predictions replicating the first (post-permutation) GT annotator."""
    evl = EvalFnCap(cfg, None, met_keys=["cider", "bleu", "rouge"])
    evl.read_gt_file("valid")
    preds = []
    for ann_idx in sorted(evl.gts_dct.keys()):
        gt_anns = [y for yix, y in enumerate(evl.gts_dct[ann_idx]) if yix != 3][:3]
        first = gt_anns[0]
        vb_out = {}
        for ev in range(1, 6):
            ev_i = f"Ev{ev}"
            dct = {"vb_id": first[ev_i]["VerbID"]}
            for ag, txt in first[ev_i]["Args"].items():
                agn = arg_mapper(ag)
                if agn in evl.args_used:
                    dct[agn] = txt if not noise else "purple nonsense tokens"
            vb_out[ev_i] = dct
        preds.append({"ann_idx": ann_idx, "vb_output": vb_out})
    return preds


def test_srl_scoring_contract(synth, tmp_path):
    cfg, _ = synth
    preds = _build_srl_preds_from_gt(cfg)
    pf = tmp_path / "srl_good.pkl"
    write_pickle(preds, pf)
    evl = EvalFnCap(cfg, None, met_keys=["cider", "bleu", "rouge"])
    out = evl.eval_cap_mets(str(pf), split_type="valid")

    # hypo == ref[0]: rouge (max over refs) must be exactly 1
    assert out["rouge"] == pytest.approx(1.0)
    assert out["bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert 0 < out["cider"] <= 10.0
    # macros and coref present
    assert "MacroVb_cider" in out and "MacroArg_cider" in out
    for cm in ["mentions", "muc", "bcub", "ceafe", "lea", "lea_soft"]:
        assert 0 <= out[cm] <= 1.0, cm
    assert out["mentions"] > 0.5
    # per-arg breakdown keys like 'Arg0_cider'
    assert any(k.startswith("Arg0_") for k in out)

    # noise predictions score strictly lower
    preds_bad = _build_srl_preds_from_gt(cfg, noise=True)
    pf2 = tmp_path / "srl_bad.pkl"
    write_pickle(preds_bad, pf2)
    out2 = EvalFnCap(cfg, None, met_keys=["cider", "bleu", "rouge"]).eval_cap_mets(
        str(pf2), split_type="valid"
    )
    assert out2["cider"] < out["cider"]
    assert out2["rouge"] < out["rouge"]


def test_srl_empty_hypos_zero(synth, tmp_path):
    cfg, _ = synth
    evl = EvalFnCap(cfg, None, met_keys=["cider", "bleu", "rouge"])
    evl.read_gt_file("valid")
    preds = [
        {"ann_idx": ix, "vb_output": {}} for ix in sorted(evl.gts_dct.keys())
    ]
    pf = tmp_path / "srl_empty.pkl"
    write_pickle(preds, pf)
    out = evl.eval_cap_mets(str(pf), split_type="valid")
    assert out["cider"] == pytest.approx(0.0, abs=1e-9)
    assert out["rouge"] == pytest.approx(0.0, abs=1e-9)


def test_golden_prediction_formats_load():
    """Our format expectations match the published example pickles."""
    import pathlib

    docs = pathlib.Path("/root/reference/docs")
    if not docs.exists():
        pytest.skip("reference docs not available")
    vb = pickle.load(open(docs / "vb_eg.pkl", "rb"))
    assert set(vb[0].keys()) == {"pred_vbs_ev", "pred_scores_ev", "ann_idx"}
    assert len(vb[0]["pred_vbs_ev"]) == 5
    assert len(vb[0]["pred_vbs_ev"][0]) == 5
    vbarg = pickle.load(open(docs / "vbarg_eg.pkl", "rb"))
    assert set(vbarg[0].keys()) == {"ann_idx", "vb_output"}
    assert set(vbarg[0]["vb_output"].keys()) == {f"Ev{i}" for i in range(1, 6)}
    evrel = pickle.load(open(docs / "evrel_eg.pkl", "rb"))
    assert set(evrel[0].keys()) == {"pred_evrels_ev", "pred_scores_ev", "ann_idx"}
    assert len(evrel[0]["pred_evrels_ev"]) == 4
