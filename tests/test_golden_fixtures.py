"""Golden-fixture contract tests against the reference's example pickles.

/root/reference/docs/{vb_eg,vbarg_eg,evrel_eg}.pkl are sample prediction
files in the exact leaderboard format (reference docs/README.md). Two
contracts are asserted here:

1. The reference pickles load and score through our evl_fns entry point
   unmodified (GT is synthetic — scores are meaningless, but every prep/
   parse/metric path must run and emit the full metric-key set).
2. Our evaluators' decode_batch output matches the golden schema
   key-for-key and type-for-type.
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

from vidsitu_tpu.data.comm import build_comm
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evl_fns import evaluate_predictions
from vidsitu_tpu.utils.config import get_cfg_with_overrides

GOLDEN = Path("/root/reference/docs")

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "vb_eg.pkl").exists(), reason="reference fixtures absent"
)


@pytest.fixture(scope="module")
def synth30(tmp_path_factory):
    # golden pickles carry ann_idx 0..29 — fabricate a 30-video valid split
    root = tmp_path_factory.mktemp("golden_gt")
    paths = make_synth_dataset(root, n_train=4, n_valid=30, seed=11)
    cfg = get_cfg_with_overrides("golden", **paths)
    return cfg, paths, root


def _score_golden(cfg, paths, root, task_type, pred_name):
    return evaluate_predictions(
        pred_file=str(GOLDEN / pred_name),
        task_type=task_type,
        split_file_path=paths["ds.vsitu.split_files_lb.valid"],
        vinfo_file_path=paths["ds.vsitu.vinfo_files_lb.valid"],
        vsitu_ann_file_path=paths["ds.vsitu.vsitu_ann_files_lb.valid"],
        split_type="valid",
        out_file=str(root / f"res_{task_type}.json"),
    )


def test_golden_vb_scores_through_evl_fns(synth30):
    cfg, paths, root = synth30
    out = _score_golden(cfg, paths, root, "vb", "vb_eg.pkl")
    for k in ("Per_Ev_Top_1", "Per_Ev_Top_5", "recall_macro_1_th_9"):
        assert k in out and np.isfinite(out[k]), (k, out)


def test_golden_vbarg_scores_through_evl_fns(synth30):
    cfg, paths, root = synth30
    out = _score_golden(cfg, paths, root, "vb_arg", "vbarg_eg.pkl")
    for k in ("cider", "rouge", "lea", "MacroVb_cider", "MacroArg_cider"):
        assert k in out and np.isfinite(out[k]), (k, out)


def test_golden_evrel_scores_through_evl_fns(synth30):
    cfg, paths, root = synth30
    out = _score_golden(cfg, paths, root, "evrel", "evrel_eg.pkl")
    for k in ("Top_1", "Macro_Top_1"):
        assert k in out and np.isfinite(out[k]), (k, out)


# ---------------------------------------------------------------------------
# schema parity: our decode_batch output vs the golden pickles
# ---------------------------------------------------------------------------


def test_vb_pred_schema_matches_golden(synth30):
    cfg, paths, _ = synth30
    comm = build_comm(cfg)
    from vidsitu_tpu.evaluation.evaluators import EvalB

    golden = pickle.load(open(GOLDEN / "vb_eg.pkl", "rb"))[0]
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, len(comm.vb_id_vocab.symbols)))
    # construct without running model-side __init__ machinery
    ev = EvalB.__new__(EvalB)
    ev.comm = comm
    ours = EvalB.decode_batch(ev, logits, np.arange(2))[0]

    assert set(ours.keys()) == set(golden.keys())
    assert isinstance(ours["ann_idx"], type(golden["ann_idx"]))
    for key in ("pred_vbs_ev", "pred_scores_ev"):
        assert len(ours[key]) == len(golden[key]) == 5
        assert len(ours[key][0]) == len(golden[key][0]) == 5
        assert isinstance(ours[key][0][0], type(golden[key][0][0]))


def test_evrel_pred_schema_matches_golden(synth30):
    cfg, paths, _ = synth30
    comm = build_comm(cfg)
    from vidsitu_tpu.evaluation.evaluators import EvalB_Acc

    golden_lst = pickle.load(open(GOLDEN / "evrel_eg.pkl", "rb"))
    golden = golden_lst[0]
    n_ann = len(golden["pred_evrels_ev"][0])
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, n_ann, 5))
    ev = EvalB_Acc.__new__(EvalB_Acc)
    ev.comm = comm
    ours = EvalB_Acc.decode_batch(ev, logits, np.arange(2))[0]

    assert set(ours.keys()) == set(golden.keys())
    assert len(ours["pred_evrels_ev"]) == len(golden["pred_evrels_ev"]) == 4
    assert isinstance(
        ours["pred_evrels_ev"][0][0], type(golden["pred_evrels_ev"][0][0])
    )
    # label-name contract: every relation string the reference emits must be
    # one of ours
    our_labels = set(comm.evrel_dct_opp.values()) | {
        comm.evrel_dct_opp[k] for k in comm.evrel_dct_opp
    }
    golden_labels = {
        s for p in golden_lst for row in p["pred_evrels_ev"] for s in row
    }
    assert golden_labels <= our_labels, golden_labels - our_labels


def test_vbarg_pred_schema_matches_golden(synth30):
    cfg, paths, _ = synth30
    comm = build_comm(cfg)
    from vidsitu_tpu.evaluation.evaluators import EvalB_Gen

    golden_lst = pickle.load(open(GOLDEN / "vbarg_eg.pkl", "rb"))
    golden = golden_lst[0]
    ev = EvalB_Gen.__new__(EvalB_Gen)
    ev.comm = comm
    tok = comm.gpt2_hf_tok
    # fabricate decoded sequences: "<vb> <ArgX> words ..." per event
    vb = comm.vb_id_vocab.symbols[5]
    ag_start = list(comm.ag_name_dct.ag_dct_start.values())[0]
    text = f"{vb} {ag_start} hello world"
    ids = tok.encode(text)
    L = 60
    seq = np.full((1, 5, 1, L), tok.pad_token_id, dtype=np.int64)
    seq[0, :, 0, : len(ids)] = ids
    ours = EvalB_Gen.decode_batch(ev, seq, np.array([0]))[0]

    assert set(ours.keys()) == set(golden.keys()) == {"ann_idx", "vb_output"}
    assert isinstance(ours["ann_idx"], type(golden["ann_idx"]))
    assert set(ours["vb_output"].keys()) == set(golden["vb_output"].keys())
    for evk, dct in golden["vb_output"].items():
        assert "vb_id" in dct and isinstance(dct["vb_id"], str)
        # every arg key the reference emits must be a key our parser can emit
        our_args = set(comm.ag_name_dct.ag_dct_main.values()) | {"vb_id"}
        assert set(dct.keys()) <= our_args, (evk, set(dct.keys()) - our_args)
    for evk, dct in ours["vb_output"].items():
        assert isinstance(dct.get("vb_id", ""), str)


# ---------------------------------------------------------------------------
# leaderboard test-split scoring (get_fname_key paths, reference CLI contract)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synth_test30(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden_test_gt")
    paths = make_synth_dataset(
        root, n_train=4, n_valid=4, n_test=30, seed=12
    )
    return paths, root


@pytest.mark.parametrize(
    "task,pred,split,keys",
    [
        ("vb", "vb_eg.pkl", "test_verb", ("Per_Ev_Top_1",)),
        ("vb_arg", "vbarg_eg.pkl", "test_srl", ("cider", "lea")),
        ("evrel", "evrel_eg.pkl", "test_evrel", ("Top_1",)),
    ],
)
def test_golden_scores_on_test_splits(synth_test30, task, pred, split, keys):
    """The offline CLI scores leaderboard test splits via get_fname_key
    (reference evl_fns.py main)."""
    paths, root = synth_test30
    out = evaluate_predictions(
        pred_file=str(GOLDEN / pred),
        task_type=task,
        split_file_path=paths[f"ds.vsitu.split_files_lb.{split}"],
        vinfo_file_path=paths[f"ds.vsitu.vinfo_files_lb.{split}"],
        vsitu_ann_file_path=paths[f"ds.vsitu.vsitu_ann_files_lb.{split}"],
        split_type=split,
        out_file=str(root / f"res_{task}.json"),
    )
    for k in keys:
        assert k in out and np.isfinite(out[k]), (k, out)


# ---------------------------------------------------------------------------
# pinned regression scores
# ---------------------------------------------------------------------------

# Exact scores of the golden prediction pickles against the seed-11
# synthetic GT. The GT is synthetic so the VALUES are meaningless as
# quality numbers — but they are fully deterministic (synth seed 11,
# the fixed np.random.seed(5) GT permutation, the golden pkls), so they
# pin the ENTIRE scoring stack numerically: any change to CIDEr idf,
# BLEU smoothing, ROUGE beta, coref counting, macro grouping, or the
# pkl prep path flips them even while the friendly hand-case tests
# still pass. If a deliberate fixture/generator change invalidates
# them, recompute with the script in the test docstring.
PINNED_VB = {
    "Per_Ev_Top_1": 0.466666666667,
    "Per_Ev_Top_5": 0.94,
    "Per_Vid_Top_1": 0.033333333333,
    "recall_macro_1_th_9": 0.276199494949,
}
PINNED_VBARG = {
    "cider": 0.181973403076,
    "bleu_1": 0.275795875836,
    "bleu_4": 0.069041129552,
    "rouge": 0.268465888896,
    "mentions": 0.709766162311,
    "muc": 0.161747464767,
    "bcub": 0.52453316864,
    "ceafe": 0.350501538308,
    "lea": 0.188005965862,
    "lea_soft": 0.089756150358,
    "MacroVb_cider": 0.193158406737,
    "MacroArg_cider": 0.09702602629,
    "Arg0_cider": 0.257351174578,
    "AScn_rouge": 0.363328569484,
}
PINNED_EVREL = {"Top_1": 0.220125786164, "Macro_Top_1": 0.231097027972,
                "Len": 159.0}


@pytest.mark.parametrize(
    "task,pred,pins",
    [
        ("vb", "vb_eg.pkl", PINNED_VB),
        ("vb_arg", "vbarg_eg.pkl", PINNED_VBARG),
        ("evrel", "evrel_eg.pkl", PINNED_EVREL),
    ],
)
def test_golden_scores_pinned(synth30, task, pred, pins):
    """Numeric regression pins for the whole metric stack (see comment
    above; recompute by running evaluate_predictions on the golden pkls
    against make_synth_dataset(seed=11, n_valid=30))."""
    cfg, paths, root = synth30
    out = _score_golden(cfg, paths, root, task, pred)
    for k, v in pins.items():
        np.testing.assert_allclose(
            float(out[k]), v, rtol=0, atol=1e-9,
            err_msg=f"{task}:{k} drifted — metric stack changed",
        )
