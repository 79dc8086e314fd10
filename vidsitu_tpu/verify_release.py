"""One-command real-artifact readiness harness.

    python -m vidsitu_tpu.verify_release --dir=<vidsitu_release_root>

A user who downloads the actual VidSitu release (annotations + vocab
pickles, per scripts/data_setup.sh in the reference) plus the published
checkpoints can run this ONE command on day one and get, with precise
errors: does every artifact load, convert, and drive a 30-item
debug-mode epoch per task?

Validated consumption sites (reference):
  * pickled HF GPT-2 tokenizer   dat_loader.py:87-89
  * pickled fairseq Dictionary   dat_loader.py:81-83,204-213
  * split/ann/vinfo JSON schemas dat_loader.py:140-173
  * caffe2 / torch checkpoints   trn_utils.py:358-413
  * frames / feature dirs        dat_loader.py:454-511

Expected layout under --dir (the reference's ./data after setup):
  vidsitu_annotations/split_files/vseg_split_{train,valid,testvb,
      testsrl,testevrel}_lb.json
  vidsitu_annotations/vseg_ann_files/vsann_*_lb.json
  vidsitu_annotations/vinfo_files/vinfo_*_lb.json
  vsitu_vocab/verb_id_vocab.pkl
  vsitu_vocab/bpe_with_seps_vb_arg_vocab.pkl
  vsitu_frames/          (optional: enables the vb debug epoch)
  vsitu_vid_feats/<name>/ (optional: enables the sfpret debug epochs)

Optional artifacts:
  --caffe2_ckpt=...    SlowFast caffe2 .pkl  -> convert, strict key accounting
  --sfbase_ckpt=...    trained SFBase .pth   -> convert, strict key accounting
  --roberta_tok_dir=.. local HF RoBERTa tokenizer dir (the reference
                       downloads roberta-base from the hub at runtime;
                       offline users point at a local copy)
  --convert_out=...    where converted vocab dirs are written
                       (default: <dir>/converted_tpu)

Exit code = number of failed checks; every check prints one
``[ok]``/``[FAIL]``/``[skip]`` line.
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path
from typing import List, Optional, Tuple

SPLIT_KEYS = ("train", "valid", "test_verb", "test_srl", "test_evrel")
SPLIT_FNAME = {
    "train": "vseg_split_train_lb.json",
    "valid": "vseg_split_valid_lb.json",
    "test_verb": "vseg_split_testvb_lb.json",
    "test_srl": "vseg_split_testsrl_lb.json",
    "test_evrel": "vseg_split_testevrel_lb.json",
}
ANN_FNAME = {
    "train": "vsann_train_lb.json",
    "valid": "vsann_valid_lb.json",
    "test_verb": "vsann_testvb_lb.json",
    "test_srl": "vsann_testsrl_lb.json",
    "test_evrel": "vsann_testevrel_lb.json",
}
VINFO_FNAME = {
    "train": "vinfo_train_lb.json",
    "valid": "vinfo_valid_lb.json",
    "test_verb": "vinfo_testvb_lb.json",
    "test_srl": "vinfo_testsrl_lb.json",
    "test_evrel": "vinfo_testevrel_lb.json",
}


class Report:
    def __init__(self):
        self.failed: List[str] = []
        self.passed: List[str] = []
        self.skipped: List[str] = []

    def ok(self, name: str, detail: str = ""):
        self.passed.append(name)
        print(f"[ok]   {name}" + (f": {detail}" if detail else ""))

    def fail(self, name: str, detail: str):
        self.failed.append(name)
        print(f"[FAIL] {name}: {detail}")

    def skip(self, name: str, why: str):
        self.skipped.append(name)
        print(f"[skip] {name}: {why}")

    def run(self, name: str, fn) -> Optional[object]:
        """Run ``fn``; a return of ('skip', why) skips, an exception
        fails with the exception message, else passes with the returned
        detail string (or (detail, payload) tuple)."""
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001 - report everything precisely
            tb = traceback.format_exc(limit=2).strip().splitlines()[-1]
            self.fail(name, f"{type(e).__name__}: {e} ({tb})")
            return None
        if isinstance(out, tuple) and len(out) == 2 and out[0] == "skip":
            self.skip(name, out[1])
            return None
        if isinstance(out, tuple) and len(out) == 2:
            self.ok(name, out[0])
            return out[1]
        self.ok(name, out if isinstance(out, str) else "")
        return out if not isinstance(out, str) else True


# ---------------------------------------------------------------- annotations
def check_split(root: Path, split: str, rep: Report):
    sp = root / "vidsitu_annotations" / "split_files" / SPLIT_FNAME[split]
    ap = root / "vidsitu_annotations" / "vseg_ann_files" / ANN_FNAME[split]
    vp = root / "vidsitu_annotations" / "vinfo_files" / VINFO_FNAME[split]

    def _split():
        if not sp.exists():
            raise FileNotFoundError(sp)
        segs = json.loads(sp.read_text())
        if not isinstance(segs, list) or not segs:
            raise ValueError(f"{sp} must be a non-empty JSON list")
        bad = [s for s in segs[:5] if not isinstance(s, str)]
        if bad:
            raise ValueError(f"{sp}: segment names must be strings, got {bad[0]!r}")
        return f"{len(segs)} segments", segs

    segs = rep.run(f"split[{split}]", _split)
    if segs is None:
        return None

    def _ann():
        if not ap.exists():
            raise FileNotFoundError(ap)
        anns = json.loads(ap.read_text())
        if not isinstance(anns, list):
            raise ValueError(f"{ap} must be a JSON list")
        covered = set()
        for i, a in enumerate(anns):
            for ev in range(1, 6):
                k = f"Ev{ev}"
                if k not in a:
                    raise ValueError(f"{ap}[{i}] missing key {k!r}")
                if "vid_seg_int" not in a[k]:
                    raise ValueError(f"{ap}[{i}].{k} missing 'vid_seg_int'")
            covered.add(a["Ev1"]["vid_seg_int"])
        # train/valid items are fetched by split order and looked up in the
        # ann dict (dat_loader.py:358) — every split segment needs >=1 ann
        if split in ("train", "valid"):
            missing = [s for s in segs if s not in covered]
            if missing:
                raise ValueError(
                    f"{len(missing)} split segments have no annotation "
                    f"(first: {missing[0]!r})"
                )
        return f"{len(anns)} annotations, {len(covered)} segments covered"

    rep.run(f"ann[{split}]", _ann)

    if split != "train":

        def _vinfo():
            if not vp.exists():
                raise FileNotFoundError(vp)
            infos = json.loads(vp.read_text())
            seen = set()
            for i, v in enumerate(infos):
                if "vid_seg_int" not in v:
                    raise ValueError(f"{vp}[{i}] missing 'vid_seg_int'")
                if v["vid_seg_int"] in seen:
                    raise ValueError(
                        f"{vp}: duplicate vid_seg_int {v['vid_seg_int']!r}"
                    )
                seen.add(v["vid_seg_int"])
                vb = v.get("vbid_lst")
                if not vb:
                    raise ValueError(f"{vp}[{i}] missing 'vbid_lst'")
                for ev in range(1, 6):
                    lst = vb.get(f"Ev{ev}")
                    if lst is None or len(lst) < 9:
                        # the reader asserts >=9 annotators (dat_loader.py:91)
                        raise ValueError(
                            f"{vp}[{i}].vbid_lst.Ev{ev} needs >=9 verb "
                            f"annotations, got {0 if lst is None else len(lst)}"
                        )
            missing = [s for s in segs if s not in seen]
            if missing:
                raise ValueError(
                    f"{len(missing)} split segments missing vinfo "
                    f"(first: {missing[0]!r})"
                )
            return f"{len(infos)} vinfo entries, all >=9 annotators"

        rep.run(f"vinfo[{split}]", _vinfo)
    return segs


# ------------------------------------------------------------------- vocabs
def check_verb_vocab(root: Path, rep: Report, convert_out: Path):
    p = root / "vsitu_vocab" / "verb_id_vocab.pkl"

    def _load():
        from .tokenization.vocab import Vocabulary

        if not p.exists():
            raise FileNotFoundError(
                f"{p} (the pickled fairseq Dictionary, dat_loader.py:81-83)"
            )
        voc = Vocabulary.load(p)
        n = len(voc)
        if n < 10:
            raise ValueError(f"verb vocab suspiciously small: {n} symbols")
        for attr in ("pad_index", "unk_index", "eos_index", "indices"):
            if not hasattr(voc, attr):
                raise ValueError(f"verb vocab missing attribute {attr!r}")
        convert_out.mkdir(parents=True, exist_ok=True)
        out = convert_out / "verb_id_vocab.json"
        voc.save_json(out)
        rt = Vocabulary.load(out)
        if rt.symbols != voc.symbols or rt.indices != voc.indices:
            raise ValueError("converted verb vocab does not round-trip")
        return (
            f"{n} symbols, pad={voc.pad_index} unk={voc.unk_index}; "
            f"converted -> {out}",
            out,
        )

    return rep.run("verb_id_vocab.pkl", _load)


def check_gpt2_pickle(root: Path, rep: Report, convert_out: Path):
    p = root / "vsitu_vocab" / "bpe_with_seps_vb_arg_vocab.pkl"

    def _load():
        import pickle

        from .tokenization.import_hf import from_hf_tokenizer

        if not p.exists():
            raise FileNotFoundError(
                f"{p} (the pickled GPT2TokenizerFast, dat_loader.py:87-89)"
            )
        with open(p, "rb") as f:
            try:
                hf_tok = pickle.load(f)
            except ModuleNotFoundError as e:
                raise RuntimeError(
                    f"unpickling needs {e.name!r} importable — the file "
                    "is a pickled live HF tokenizer object; install/expose "
                    "the matching transformers version"
                ) from e
        ours = from_hf_tokenizer(hf_tok)
        # contract checks: the task specials the dataset layer relies on
        all_ids = dict(ours.get_added_vocab())
        if "<EV_SEP>" not in all_ids and "<EV_SEP>" not in hf_tok.get_added_vocab():
            raise ValueError("tokenizer lost the <EV_SEP> added token")
        probes = [
            "person jumps over the fence",
            "<EV_SEP> run <Arg0> a man </Arg0>",
            "unusual éè unicode bytes",
        ]
        for s in probes:
            ref_ids = hf_tok(s)["input_ids"]
            got = ours(s)["input_ids"]
            if list(ref_ids) != list(got):
                raise ValueError(
                    f"id mismatch on probe {s!r}: hf={ref_ids} ours={got}"
                )
        convert_out.mkdir(parents=True, exist_ok=True)
        out = convert_out / "bpe_with_seps_vb_arg_vocab"
        ours.save_dir(out)
        from .tokenization.tokenizer import BPETokenizer

        rt = BPETokenizer.from_dir(out)
        for s in probes:
            if rt(s)["input_ids"] != ours(s)["input_ids"]:
                raise ValueError("converted tokenizer dir does not round-trip")
        return (
            f"{len(ours)} ids, {len(hf_tok.get_added_vocab())} added tokens, "
            f"id-parity on probes; converted -> {out}",
            out,
        )

    return rep.run("bpe_with_seps_vb_arg_vocab.pkl", _load)


def check_roberta(tok_dir: Optional[str], rep: Report, convert_out: Path):
    def _load():
        if not tok_dir:
            return (
                "skip",
                "--roberta_tok_dir not given (the reference pulls "
                "roberta-base from the HF hub at runtime; offline runs "
                "need a local tokenizer dir)",
            )
        from transformers import RobertaTokenizerFast

        from .tokenization.import_hf import from_hf_tokenizer

        hf_tok = RobertaTokenizerFast.from_pretrained(tok_dir)
        ours = from_hf_tokenizer(hf_tok)
        probes = ["A man walks.", "pair one</s>pair two"]
        for s in probes:
            if list(hf_tok(s)["input_ids"]) != list(ours(s)["input_ids"]):
                raise ValueError(f"id mismatch on probe {s!r}")
        out = convert_out / "roberta_base_vocab"
        ours.save_dir(out)
        return f"id-parity on probes; converted -> {out}", out

    return rep.run("roberta tokenizer", _load)


# --------------------------------------------------------------- media dirs
def check_frames(root: Path, segs: List[str], rep: Report):
    fd = root / "vsitu_frames"

    def _frames():
        if not fd.exists():
            return "skip", f"{fd} not present (vb debug epoch disabled)"
        sample = [s for s in segs[:3] if (fd / s).exists()]
        if not sample:
            raise FileNotFoundError(
                f"{fd} exists but contains none of the first train "
                f"segments (expected e.g. {fd / segs[0]})"
            )
        from PIL import Image

        for seg in sample:
            for ix in (1, 150, 300):
                fp = fd / seg / f"{seg}_{ix:06d}.jpg"
                if not fp.exists():
                    raise FileNotFoundError(
                        f"{fp} (reference dumps 300 frames per segment "
                        "named {seg}_{ix:06d}.jpg, dwn_yt.py:249)"
                    )
            with Image.open(fd / sample[0] / f"{sample[0]}_000001.jpg") as im:
                im.load()
        return f"{len(sample)} segments spot-checked, frames 1/150/300 present"

    return rep.run("frames dir", _frames)


def check_feats(root: Path, segs: List[str], rep: Report):
    base = root / "vsitu_vid_feats"

    def _feats():
        import numpy as np

        if not base.exists():
            return "skip", f"{base} not present (sfpret debug epochs disabled)"
        subdirs = [d for d in sorted(base.iterdir()) if d.is_dir()]
        if not subdirs:
            raise FileNotFoundError(f"{base} has no feature subdirectories")
        hits = []
        for d in subdirs:
            fp = d / f"{segs[0]}_feats.npy"
            if fp.exists():
                arr = np.load(fp)
                if arr.ndim != 2 or arr.shape[0] != 5:
                    raise ValueError(
                        f"{fp}: expected shape (5, D), got {arr.shape}"
                    )
                hits.append((d.name, arr.shape[1]))
        if not hits:
            raise FileNotFoundError(
                f"no '<dir>/{segs[0]}_feats.npy' under {base} "
                "(feat_extractor.py:107-111 writes one npy per segment)"
            )
        return ", ".join(f"{n}: D={d}" for n, d in hits), hits

    return rep.run("feature dirs", _feats)


# --------------------------------------------------------------- checkpoints
def check_caffe2(path: Optional[str], arch: str, rep: Report):
    def _ck():
        if not path:
            return "skip", "--caffe2_ckpt not given"
        from .convert.caffe2 import convert_caffe2_checkpoint

        tree = convert_caffe2_checkpoint(path, arch=arch, strict=True)
        n = sum(1 for _ in _iter_leaves(tree))
        return f"converted with strict key accounting: {n} param leaves"

    return rep.run("caffe2 checkpoint", _ck)


def check_sfbase(path: Optional[str], arch: str, rep: Report):
    def _ck():
        if not path:
            return "skip", "--sfbase_ckpt not given"
        from .convert.hf_torch import load_torch_state_dict
        from .convert.slowfast_torch import convert_sfbase_checkpoint

        sd = load_torch_state_dict(path)
        tree = convert_sfbase_checkpoint(sd, arch=arch, strict=True)
        n = sum(1 for _ in _iter_leaves(tree))
        return f"converted with strict key accounting: {n} param leaves"

    return rep.run("sfbase (torch) checkpoint", _ck)


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


# --------------------------------------------------------------- debug epoch
def _release_cfg(root: Path, vocab_dirs: dict, task_type: str, mdl: str,
                 feats_name: Optional[str] = None):
    from .utils.config import get_cfg_with_overrides

    ann = root / "vidsitu_annotations"
    over = {
        "task_type": task_type,
        "mdl.mdl_name": mdl,
        "debug_mode": True,
        "train.bs": 2,
        "train.bsv": 2,
        "train.nw": 0,
        "train.nwv": 0,
        "ds.vsitu.video_frms_tdir": str(root / "vsitu_frames"),
    }
    for sp in SPLIT_KEYS:
        over[f"ds.vsitu.split_files_lb.{sp}"] = str(
            ann / "split_files" / SPLIT_FNAME[sp]
        )
        over[f"ds.vsitu.vsitu_ann_files_lb.{sp}"] = str(
            ann / "vseg_ann_files" / ANN_FNAME[sp]
        )
        over[f"ds.vsitu.vinfo_files_lb.{sp}"] = str(
            ann / "vinfo_files" / VINFO_FNAME[sp]
        )
    over["ds.vsitu.vocab_files.verb_id_vocab"] = str(vocab_dirs["verb"])
    over["ds.vsitu.vocab_files.new_gpt2_vb_arg_vocab"] = str(vocab_dirs["gpt2"])
    if vocab_dirs.get("roberta"):
        over["ds.vsitu.vocab_files.roberta_vocab"] = str(vocab_dirs["roberta"])
    if feats_name:
        over["ds.vsitu.vsit_frm_feats_dir"] = str(
            root / "vsitu_vid_feats" / feats_name
        )
    return get_cfg_with_overrides("verify_release", **over)


def debug_epoch(root: Path, vocab_dirs: dict, task_type: str, mdl: str,
                rep: Report, feats_name: Optional[str] = None,
                splits: Tuple[str, ...] = ("train", "valid")):
    name = f"debug epoch[{task_type}/{mdl}]"

    def _epoch():
        import numpy as np

        from .data.dataset import VsituDS
        from .data.loader import stack_collate

        cfg = _release_cfg(root, vocab_dirs, task_type, mdl, feats_name)
        from .data import build_comm

        comm = build_comm(cfg)
        shapes = {}
        for split in splits:
            ds = VsituDS(cfg, comm, split)
            n = len(ds)  # debug_mode caps at 30 (dat_loader.py:175-178)
            items = [ds[i] for i in range(n)]
            batch = stack_collate(items[: min(4, n)])
            for k, v in batch.items():
                if isinstance(v, np.ndarray) and not np.isfinite(
                    v.astype(np.float64, copy=False)
                ).all():
                    raise ValueError(f"{split}.{k} contains non-finite values")
            shapes[split] = {k: tuple(v.shape) for k, v in batch.items()}
        first = next(iter(shapes.values()))
        return (
            f"{'+'.join(splits)} x<=30 items fetched+collated; "
            f"{len(first)} tensors/batch"
        )

    return rep.run(name, _epoch)


def train_step_check(root: Path, vocab_dirs: dict, task_type: str, mdl: str,
                     rep: Report, feats_name: Optional[str] = None):
    """One REAL jitted train step (fwd + bwd + Adam) on a 2-item batch
    built from the release's converted vocabs: catches model-side
    contract breaks a data-only epoch cannot (vocab-size/classifier-head
    mismatches, non-finite losses from real id ranges, dtype drift)."""
    name = f"train step[{task_type}/{mdl}]"

    def _step():
        import jax
        import numpy as np
        import optax

        from .data import build_comm
        from .data.dataset import VsituDS
        from .data.loader import fold_frame_events, stack_collate
        from .models.selector import build_model, init_model_variables

        cfg = _release_cfg(root, vocab_dirs, task_type, mdl, feats_name)
        comm = build_comm(cfg)
        ds = VsituDS(cfg, comm, "train")
        batch = fold_frame_events(
            stack_collate([ds[i] for i in range(min(2, len(ds)))])
        )
        model = build_model(cfg, comm)
        variables = init_model_variables(model, batch, seed=0)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        extra_cols = list(extra)
        optimizer = optax.adam(1e-4)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(p, ex, st, b, rng):
            def loss_fn(pp):
                if extra_cols:
                    out, new_ex = model.apply(
                        {"params": pp, **ex}, b, deterministic=False,
                        rngs={"dropout": rng}, mutable=extra_cols,
                    )
                    return out["loss"], new_ex
                out = model.apply({"params": pp}, b, deterministic=False,
                                  rngs={"dropout": rng})
                return out["loss"], {}

            (loss, new_ex), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            upd, st = optimizer.update(updates=grads, state=st, params=p)
            return optax.apply_updates(p, upd), new_ex, st, loss

        p2, _, _, loss = step(params, extra, opt_state, batch,
                              jax.random.PRNGKey(0))
        loss = float(loss)
        if not np.isfinite(loss):
            raise ValueError(f"non-finite loss {loss} on the release batch")
        moved = jax.tree.reduce(
            lambda a, kv: a + int(bool(np.any(np.asarray(kv)))),
            jax.tree.map(lambda a, b_: a != b_, params, p2), 0,
        )
        if moved == 0:
            raise ValueError(
                "0 param tensors updated by the step — all gradients are "
                "zero (disconnected head / stop-gradient regression); the "
                "step verified nothing"
            )
        return f"loss={loss:.4f}, {moved} param tensors updated"

    return rep.run(name, _step)


# ------------------------------------------------------------------- driver
def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m vidsitu_tpu.verify_release",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument("--dir", required=True, help="VidSitu release root")
    ap.add_argument("--caffe2_ckpt", default=None)
    ap.add_argument("--sfbase_ckpt", default=None)
    ap.add_argument("--roberta_tok_dir", default=None)
    ap.add_argument("--convert_out", default=None,
                    help="output dir for converted vocabs "
                         "(default <dir>/converted_tpu)")
    ap.add_argument("--no_epoch", action="store_true",
                    help="skip the 30-item debug epochs")
    ap.add_argument("--train_step", action="store_true",
                    help="also run ONE jitted train step (fwd+bwd+Adam) "
                         "per task on a 2-item release batch — verifies "
                         "the model path against the real vocab sizes "
                         "(compiles; expect ~20-40s/task on TPU). Each "
                         "step runs only after its task's debug epoch "
                         "passes, so it is skipped under --no_epoch")
    ap.add_argument("--arch", default="slowfast",
                    help="backbone arch for --caffe2_ckpt conversion")
    args = ap.parse_args(argv)

    root = Path(args.dir)
    rep = Report()
    if not root.exists():
        rep.fail("release dir", f"{root} does not exist")
        return 1
    convert_out = Path(args.convert_out or (root / "converted_tpu"))

    # 1. annotation schemas, all five splits
    train_segs = None
    for sp in SPLIT_KEYS:
        segs = check_split(root, sp, rep)
        if sp == "train":
            train_segs = segs

    # 2. vocab pickles -> converted dirs
    verb_out = check_verb_vocab(root, rep, convert_out)
    gpt2_out = check_gpt2_pickle(root, rep, convert_out)
    rob_out = check_roberta(args.roberta_tok_dir, rep, convert_out)

    # 3. media dirs
    frames_ok = feats = None
    if train_segs:
        frames_ok = check_frames(root, train_segs, rep)
        feats = check_feats(root, train_segs, rep)

    # 4. checkpoints
    check_caffe2(args.caffe2_ckpt, args.arch, rep)
    check_sfbase(args.sfbase_ckpt, args.arch, rep)

    # 5. debug-mode epochs per task (data layer end-to-end)
    def _step_skip(task: str, mdl: str, why: str):
        """A requested --train_step that cannot run must still emit a
        line — silence would read as 'the check ran'."""
        if args.train_step:
            rep.skip(f"train step[{task}/{mdl}]", why)

    if args.no_epoch:
        for task, mdl in (("vb", "sf_base"), ("vb_arg", "tx_only"),
                          ("vb_arg", "sfpret_txe_txd_vbarg"),
                          ("evrel", "rob_evrel")):
            _step_skip(task, mdl, "--no_epoch skips the debug epoch this "
                                  "check depends on")
    else:
        if verb_out and gpt2_out:
            rob_dir = rob_out if rob_out is not True else None
            if rob_dir is None:
                # build_comm loads a RoBERTa vocab unconditionally; a real
                # release does not ship one (the reference pulls
                # roberta-base from the HF hub at runtime). Build a
                # stand-in from the GPT-2 base BPE so the vb_arg epochs
                # run; the evrel epoch still requires the real tokenizer.
                def _standin():
                    from .tokenization.bpe import ByteLevelBPE
                    from .tokenization.tokenizer import make_roberta_tokenizer

                    bpe = ByteLevelBPE.from_dir(gpt2_out)
                    out = convert_out / "roberta_standin_vocab"
                    make_roberta_tokenizer(bpe).save_dir(out)
                    return (
                        "built from the GPT-2 base BPE (satisfies "
                        "build_comm; NOT id-compatible with roberta-base)",
                        out,
                    )

                standin = rep.run("roberta stand-in vocab", _standin)
            vocab_dirs = {"verb": verb_out, "gpt2": gpt2_out,
                          "roberta": rob_dir or standin}
            if frames_ok is True:
                ok = debug_epoch(root, vocab_dirs, "vb", "sf_base", rep)
                if ok:
                    if args.train_step:
                        train_step_check(root, vocab_dirs, "vb", "sf_base",
                                         rep)
                else:
                    _step_skip("vb", "sf_base", "debug epoch failed")
            else:
                rep.skip("debug epoch[vb/sf_base]", "no frames dir")
                _step_skip("vb", "sf_base", "no frames dir")
            # token-only SRL model: no feats needed (mdl_selector.py:36)
            ok = debug_epoch(root, vocab_dirs, "vb_arg", "tx_only", rep)
            if ok:
                if args.train_step:
                    train_step_check(root, vocab_dirs, "vb_arg", "tx_only",
                                     rep)
            else:
                _step_skip("vb_arg", "tx_only", "debug epoch failed")
            if feats:
                ok = debug_epoch(root, vocab_dirs, "vb_arg",
                                 "sfpret_txe_txd_vbarg", rep,
                                 feats_name=feats[0][0])
                if ok:
                    if args.train_step:
                        train_step_check(root, vocab_dirs, "vb_arg",
                                         "sfpret_txe_txd_vbarg", rep,
                                         feats_name=feats[0][0])
                else:
                    _step_skip("vb_arg", "sfpret_txe_txd_vbarg",
                               "debug epoch failed")
            else:
                rep.skip("debug epoch[vb_arg/sfpret_txe_txd_vbarg]",
                         "no feature dir")
                _step_skip("vb_arg", "sfpret_txe_txd_vbarg", "no feature dir")
            if rob_dir:
                ok = debug_epoch(root, vocab_dirs, "evrel", "rob_evrel", rep)
                if ok:
                    if args.train_step:
                        train_step_check(root, vocab_dirs, "evrel",
                                         "rob_evrel", rep)
                else:
                    _step_skip("evrel", "rob_evrel", "debug epoch failed")
            else:
                rep.skip("debug epoch[evrel/rob_evrel]",
                         "needs --roberta_tok_dir")
                _step_skip("evrel", "rob_evrel", "needs --roberta_tok_dir")
        else:
            rep.skip("debug epochs", "vocab conversion failed above")
            for task, mdl in (("vb", "sf_base"), ("vb_arg", "tx_only"),
                              ("vb_arg", "sfpret_txe_txd_vbarg"),
                              ("evrel", "rob_evrel")):
                _step_skip(task, mdl, "vocab conversion failed above")

    print(
        f"\n{len(rep.passed)} ok, {len(rep.failed)} failed, "
        f"{len(rep.skipped)} skipped"
    )
    return len(rep.failed)


if __name__ == "__main__":
    sys.exit(main())
