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


# ---------------------------------------------------------------- --weights
# Real-artifact readiness (VERDICT r4 #8): the published files the
# reference trains from (EXPTS.md:9-42 drive artifacts — the Kinetics
# caffe2 SLOWFAST pickle, HF gpt2-medium/roberta-base torch weights,
# and reference-trained Learner .pth checkpoints whose model_state_dict
# starts with sf_mdl.*) are unreachable in this environment; this sweep
# is ready to run the moment they are local. Every recognized file is
# converted with STRICT key accounting, language models are logit-
# spot-checked against the torch/HF forward of the SAME weights, video
# trees are checked finite.

_WEIGHT_SUFFIXES = (".pkl", ".bin", ".pt", ".pth", ".ckpt")

# every published GPT-2 uses 64-dim heads (small 768/12 ... xl 1600/25)
_GPT2_HEAD_DIM = 64


def _read_hf_config(path: Path) -> dict:
    cfgf = path.parent / "config.json"
    if cfgf.exists():
        try:
            return json.loads(cfgf.read_text())
        except Exception:
            return {}
    return {}


def _classify_torch_sd(sd: dict) -> Optional[str]:
    for k in sd:
        k = k[len("module."):] if k.startswith("module.") else k
        if k.startswith("sf_mdl."):
            return "sfbase"
        if k.endswith("wte.weight"):
            return "gpt2"
        if "word_embeddings.weight" in k:
            return "roberta"
    return None


def _gpt2_spotcheck(sd: dict, hf_cfg: dict) -> str:
    """Strict conversion + logit parity of the converted flax decoder vs
    the torch/HF GPT2LMHeadModel rebuilt from the SAME weights (the
    exact comparison tests/test_converters_fullsize.py rehearses on the
    gpt2-medium schema)."""
    import numpy as np

    from .convert.hf_torch import convert_gpt2

    pre = "transformer." if any(k.startswith("transformer.") for k in sd) \
        else ""
    d = sd[f"{pre}wte.weight"].shape[1]
    vocab = sd[f"{pre}wte.weight"].shape[0]
    n_pos = sd[f"{pre}wpe.weight"].shape[0]
    n_layers = 1 + max(
        int(k.split(".")[1 if not pre else 2]) for k in sd
        if f"{pre}h." in k or k.startswith("h.")
    )
    n_heads = int(hf_cfg.get("n_head", d // _GPT2_HEAD_DIM))
    ffn = sd[f"{pre}h.0.mlp.c_fc.weight"].shape[-1]
    params = convert_gpt2(sd, n_layers=n_layers, n_heads=n_heads,
                          strict=True)
    n = sum(1 for _ in _iter_leaves(params))

    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    import jax
    import jax.numpy as jnp

    from .models.transformer import TransformerDecoder, TxConfig

    hf = GPT2LMHeadModel(GPT2Config(
        vocab_size=vocab, n_positions=n_pos, n_embd=d, n_layer=n_layers,
        n_head=n_heads, n_inner=ffn if ffn != 4 * d else None,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )).eval()
    torch_sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    if pre:
        missing, unexpected = hf.load_state_dict(torch_sd, strict=False)
    else:
        # hub-published gpt2/gpt2-medium checkpoints store the backbone
        # keys unprefixed (transformers adds base_model_prefix on load)
        # — load them into the backbone module directly
        missing, unexpected = hf.transformer.load_state_dict(
            torch_sd, strict=False
        )
    real_missing = [k for k in missing
                    if not k.endswith((".attn.bias", ".attn.masked_bias",
                                       "lm_head.weight"))]
    if real_missing or unexpected:
        raise ValueError(
            f"HF rebuild mismatch: missing={real_missing[:5]} "
            f"unexpected={list(unexpected)[:5]}"
        )
    dec = TransformerDecoder(TxConfig(
        vocab_size=vocab, d_model=d, ffn_dim=ffn, n_layers=n_layers,
        n_heads=n_heads, dropout=0.0, max_len=n_pos,
        normalize_before=True, scale_embed=False, learned_pos=True,
        share_in_out_embed=True, pad_id=0, activation="gelu",
        final_ln=True,
    ), has_cross=False)
    toks = np.random.default_rng(0).integers(0, vocab, size=(1, 8))
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    ours = np.asarray(jax.jit(
        lambda t: dec.apply({"params": params}, t)
    )(jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    err = float(np.abs(ours - ref).mean())
    return (f"gpt2 {n_layers}L/d{d}: strict-converted {n} leaves, "
            f"logits == torch/HF (mean |err| {err:.1e})")


def _roberta_spotcheck(sd: dict, hf_cfg: dict) -> str:
    """Strict conversion + hidden-state parity vs the torch/HF RoBERTa
    encoder rebuilt from the SAME weights."""
    import numpy as np

    from .convert.hf_torch import convert_roberta

    pre = "roberta." if any(k.startswith("roberta.") for k in sd) else ""
    emb = f"{pre}embeddings."
    d = sd[emb + "word_embeddings.weight"].shape[1]
    vocab = sd[emb + "word_embeddings.weight"].shape[0]
    max_pos = sd[emb + "position_embeddings.weight"].shape[0]
    type_vocab = sd[emb + "token_type_embeddings.weight"].shape[0]
    ffn = sd[f"{pre}encoder.layer.0.intermediate.dense.weight"].shape[0]
    n_layers = 1 + max(
        int(k.split("encoder.layer.")[1].split(".")[0]) for k in sd
        if "encoder.layer." in k
    )
    n_heads = int(hf_cfg.get("num_attention_heads",
                             max(d // _GPT2_HEAD_DIM, 1)))
    params = convert_roberta(sd, n_layers=n_layers, n_heads=n_heads,
                             strict=True)
    n = sum(1 for _ in _iter_leaves(params))

    import torch
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRoberta

    import jax
    import jax.numpy as jnp

    from .models.roberta import RobertaCfg, RobertaModel

    hf = HFRoberta(RobertaConfig(
        vocab_size=vocab, hidden_size=d, num_hidden_layers=n_layers,
        num_attention_heads=n_heads, intermediate_size=ffn,
        max_position_embeddings=max_pos, type_vocab_size=type_vocab,
        pad_token_id=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5,
    ), add_pooling_layer=False).eval()
    stripped = {
        k[len(pre):] if k.startswith(pre) else k:
            torch.from_numpy(np.asarray(v))
        for k, v in sd.items()
        if not k.startswith(("lm_head.", "classifier."))
    }
    missing, unexpected = hf.load_state_dict(stripped, strict=False)
    real_missing = [k for k in missing if "position_ids" not in k]
    real_unexpected = [k for k in unexpected
                       if "position_ids" not in k and "pooler." not in k]
    if real_missing or real_unexpected:
        raise ValueError(
            f"HF rebuild mismatch: missing={real_missing[:5]} "
            f"unexpected={real_unexpected[:5]}"
        )
    model = RobertaModel(RobertaCfg(
        vocab_size=vocab, d_model=d, n_layers=n_layers, n_heads=n_heads,
        ffn_dim=ffn, max_pos=max_pos, pad_id=1, dropout=0.0,
    ), add_pooling_layer=False)
    rng = np.random.default_rng(3)
    toks = rng.integers(3, max(vocab - 5, 4), size=(1, 10))
    attn = np.ones_like(toks)
    with torch.no_grad():
        ref = hf(torch.tensor(toks),
                 attention_mask=torch.tensor(attn)).last_hidden_state.numpy()
    out = jax.jit(lambda t, a: model.apply({"params": params}, t, a))(
        jnp.asarray(toks, jnp.int32), jnp.asarray(attn, jnp.int32)
    )
    ours = np.asarray(out["last_hidden_state"])
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    err = float(np.abs(ours - ref).mean())
    return (f"roberta {n_layers}L/d{d}: strict-converted {n} leaves, "
            f"hidden states == torch/HF (mean |err| {err:.1e})")


def _finite_leaves(tree, what: str) -> int:
    import numpy as np

    n = 0
    for leaf in _iter_leaves(tree):
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            raise ValueError(f"non-finite values in {what}")
        n += 1
    return n


def check_weights_dir(weights_dir: str, arch: str, rep: Report) -> None:
    """``--weights <dir>``: readiness sweep over a directory of the
    published artifacts (module comment above). Per file: classify,
    convert with ``strict=True`` key accounting, spot-check (logit
    parity for gpt2/roberta, finiteness for video trees). Unrecognized
    candidates are reported as skips, never silently ignored."""
    from .convert.caffe2 import load_caffe2_pickle

    root = Path(weights_dir)
    if not root.exists():
        rep.fail("weights dir", f"{root} does not exist")
        return
    cands = sorted(
        p for p in root.rglob("*")
        if p.is_file() and p.suffix.lower() in _WEIGHT_SUFFIXES
    )
    if not cands:
        rep.skip("weights dir", f"no {'/'.join(_WEIGHT_SUFFIXES)} files "
                                f"under {root}")
        return

    def _infer_arch(name: str) -> str:
        # filename carries the reference model tag (EXPTS.md vb table);
        # the converter only needs the pathway topology: 'slowfast'
        # (dual) vs single-pathway ('i3d'/'slow')
        if "slow_fast" in name or "slowfast" in name.lower():
            return "slowfast"
        if "i3d" in name.lower():
            return "i3d"
        if "slow" in name.lower():
            return "slow"
        return arch

    for p in cands:
        rel = str(p.relative_to(root))

        def _one(p=p, rel=rel):
            import pickle as _pkl

            if p.suffix.lower() == ".pkl":
                with open(p, "rb") as f:
                    data = _pkl.load(f, encoding="latin1")
                if not isinstance(data, dict):
                    return "skip", f"{rel}: pickle is not a blob dict"
                blobs = load_caffe2_pickle(data)
                if not any(k.endswith("conv1_w") for k in blobs):
                    return "skip", f"{rel}: no caffe2 conv blobs"
                from .convert.caffe2 import convert_caffe2_checkpoint

                a = _infer_arch(p.name)
                tree = convert_caffe2_checkpoint(p, arch=a, strict=True)
                n = _finite_leaves(tree, rel)
                return f"caffe2/{a}: strict-converted {n} finite leaves"

            from .convert.hf_torch import load_torch_state_dict

            sd = load_torch_state_dict(str(p))
            kind = _classify_torch_sd(sd)
            hf_cfg = _read_hf_config(p)
            if kind == "gpt2":
                return _gpt2_spotcheck(sd, hf_cfg)
            if kind == "roberta":
                return _roberta_spotcheck(sd, hf_cfg)
            if kind == "sfbase":
                from .convert.slowfast_torch import convert_sfbase_checkpoint

                a = _infer_arch(p.name)
                tree = convert_sfbase_checkpoint(sd, arch=a, strict=True)
                n = _finite_leaves(tree, rel)
                return (f"sfbase/{a}: strict-converted {n} finite leaves "
                        f"(params + batch_stats)")
            return "skip", (f"{rel}: unrecognized state dict "
                            f"(first keys: {sorted(sd)[:3]})")

        rep.run(f"weights[{rel}]", _one)


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


# --------------------------------------------------------------- --fit
# Tiny per-task dims (the test suite's geometry) keep the rehearsal
# minutes-scale; the lifecycle exercised is the full production one.
_FIT_TINY_TX = {
    "gpt2_mdl.d_model": 64, "gpt2_mdl.n_layers": 2, "gpt2_mdl.n_heads": 4,
    "gpt2_mdl.max_pos": 128,
    "tx_dec.decoder_embed_dim": 64, "tx_dec.decoder_ffn_embed_dim": 128,
    "tx_dec.decoder_layers": 2, "tx_dec.decoder_attention_heads": 4,
    "tx_dec.encoder_embed_dim": 64, "tx_dec.encoder_ffn_embed_dim": 128,
    "tx_dec.encoder_layers": 2, "tx_dec.encoder_attention_heads": 4,
}
_FIT_TINY_VID = {
    "vid_mdl.resnet.depth": 26, "vid_mdl.crop_size": 32,
    "vid_mdl.num_frames": 4, "vid_mdl.sampling_rate": 2,
}
_FIT_TINY_ROB = {
    "rob_mdl.d_model": 64, "rob_mdl.n_layers": 2, "rob_mdl.n_heads": 4,
    "rob_mdl.ffn_dim": 128, "rob_mdl.max_pos": 130,
}
_FIT_DIMS = {"vb": _FIT_TINY_VID, "vb_arg": _FIT_TINY_TX,
             "evrel": _FIT_TINY_ROB}

FIT_TASKS = (
    ("vb", "sf_base"),
    ("vb_arg", "sfpret_txe_txd_vbarg"),
    ("evrel", "rob_evrel"),
)


def fit_rehearsal(work: Path, rep: Report, epochs: int = 2,
                  tasks=FIT_TASKS) -> dict:
    """``--fit``: the reference's FULL training lifecycle per task, run
    for real on the current accelerator (the TPU when present): N train
    epochs -> per-epoch validation with the production (sharded, beamed)
    decode -> best-checkpoint save -> final validation from the best
    model writing the leaderboard-format prediction pkl -> scoring ->
    resume-by-uid (train.resume) -> one continued epoch. The on-hardware
    rehearsal of main_dist.py:94-129 + trn_utils.py:788-867, emitting a
    machine-readable receipt with per-task loss trajectory, metric keys,
    and wall-clock.
    """
    import time

    import jax
    import numpy as np

    from .data.synth import make_synth_dataset
    from .train.build import build_learner
    from .utils.config import get_cfg_with_overrides

    work = Path(work)
    paths = make_synth_dataset(
        work / "synth", n_train=8, n_valid=4, seed=5, with_frames=True
    )
    receipt: dict = {
        "platform": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
        "epochs": epochs,
        "tasks": [],
    }

    for task, mdl in tasks:

        def _one(task=task, mdl=mdl):
            uid = f"fit_{task}_{mdl}"
            over = {
                **paths, **_FIT_DIMS[task],
                "task_type": task, "mdl.mdl_name": mdl,
                # bsv == bs: batches must shard over however many
                # devices the host exposes (1 real TPU chip, or the
                # test harness's 8 virtual CPU devices) — bsv=4 on an
                # 8-device mesh fails the divisibility contract
                "train.bs": 8, "train.bsv": 8,
                "train.nw": 0, "train.nwv": 0,
                "train.dtype": "float32",
                "train.epochs": epochs,
                "misc.tmp_path": str(work / "tmp"),
            }
            if task == "vb_arg":
                # the fairseq-exact 2x-beam candidate flow, not greedy
                over["gen.beam_size"] = 2
            t0 = time.perf_counter()
            cfg = get_cfg_with_overrides(uid, **over)
            mfile = (
                Path(cfg.misc.tmp_path) / "tracking"
                / f"{cfg.expm.exp_name}_{cfg.task_type}" / uid
                / "metrics.jsonl"
            )
            # the tracker appends: drop any stream from a previous
            # rehearsal in the same work dir so the epoch-count check
            # below sees only this run (idempotent re-runs)
            if mfile.exists():
                mfile.unlink()
            learner = build_learner(cfg, uid)
            learner.fit(epochs=epochs, lr=1e-3)

            # trn-loss trajectory from the production tracker stream
            recs = [json.loads(ln)
                    for ln in mfile.read_text().splitlines()]
            trn = [r["trn_loss"] for r in recs if "trn_loss" in r]
            if len(trn) != epochs:
                raise ValueError(
                    f"expected {epochs} tracked epochs, got {len(trn)}"
                )
            if not all(np.isfinite(trn)):
                raise ValueError(f"non-finite train loss: {trn}")
            if trn[-1] >= trn[0]:
                raise ValueError(
                    f"train loss did not drop over {epochs} epochs: {trn}"
                )

            # final validation from the BEST checkpoint, writing the
            # leaderboard pkl (the run_final_val path, main.py)
            if not learner.model_file.exists():
                raise FileNotFoundError(
                    f"best checkpoint missing: {learner.model_file}"
                )
            learner.load_model_dict(str(learner.model_file), load_opt=False)
            val_loss, val_acc, _ = learner.validate(write_to_file=True)
            pkl = Path(learner.predictions_dir) / "valid_0.pkl"
            if not pkl.exists():
                raise FileNotFoundError(f"prediction pkl missing: {pkl}")
            for k, v in val_acc.items():
                if not np.isfinite(float(v)):
                    raise ValueError(f"non-finite metric {k}={v}")

            # resume-by-uid: a fresh stack re-running the same uid
            # (train.resume, learner.py:117-128) must restore epoch
            # counters + optimizer and keep training
            rcfg = get_cfg_with_overrides(
                uid, **{**over, "train.resume": True}
            )
            learner2 = build_learner(rcfg, uid)
            # resume-by-uid loads the BEST-model checkpoint (reference
            # semantics) — with a plateaued metric that is an earlier
            # epoch than the last, so compare against the recorded
            # best-save epoch rather than the total epoch count
            resumed_at = int(learner2.num_epoch)
            if resumed_at != learner.best_epoch:
                raise ValueError(
                    f"resume restored epoch {resumed_at}, "
                    f"expected best-save epoch {learner.best_epoch}"
                )
            learner2.fit(epochs=1, lr=1e-3)
            recs2 = [json.loads(ln)
                     for ln in mfile.read_text().splitlines()]
            trn2 = [r["trn_loss"] for r in recs2 if "trn_loss" in r]
            cont = trn2[-1]
            if len(trn2) != epochs + 1 or not np.isfinite(cont):
                raise ValueError(
                    f"continued epoch not tracked/finite: {trn2}"
                )

            wall = time.perf_counter() - t0
            entry = {
                "task": task, "mdl": mdl,
                "trn_loss": [round(float(x), 4) for x in trn],
                "loss_drop": round(float(trn[0] - trn[-1]), 4),
                "val_metrics": {k: round(float(v), 4)
                                for k, v in val_acc.items()},
                "val_loss": round(float(val_loss.get("loss", 0.0)), 4),
                "pred_pkl": str(pkl),
                "resume_epoch": resumed_at,
                "continued_loss": round(float(cont), 4),
                "wall_s": round(wall, 1),
            }
            receipt["tasks"].append(entry)
            met = ", ".join(f"{k}={v:.3f}"
                            for k, v in entry["val_metrics"].items())
            return (
                f"loss {trn[0]:.3f}->{trn[-1]:.3f}, resumed+1ep "
                f"{cont:.3f}, {met}, {wall:.0f}s"
            )

        rep.run(f"fit[{task}/{mdl}]", _one)

    out = work / "fit_receipt.json"
    out.write_text(json.dumps(receipt, indent=1))
    print("FIT_RECEIPT " + json.dumps(receipt))
    return receipt


# ------------------------------------------------------------------- driver
def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m vidsitu_tpu.verify_release",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument("--dir", default=None,
                    help="VidSitu release root (optional with --fit, "
                         "which rehearses on synthetic data)")
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
    ap.add_argument("--weights", default=None, metavar="DIR",
                    help="readiness sweep over a directory of published "
                         "weight files (caffe2 SLOWFAST pickle, HF "
                         "gpt2/roberta torch weights, reference-trained "
                         "sf_base .pth): strict-key conversion + logit "
                         "spot-check vs torch/HF. Runs standalone "
                         "(no --dir needed)")
    ap.add_argument("--fit", action="store_true",
                    help="run the FULL training lifecycle per task on "
                         "the current accelerator (synthetic data, tiny "
                         "dims): N epochs -> sharded beam validation -> "
                         "best-ckpt save -> leaderboard pkl -> scoring "
                         "-> resume-by-uid -> one continued epoch; "
                         "writes fit_receipt.json. Runs standalone "
                         "(no --dir needed)")
    ap.add_argument("--fit_epochs", type=int, default=2,
                    help="epochs per task for --fit (default 2)")
    ap.add_argument("--fit_dir", default=None,
                    help="work dir for --fit (default "
                         "<dir>/fit_rehearsal or a temp dir)")
    args = ap.parse_args(argv)

    rep = Report()
    if args.dir is None and not (args.fit or args.weights):
        ap.error("--dir is required unless running --fit or --weights "
                 "standalone")

    if args.dir is None:
        if args.weights:
            check_weights_dir(args.weights, args.arch, rep)
        if args.fit:
            import tempfile

            fit_work = Path(
                args.fit_dir or tempfile.mkdtemp(prefix="vfit_")
            )
            fit_rehearsal(fit_work, rep, epochs=args.fit_epochs)
        print(
            f"\n{len(rep.passed)} ok, {len(rep.failed)} failed, "
            f"{len(rep.skipped)} skipped"
        )
        return len(rep.failed)

    root = Path(args.dir)
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

    # 6. real published-weights sweep (optional; also honored when a
    # --dir release check runs, so `--dir X --weights Y` does both
    # rather than silently dropping the weights sweep)
    if args.weights:
        check_weights_dir(args.weights, args.arch, rep)

    # 7. full-lifecycle fit rehearsal (synthetic data; independent of
    # the release artifacts above, so it runs even if they failed)
    if args.fit:
        fit_rehearsal(Path(args.fit_dir or (root / "fit_rehearsal")),
                      rep, epochs=args.fit_epochs)

    print(
        f"\n{len(rep.passed)} ok, {len(rep.failed)} failed, "
        f"{len(rep.skipped)} skipped"
    )
    return len(rep.failed)


if __name__ == "__main__":
    sys.exit(main())
