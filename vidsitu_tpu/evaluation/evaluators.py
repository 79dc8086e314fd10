"""In-loop evaluators: decode/score during validation
(reference: vidsitu_code/evl_vsitu.py).

Each evaluator is a callable ``(variables, dl, dl_name, pred_path)
-> (loss_dict, metric_dict)`` handed to the Learner. They
run the jitted forward/generate path over the loader, assemble
leaderboard-format prediction lists, write ``{dl_name}_{rank}.pkl``, and
score through evl_fns.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np

from ..utils.io import write_pickle
from .evl_fns import EvalFnCap, EvlFn_EvRel, EvlFn_Vb


def pad_batch_to(batch: Dict[str, np.ndarray], size: int) -> Dict[str, np.ndarray]:
    """Repeat the last row so every batch has a static shape (the
    duplicated ann_idx rows are deduped by the scorers)."""
    b = next(iter(batch.values())).shape[0]
    if b == size:
        return batch
    reps = size - b
    return {
        k: np.concatenate([v, np.repeat(v[-1:], reps, axis=0)], axis=0)
        for k, v in batch.items()
    }


def conv_seq_to_srl(inp_seq: str, ag_start_values) -> Dict[str, str]:
    """Parse 'vb <ArgX> text <ArgY> text...' (evl_vsitu.py:174-194)."""
    inp_tok_lst = inp_seq.split(" ")
    if "." not in inp_tok_lst[0]:
        return {}
    vb_dct = {"vb_id": inp_tok_lst[0]}
    ix = 1
    curr_str_lst: List[str] = []
    curr_arg_name = ""
    while ix < len(inp_tok_lst):
        if inp_tok_lst[ix] not in ag_start_values:
            curr_str_lst.append(inp_tok_lst[ix])
        else:
            if ix > 1:
                vb_dct[curr_arg_name] = " ".join(curr_str_lst)
            curr_arg_name = inp_tok_lst[ix].split("<", 1)[1].rsplit(">", 1)[0]
            curr_str_lst = []
        ix += 1
    vb_dct[curr_arg_name] = " ".join(curr_str_lst)
    return vb_dct



class _BaseEvaluator:
    """Shared evaluator loop: jitted forward over the loader, static-shape
    padding, per-rank pkl write, host-0 merge across ranks
    (evl_vsitu.py:77-145), then task scoring."""

    met_keys: List[str] = []

    def __init__(self, cfg, comm, split_type: str = "valid", rank: int = 0,
                 world_size: int = 1, mesh=None):
        self.cfg = cfg
        self.comm = comm
        self.split_type = split_type
        self.rank = rank
        self.world_size = world_size
        self.mesh = mesh
        self.loss_keys = ["loss"]

    def _jit(self, fn):
        """jit with the shared eval-sharding policy: batch data-sharded
        over the mesh so validation scales with devices like training
        (parallel/mesh.maybe_shard_jit)."""
        from ..parallel.mesh import maybe_shard_jit

        return maybe_shard_jit(fn, self.mesh)

    def _to_device(self, padded):
        from ..parallel.mesh import to_device

        return to_device(padded, self.mesh)

    def rebind_mesh(self, mesh):
        """Mid-run elasticity (learner.request_resize): point this
        evaluator at the resized mesh so validation stops touching
        devices the run shrank away from (and uses devices it grew
        into). The base class swaps the mesh used for batch placement;
        subclasses also rebuild their cached jitted closures, which
        captured the OLD mesh's shardings at construction."""
        self.mesh = mesh

    def run_model(self, variables, batch):
        raise NotImplementedError

    def decode_batch(self, out, ann_lst) -> List[Dict]:
        raise NotImplementedError

    def score(self, fname: str) -> Dict:
        raise NotImplementedError

    def _run_token(self) -> str:
        """Per-run marker token, identical across ranks (rank 0's uuid,
        broadcast). Distinguishes THIS run's .done markers from a
        crashed prior run's with the same uid and sequence number."""
        tok = getattr(self, "_merge_token", None)
        if tok is None:
            import uuid as _uuid

            tok = _uuid.uuid4().hex[:8]
            if self.world_size > 1:
                try:
                    from jax.experimental import multihost_utils as _mhu

                    arr = np.frombuffer(tok.encode(), dtype=np.uint8)
                    tok = bytes(
                        np.asarray(_mhu.broadcast_one_to_all(arr))
                    ).decode()
                except Exception:
                    # no collective available: seq-only semantics
                    tok = "run"
            self._merge_token = tok
        return tok

    def _merge_ranks(self, pred_path, dl_name, own_results):
        """Rank 0 concatenates every rank's pickle (filesystem gather,
        identical format to the reference).

        Staleness guard: from the second validation on, every per-rank
        pkl already exists from the PREVIOUS call, so waiting on the pkl
        path alone could merge an old epoch's predictions if the sync
        barrier ever fails. Each call therefore gets a monotonically
        increasing sequence number (identical across ranks — calls are
        lockstep) and ranks publish a ``.done`` marker carrying it; rank
        0 waits for THIS call's marker, and a timeout raises instead of
        silently scoring mixed-epoch predictions. The marker also
        carries a per-RUN token (rank-0 uuid broadcast at first use):
        without it, a crashed PRIOR run's same-seq marker could satisfy
        the wait when the sync barrier fails before rank w cleans up."""
        import time as _time

        seq = self._merge_seq = getattr(self, "_merge_seq", 0) + 1
        tok = self._run_token()
        # clear own stale markers (a previous crashed run with the same
        # uid could have left seq-1 markers behind)
        if seq == 1:
            for stale in Path(pred_path).glob(
                f".{dl_name}_{self.rank}.*.done"
            ):
                stale.unlink()
        fname = Path(pred_path) / f"{dl_name}_{self.rank}.pkl"
        write_pickle(own_results, fname)
        (Path(pred_path) / f".{dl_name}_{self.rank}.{tok}.{seq}.done").touch()
        if self.world_size > 1:
            try:
                from ..parallel.collectives import synchronize

                synchronize("eval_pkl_write")
            except Exception:
                _time.sleep(1.0)
        if self.rank != 0:
            return None
        merged = list(own_results)
        for w in range(1, self.world_size):
            marker = Path(pred_path) / f".{dl_name}_{w}.{tok}.{seq}.done"
            for _ in range(600):
                if marker.exists():
                    break
                _time.sleep(0.1)
            else:
                raise RuntimeError(
                    f"eval merge: rank {w} never published "
                    f"{marker.name} — refusing to score possibly-stale "
                    f"predictions"
                )
            with open(Path(pred_path) / f"{dl_name}_{w}.pkl", "rb") as f:
                import pickle as _pkl

                merged += _pkl.load(f)
            marker.unlink(missing_ok=True)
        (Path(pred_path) / f".{dl_name}_0.{tok}.{seq}.done").unlink(
            missing_ok=True
        )
        fname0 = Path(pred_path) / f"{dl_name}_0.pkl"
        write_pickle(merged, fname0)
        return fname0

    compute_loss = False  # EvalB_Acc computes eval loss (evl_vsitu.py:222)

    def loss_from_outputs(self, out, padded, n_real) -> float:
        """Loss of this rank's (possibly partial) batch, computed from
        the outputs ``run_model`` already produced — no second forward,
        no per-remainder-shape jit, and exact on pad rows (only the
        first ``n_real`` rows count). ``out`` covers the GLOBAL batch on
        multi-process runs; implementations slice their rank's rows."""
        raise NotImplementedError

    def __call__(self, variables, dl, dl_name, pred_path):
        import jax as _jax

        results: List[Dict] = []
        losses: List[float] = []
        nums: List[int] = []
        bsv = dl.batch_size
        if self.mesh is not None:
            from ..parallel.mesh import data_extent

            # divisor = the data(+fsdp) extent's local share, NOT the
            # device count: a 'model' (tensor-parallel) axis replicates
            # the batch rather than splitting it
            dp_extent = data_extent(self.mesh)
            assert dp_extent % _jax.process_count() == 0, (
                f"mesh data*fsdp extent {dp_extent} does not partition "
                f"{_jax.process_count()} processes (see Learner init)"
            )
            local_dp = max(dp_extent // _jax.process_count(), 1)
            assert bsv % local_dp == 0, (
                f"eval batch {bsv} must be divisible by the mesh's "
                f"{local_dp}-way local data-parallel share"
            )
        multiproc = _jax.process_count() > 1
        for batch in dl:
            n_real = next(iter(batch.values())).shape[0]
            padded = pad_batch_to(batch, bsv)
            dev_batch = self._to_device(padded)
            out = self.run_model(variables, dev_batch)
            if multiproc:
                # outputs are replicated (maybe_shard_jit) and cover the
                # GLOBAL batch; rank 0 decodes everything against the
                # all-gathered annotation ids, other ranks contribute
                # empty shards to the merge
                from jax.experimental import multihost_utils as _mhu

                global_idx = np.asarray(
                    _mhu.process_allgather(np.asarray(padded["vseg_idx"]))
                ).reshape(-1)
                if self.rank == 0:
                    results += self.decode_batch(out, global_idx)
            else:
                results += self.decode_batch(out, padded["vseg_idx"])
            if self.compute_loss:
                losses.append(self.loss_from_outputs(out, padded, n_real))
                nums.append(n_real)
        seen = set()
        uniq = [r for r in results
                if r["ann_idx"] not in seen and not seen.add(r["ann_idx"])]
        if losses and multiproc:
            # count-weighted global mean across processes (the reference's
            # reduce_dict_corr, trn_utils.py:102-121): each rank only saw
            # its own shard's batches
            from ..parallel.collectives import reduce_dict_corr

            local = float(np.average(losses, weights=nums))
            val_loss = reduce_dict_corr(
                {"loss": local}, float(np.sum(nums))
            )["loss"]
        else:
            val_loss = (
                float(np.average(losses, weights=nums)) if losses else 0.0
            )
        fname0 = self._merge_ranks(pred_path, dl_name, uniq)
        if fname0 is None:  # non-zero rank: zeros like the reference
            return (
                {k: 0.0 for k in self.loss_keys},
                {k: 0.0 for k in self.met_keys},
            )
        out_acc = self.score(str(fname0))
        val_acc = {k: float(out_acc[k]) for k in self.met_keys if k in out_acc}
        return {"loss": val_loss}, val_acc


class EvalB(_BaseEvaluator):
    """Verb-prediction evaluator (evl_vsitu.py:21-145): softmax -> top-5
    verb strings per event -> pkl -> EvlFn_Vb."""

    met_keys = ["Per_Ev_Top_1", "Per_Ev_Top_5", "recall_macro_1_th_9"]

    def __init__(self, cfg, comm, model, split_type: str = "valid",
                 rank: int = 0, world_size: int = 1, mesh=None):
        super().__init__(cfg, comm, split_type, rank, world_size, mesh)
        self.evl_met = EvlFn_Vb(cfg, comm, self.met_keys)
        self._model = model
        self.forward = self._jit(
            lambda v, b: self._model.apply(v, b)["mdl_out"]
        )

    def rebind_mesh(self, mesh):
        super().rebind_mesh(mesh)
        self.forward = self._jit(
            lambda v, b: self._model.apply(v, b)["mdl_out"]
        )

    def run_model(self, variables, batch):
        return np.asarray(self.forward(variables, batch))

    def score(self, fname: str):
        return self.evl_met.simple_acc(fname, split_type=self.split_type)

    def decode_batch(self, mdl_out: np.ndarray, ann_lst: np.ndarray,
                     topk: int = 5) -> List[Dict]:
        symbols = self.comm.vb_id_vocab.symbols
        x = mdl_out.astype(np.float64)
        probs = np.exp(x - x.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        order = np.argsort(-probs, axis=-1)[..., :topk]
        out = []
        for bix in range(mdl_out.shape[0]):
            pred_vbs, pred_scores = [], []
            for ev in range(5):
                ixs = order[bix, ev]
                pred_vbs.append([symbols[i] for i in ixs])
                pred_scores.append([float(probs[bix, ev, i]) for i in ixs])
            out.append(
                {
                    "pred_vbs_ev": pred_vbs,
                    "pred_scores_ev": pred_scores,
                    "ann_idx": int(ann_lst[bix]),
                }
            )
        return out


class EvalB_Acc(_BaseEvaluator):
    """EvRel classification evaluator (evl_vsitu.py:217-261)."""

    met_keys = ["Macro_Top_1", "Top_1"]
    compute_loss = True

    def __init__(self, cfg, comm, model, split_type: str = "valid",
                 rank: int = 0, world_size: int = 1, mesh=None):
        super().__init__(cfg, comm, split_type, rank, world_size, mesh)
        self.evl_met = EvlFn_EvRel(cfg, comm, self.met_keys)
        self._model = model
        self._build_forwards()

    def _build_forwards(self):
        self.forward = self._jit(
            lambda v, b: self._model.apply(v, b)["mdl_out"]
        )

    def rebind_mesh(self, mesh):
        super().rebind_mesh(mesh)
        self._build_forwards()

    def loss_from_outputs(self, out, padded, n_real) -> float:
        """Masked CE recomputed host-side from the logits the forward
        already produced (the model's own loss head, evrel_models.py:
        masked_cross_entropy over labels != -1). Exact for partial
        batches (pad rows excluded) and multi-process-safe: the old
        un-meshed jit fallback fed per-host DIFFERING local batches to
        a plain jit, which is undefined for global inputs."""
        bsv = next(iter(padded.values())).shape[0]
        row0 = self.rank * bsv if out.shape[0] > bsv else 0
        logits = np.asarray(out)[row0:row0 + n_real].astype(np.float64)
        labels = np.asarray(padded["evrel_labs"])[:n_real].reshape(-1)
        lo = logits.reshape(-1, logits.shape[-1])
        mask = labels != -1
        lo = lo - lo.max(-1, keepdims=True)
        lse = np.log(np.exp(lo).sum(-1))
        ce = lse - lo[np.arange(lo.shape[0]), np.where(mask, labels, 0)]
        return float((ce * mask).sum() / max(mask.sum(), 1.0))

    def run_model(self, variables, batch):
        return np.asarray(self.forward(variables, batch))

    def score(self, fname: str):
        return self.evl_met.simple_acc_evrel(fname, split_type=self.split_type)

    def decode_batch(self, mdl_out: np.ndarray, ann_lst: np.ndarray) -> List[Dict]:
        # mdl_out: (B, 4, N, 5) -> top-1 relation string per pair/annotator
        opp = self.comm.evrel_dct_opp
        x = mdl_out.astype(np.float64)
        probs = np.exp(x - x.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        top1 = probs.argmax(-1)  # (B, 4, N)
        out = []
        for bix in range(mdl_out.shape[0]):
            pred_rows = []
            score_rows = []
            for ev in range(4):
                pred_rows.append([opp[int(i)] for i in top1[bix, ev]])
                score_rows.append(
                    [float(probs[bix, ev, n, top1[bix, ev, n]])
                     for n in range(top1.shape[2])]
                )
            out.append(
                {
                    "pred_evrels_ev": pred_rows,
                    "pred_scores_ev": score_rows,
                    "ann_idx": int(ann_lst[bix]),
                }
            )
        return out



class EvalB_Gen(_BaseEvaluator):
    """SRL generation evaluator (evl_vsitu.py:148-214)."""

    met_keys = ["cider", "rouge", "lea", "MacroVb_cider", "MacroArg_cider"]

    def __init__(self, cfg, comm, generate_fn, split_type: str = "valid",
                 rank: int = 0, world_size: int = 1, mesh=None,
                 gen_builder=None):
        super().__init__(cfg, comm, split_type, rank, world_size, mesh)
        self.generate_fn = generate_fn
        # mid-run elasticity: the generate_fn was built OUTSIDE with the
        # mesh baked in (selector.build_srl_generate_fn), so this
        # evaluator cannot rebuild it by itself — callers that want
        # rebind_mesh to retarget decoding pass ``gen_builder``:
        # a ``mesh -> generate_fn`` callable (main.py does)
        self._gen_builder = gen_builder
        self.evl_met = EvalFnCap(
            cfg, comm, met_keys=["cider", "bleu", "rouge"]
        )

    def rebind_mesh(self, mesh):
        old = self.mesh
        super().rebind_mesh(mesh)
        if self._gen_builder is not None:
            self.generate_fn = self._gen_builder(mesh)
        elif old is not None:
            import logging

            logging.getLogger(__name__).warning(
                "EvalB_Gen.rebind_mesh: no gen_builder was provided, so "
                "the decode fn keeps its construction-time mesh binding "
                "(pass gen_builder=lambda m: build_srl_generate_fn(cfg, "
                "comm, model, mesh=m) to retarget decoding)"
            )

    def run_model(self, variables, batch):
        return np.asarray(self.generate_fn(variables, batch))

    def score(self, fname: str):
        return self.evl_met.eval_cap_mets(fname, split_type=self.split_type)

    def decode_batch(self, out_sents: np.ndarray, ann_lst: np.ndarray) -> List[Dict]:
        wvoc = self.comm.gpt2_hf_tok
        ag_starts = set(self.comm.ag_name_dct.ag_dct_start.values())
        ev_lst = [f"Ev{ix}" for ix in range(1, 6)]
        out = []
        for bix in range(out_sents.shape[0]):
            out_vb_dct = {}
            for ev_ix, ev_in in enumerate(ev_lst):
                toks = out_sents[bix, ev_ix, 0]
                text = wvoc.decode(toks, skip_special_tokens=True)
                out_vb_dct[ev_in] = conv_seq_to_srl(text, ag_starts)
            out.append(
                {"ann_idx": int(ann_lst[bix]), "vb_output": out_vb_dct}
            )
        return out


