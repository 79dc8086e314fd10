"""Checkpoint backends for the Learner.

Two interchangeable backends carrying the reference's metadata payload
(model/opt/scheduler/num_it/num_epoch/cfgtxt/best_met/rng,
utils/trn_utils.py:708-724):

* ``pickle`` (default): one file of flax-serialized byte blobs —
  byte-compatible with checkpoints written since round 1.
* ``orbax``: an orbax-checkpoint directory written with an async
  checkpointer (the save returns immediately; the Learner waits before
  the next save and on shutdown). Scalar metadata rides INSIDE the orbax
  tree as arrays so it commits atomically with the params (a crash
  cannot pair new metadata with old weights); ``cfgtxt`` goes to an
  informational ``meta.json`` sidecar. Tree structure is flattened
  through ``flax.serialization.to_state_dict`` so optimizer namedtuples
  restore via ``from_state_dict`` against the live optimizer's
  structure. Orbax saves are COLLECTIVE across JAX processes
  (``collective = True``) — every rank must call save/load.

Select with ``cfg.train.ckpt_backend``.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

from flax import serialization


class PickleBackend:
    """Reference-compatible single-file payload."""

    name = "pickle"
    collective = False  # rank-0 writes alone

    def save(self, path, params, extra, opt_state, meta: Dict[str, Any]):
        payload = dict(meta)
        payload["model_state_dict"] = serialization.to_bytes(params)
        payload["model_extra_state"] = serialization.to_bytes(extra)
        payload["optimizer_state_dict"] = (
            serialization.to_bytes(opt_state) if opt_state is not None else b""
        )
        # tmp + atomic rename: a crash mid-dump must not truncate the
        # only resumable checkpoint (preemption lands exactly in this
        # window — that is what the preempt_file save exists for)
        import os

        tmp = Path(str(path) + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)

    def load(self, path) -> Optional[Dict[str, Any]]:
        p = Path(path)
        if not p.is_file():
            return None
        try:
            with open(p, "rb") as f:
                payload = pickle.load(f)
        except (EOFError, pickle.UnpicklingError) as e:
            # a torn file from a pre-atomic-rename writer (or disk
            # corruption) must not crash resume — treat as no checkpoint
            import logging

            logging.getLogger("vidsitu_tpu").warning(
                "unreadable checkpoint %s (%s); ignoring", p, e
            )
            return None
        return {
            "params_bytes": payload.get("model_state_dict"),
            "extra_bytes": payload.get("model_extra_state"),
            "opt_bytes": payload.get("optimizer_state_dict"),
            "meta": {
                k: v
                for k, v in payload.items()
                if k
                not in (
                    "model_state_dict",
                    "model_extra_state",
                    "optimizer_state_dict",
                )
            },
        }

    def restore_params(self, target, loaded):
        return serialization.from_bytes(target, loaded["params_bytes"])

    def restore_extra(self, target, loaded):
        if loaded.get("extra_bytes"):
            return serialization.from_bytes(target, loaded["extra_bytes"])
        return target

    def has_opt(self, loaded) -> bool:
        return bool(loaded.get("opt_bytes"))

    def restore_opt(self, target, loaded):
        return serialization.from_bytes(target, loaded["opt_bytes"])

    def delete(self, path):
        Path(path).unlink(missing_ok=True)

    def wait(self):
        pass


_META_KEYS = {
    "num_it", "num_epoch", "best_met", "scheduler_state_dict", "rng",
    "cfgtxt",  # rides the sidecar, not the tree
}


def _meta_to_arrays(meta: Dict[str, Any]) -> Dict[str, Any]:
    """Scalar metadata -> numpy arrays that can live inside the orbax
    tree (atomic with the weights). None floats become NaN."""
    import numpy as np

    unknown = set(meta) - _META_KEYS
    # the pickle backend round-trips arbitrary payload keys; this one
    # hardcodes the schema — fail loudly rather than silently dropping
    # a future metadata field on one backend only
    assert not unknown, (
        f"orbax backend does not persist meta keys {sorted(unknown)}; "
        f"extend _meta_to_arrays/_meta_from_arrays"
    )
    sched = meta.get("scheduler_state_dict") or {}

    def fnan(v):
        return np.float64(np.nan if v is None else v)

    return {
        "num_it": np.int64(meta.get("num_it", 0)),
        "num_epoch": np.int64(meta.get("num_epoch", 0)),
        "best_met": fnan(meta.get("best_met")),
        "plateau_wait": np.int64(sched.get("plateau_wait", 0)),
        "lr": fnan(sched.get("lr")),
        "rng": np.asarray(meta.get("rng", [0, 0]), np.uint32),
    }


def _meta_from_arrays(arrs: Dict[str, Any]) -> Dict[str, Any]:
    import numpy as np

    def unnan(v):
        v = float(v)
        return None if np.isnan(v) else v

    return {
        "num_it": int(arrs["num_it"]),
        "num_epoch": int(arrs["num_epoch"]),
        "best_met": unnan(arrs["best_met"]),
        "scheduler_state_dict": {
            "plateau_wait": int(arrs["plateau_wait"]),
            "lr": unnan(arrs["lr"]),
        },
        "rng": [int(x) for x in list(arrs["rng"])],
    }


class OrbaxBackend:
    """Async orbax directory checkpoints; metadata inside the tree.

    Durability: saves ALTERNATE between two generation dirs
    (``tree.g0``/``tree.g1``) and a ``LIVE`` pointer file (written with
    tmp+rename AFTER the async save commits) names the generation to
    restore. ``force=True`` on a single fixed dir would synchronously
    delete the previous checkpoint before the new one commits, leaving
    a no-valid-checkpoint window for the whole async write — a crash
    there would lose all progress. With generations, a crash at any
    point leaves the pointed-to generation intact (at worst the resume
    sees the previous save). Legacy single-``tree`` checkpoints (no
    pointer) still load."""

    name = "orbax"
    collective = True  # orbax save/restore synchronize across processes

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        self._pending_live: Optional[tuple] = None  # (dir, gen name)
        # per-path next generation, tracked IN MEMORY after the first
        # save: the LIVE pointer is written by rank 0 only, so other
        # ranks re-reading it mid-job could race it and pick a different
        # generation than rank 0 (orbax saves are collective — all ranks
        # must write the same dir). Save calls are lockstep across
        # ranks, so in-memory alternation agrees everywhere; the pointer
        # is only consulted when this process has no prior knowledge of
        # the path (then it is a stable file from a previous job).
        self._next_gen: Dict[str, str] = {}

    def _dir(self, path) -> Path:
        return Path(path).resolve()

    def _live_gen(self, d: Path) -> Optional[str]:
        ptr = d / "LIVE"
        if ptr.is_file():
            try:
                name = ptr.read_text().strip()
            except OSError:
                return None
            if name and (d / name).exists():
                return name
        return None

    def _finalize_pending(self):
        """Publish the LIVE pointer for a save that has now committed.
        Called after wait_until_finished: a crash before this point
        leaves the pointer on the previous (intact) generation."""
        if self._pending_live is None:
            return
        d, gen = self._pending_live
        self._pending_live = None
        import jax
        import os

        if jax.process_index() != 0:
            return
        tmp = d / "LIVE.tmp"
        tmp.write_text(gen)
        os.replace(tmp, d / "LIVE")

    def save(self, path, params, extra, opt_state, meta: Dict[str, Any]):
        self.wait()  # one in-flight async save at a time (+ publishes it)
        d = self._dir(path)
        d.mkdir(parents=True, exist_ok=True)
        gen = self._next_gen.get(str(d))
        if gen is None:
            live = self._live_gen(d)
            gen = "tree.g1" if live == "tree.g0" else "tree.g0"
        self._next_gen[str(d)] = (
            "tree.g1" if gen == "tree.g0" else "tree.g0"
        )
        tree = {
            "params": serialization.to_state_dict(params),
            "extra": serialization.to_state_dict(extra) or {},
            "meta": _meta_to_arrays(meta),
        }
        if opt_state is not None:
            tree["opt"] = serialization.to_state_dict(opt_state)
        # force only ever deletes the NON-live generation
        self._ckptr.save(d / gen, tree, force=True)
        self._pending_live = (d, gen)
        # informational sidecar only (cfgtxt); resume state lives in the
        # tree so it commits atomically with the weights. Rank-0 +
        # tmp+rename: orbax saves are collective, and every rank
        # truncating the same sidecar concurrently can tear it.
        import jax
        import os

        if jax.process_index() == 0:
            sidecar = d.parent / (d.name + ".meta.json")
            tmp = Path(str(sidecar) + ".tmp")
            with open(tmp, "w") as f:
                json.dump({"cfgtxt": meta.get("cfgtxt", "")}, f)
            os.replace(tmp, sidecar)

    def load(self, path) -> Optional[Dict[str, Any]]:
        self.wait()
        d = self._dir(path)
        gen = self._live_gen(d)
        if gen is None and (d / "tree").exists():
            gen = "tree"  # legacy layout (pre-generation checkpoints)
        if gen is None:
            return None
        if gen in ("tree.g0", "tree.g1"):
            # resumed process: next save must not overwrite the live gen
            self._next_gen.setdefault(
                str(d), "tree.g1" if gen == "tree.g0" else "tree.g0"
            )
        # Restore every leaf as HOST numpy (metadata-driven RestoreArgs).
        # The default restore re-attaches the jax.sharding recorded at
        # save time, which no longer exists after an ELASTIC restart
        # (different device count / mesh shape) and errors out. Host
        # arrays are topology-free; the train step's in_shardings
        # re-place them on whatever mesh the resumed run builds.
        import jax
        import numpy as np

        mt = self._ckptr.metadata(d / gen).item_metadata.tree
        ra = jax.tree.map(
            lambda _: self._ocp.RestoreArgs(restore_type=np.ndarray), mt
        )
        raw = self._ckptr.restore(d / gen, restore_args=ra)
        meta = _meta_from_arrays(raw["meta"])
        meta_p = d.parent / (d.name + ".meta.json")
        if meta_p.exists():
            try:
                with open(meta_p) as f:
                    meta.update(json.load(f))
            except (json.JSONDecodeError, OSError):
                pass  # informational sidecar only — never block resume
        return {"raw": raw, "meta": meta}

    def restore_params(self, target, loaded):
        return serialization.from_state_dict(target, loaded["raw"]["params"])

    def restore_extra(self, target, loaded):
        raw = loaded["raw"].get("extra")
        if raw:
            return serialization.from_state_dict(target, raw)
        return target

    def has_opt(self, loaded) -> bool:
        return "opt" in loaded["raw"]

    def restore_opt(self, target, loaded):
        return serialization.from_state_dict(target, loaded["raw"]["opt"])

    def delete(self, path):
        # orbax checkpoints are DIRECTORIES (plus the .meta.json sidecar)
        import shutil

        self.wait()  # never delete under an in-flight async save
        d = self._dir(path)
        self._next_gen.pop(str(d), None)
        if d.is_dir():
            shutil.rmtree(d)
        else:
            d.unlink(missing_ok=True)
        meta_p = d.parent / (d.name + ".meta.json")
        meta_p.unlink(missing_ok=True)

    def wait(self):
        self._ckptr.wait_until_finished()
        self._finalize_pending()


def get_backend(name: str):
    if name == "pickle":
        return PickleBackend()
    if name == "orbax":
        return OrbaxBackend()
    raise ValueError(f"unknown ckpt backend {name!r}")
