"""Checkpoint backends for the Learner.

Two interchangeable backends carrying the reference's metadata payload
(model/opt/scheduler/num_it/num_epoch/cfgtxt/best_met/rng,
utils/trn_utils.py:708-724):

* ``pickle`` (default): one file of flax-serialized byte blobs —
  byte-compatible with checkpoints written since round 1.
* ``orbax``: an orbax-checkpoint directory written with an async
  checkpointer (the save returns immediately; the Learner waits before
  the next save and on shutdown), plus a ``meta.json`` sidecar for the
  scalar metadata. Tree structure is flattened through
  ``flax.serialization.to_state_dict`` so optimizer namedtuples restore
  via ``from_state_dict`` against the live optimizer's structure.

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

    def save(self, path, params, extra, opt_state, meta: Dict[str, Any]):
        payload = dict(meta)
        payload["model_state_dict"] = serialization.to_bytes(params)
        payload["model_extra_state"] = serialization.to_bytes(extra)
        payload["optimizer_state_dict"] = (
            serialization.to_bytes(opt_state) if opt_state is not None else b""
        )
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path) -> Optional[Dict[str, Any]]:
        p = Path(path)
        if not p.is_file():
            return None
        with open(p, "rb") as f:
            payload = pickle.load(f)
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

    def wait(self):
        pass


class OrbaxBackend:
    """Async orbax directory checkpoints + meta.json sidecar."""

    name = "orbax"

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def _dir(self, path) -> Path:
        return Path(path).resolve()

    def save(self, path, params, extra, opt_state, meta: Dict[str, Any]):
        self.wait()  # one in-flight async save at a time
        d = self._dir(path)
        tree = {
            "params": serialization.to_state_dict(params),
            "extra": serialization.to_state_dict(extra) or {},
        }
        if opt_state is not None:
            tree["opt"] = serialization.to_state_dict(opt_state)
        self._ckptr.save(d / "tree", tree, force=True)
        # sidecar AFTER kicking the async save; tiny, written sync
        with open(d.parent / (d.name + ".meta.json"), "w") as f:
            json.dump(meta, f)

    def load(self, path) -> Optional[Dict[str, Any]]:
        d = self._dir(path)
        meta_p = d.parent / (d.name + ".meta.json")
        if not (d / "tree").exists() or not meta_p.exists():
            return None
        self.wait()
        raw = self._ckptr.restore(d / "tree")
        with open(meta_p) as f:
            meta = json.load(f)
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

    def wait(self):
        self._ckptr.wait_until_finished()


def get_backend(name: str):
    if name == "pickle":
        return PickleBackend()
    if name == "orbax":
        return OrbaxBackend()
    raise ValueError(f"unknown ckpt backend {name!r}")
