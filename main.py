"""CLI entry point: ``python main.py <uid> --key=val ...``

Mirrors the reference command surface (main_dist.py:132-172): a unique
experiment id plus dotted-key config overrides; re-running with the same
uid resumes from the saved model. Distribution is TPU-native: one process
per host, a data-parallel mesh over all devices (no spawn / NCCL).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

import jax

# The baked sitecustomize pins jax to the tunneled TPU; allow explicit
# platform selection for CPU smoke runs (JAX_PLATFORMS env is overridden
# by the axon plugin, so a config update is the only reliable switch).
if os.environ.get("VIDSITU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VIDSITU_PLATFORM"])


def parse_cli(argv) -> (str, Dict[str, Any]):
    if len(argv) < 1 or argv[0].startswith("--"):
        raise SystemExit(
            "usage: python main.py <uid> [--dotted.key=value ...]"
        )
    uid = argv[0]
    overrides: Dict[str, Any] = {}
    for arg in argv[1:]:
        assert arg.startswith("--") and "=" in arg, f"bad arg {arg}"
        key, val = arg[2:].split("=", 1)
        overrides[key] = val
    return uid, overrides


def main_fn(cfg, uid: str):
    from vidsitu_tpu.train.build import build_learner

    learner = build_learner(cfg, uid)
    data = learner.data

    if not (cfg.only_val or cfg.only_test or cfg.overfit_batch):
        learner.fit(epochs=cfg.train.epochs, lr=cfg.train.lr)
        if learner._preempt_requested:
            # preempted: state is checkpointed; skip final validation so
            # the process exits inside the preemption grace period (and
            # a first-epoch preemption has no best model to load yet)
            return
        if cfg.run_final_val:
            print("Running Final Validation using best model")
            learner.load_model_dict(str(learner.model_file), load_opt=False)
            val_loss, val_acc, _ = learner.validate(write_to_file=True)
            print(val_loss)
            print(val_acc)
    else:
        if cfg.overfit_batch:
            learner.overfit_batch(cfg.train.epochs, 1e-4)
        if cfg.only_val:
            val_loss, val_acc, _ = learner.validate(write_to_file=True)
            print(val_loss)
            print(val_acc)
        if cfg.only_test:
            test_loss, test_acc, _ = learner.validate(
                db={cfg.test_dl_name: data.test_dl}, write_to_file=True
            )
            print(test_loss)
            print(test_acc)


def main(argv=None):
    from vidsitu_tpu.utils.config import CfgProcessor

    # Multi-host: set VIDSITU_DISTRIBUTED=1 to join the jax.distributed
    # cluster — the DCN rendezvous replacing the reference's
    # tcp://localhost:9997 NCCL init (trn_dist_utils.py:5-42). On detected
    # clusters (TPU pods, SLURM) no further env is needed; for manual
    # launches set VIDSITU_COORD=host:port, VIDSITU_NPROCS, and
    # VIDSITU_PROC_ID per process.
    if os.environ.get("VIDSITU_DISTRIBUTED") == "1":
        if os.environ.get("VIDSITU_COORD"):
            jax.distributed.initialize(
                coordinator_address=os.environ["VIDSITU_COORD"],
                num_processes=int(os.environ["VIDSITU_NPROCS"]),
                process_id=int(os.environ["VIDSITU_PROC_ID"]),
            )
        else:
            jax.distributed.initialize()

    uid, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cp = CfgProcessor()
    cfg = cp.get_default_cfg()
    cfg = cp.pre_proc_config(cfg, overrides)
    cfg = cp.update_from_dict(cfg, overrides)
    cfg["uid"] = uid
    cfg["cmd_str"] = " ".join(sys.argv)
    cfg["num_gpus"] = jax.device_count()
    cfg.freeze()
    from vidsitu_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(cfg)
    print(CfgProcessor.to_str(cfg))
    main_fn(cfg, uid)


if __name__ == "__main__":
    main()
