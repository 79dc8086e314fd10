"""Training engine: the Learner (reference: utils/trn_utils.py:315-939).

Same lifecycle as the reference — log-dir scaffolding, resume, fit with
per-epoch validate + best-metric checkpointing, overfit-batch sanity —
re-designed around one jit-compiled, mesh-sharded train step:

  * params/optimizer replicated, batch sharded on the data axis; XLA
    inserts the gradient all-reduce (replaces DDP backward hooks);
  * optax Adam(0.9, 0.99) (main_dist.py:50);
  * checkpoints via flax serialization with the reference's metadata
    payload (model/opt/num_it/num_epoch/cfgtxt/best_met,
    trn_utils.py:708-724).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import (
    data_extent,
    data_sharded,
    globalize_replicated,
    make_mesh,
    prefetch_to_device,
    replicated,
    shard_batch,
)
from ..utils.config import CfgProcessor


class SmoothenDict:
    """EMA(0.9) loss smoothing with bias correction
    (trn_utils.py:132-181)."""

    def __init__(self, keys, beta: float = 0.9):
        self.beta = beta
        self.keys = list(keys)
        self.n = 0
        self.mov = {k: 0.0 for k in self.keys}
        self.smooth = {k: 0.0 for k in self.keys}

    def add_value(self, vals: Dict[str, float]):
        self.n += 1
        for k in self.keys:
            self.mov[k] = self.beta * self.mov[k] + (1 - self.beta) * float(
                vals[k]
            )
            self.smooth[k] = self.mov[k] / (1 - self.beta**self.n)


def good_format_stats(names, stats) -> str:
    # .get: a scorer that omits a metric must log 0, not crash the
    # epoch's logging (same guard as the fit loop's met0 read)
    return " ".join(
        f"{k}: {float(stats.get(k, 0.0)):.4f}" for k in names
    )


class Learner:
    def __init__(
        self,
        uid: str,
        cfg,
        model,
        variables: Dict[str, Any],
        data,
        eval_fn,
        loss_keys=("loss",),
        mesh=None,
    ):
        self.uid = uid
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.data = data
        self.eval_fn = eval_fn
        self.loss_keys = list(loss_keys)
        self.mesh = mesh if mesh is not None else make_mesh(cfg)
        self.num_it = 0
        self.num_epoch = 0
        self.best_met = None
        self.best_epoch = 0  # epoch of the last best-model save
        self.opt_state = None
        self.optimizer = None
        self.plateau_wait = 0
        self._pending_opt = None  # stashed backend payload (load-before-fit)
        self._pending_lr = None
        self._preempt_requested = False
        self._pending_resize = None  # mid-run elasticity (request_resize)
        self._stale_preempt = None  # consumed preempt ckpt, deleted on next save
        from .checkpoint import get_backend

        self.ckpt_backend = get_backend(cfg.train.ckpt_backend)
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        from .pretrained import make_freeze_mask

        self._grad_mask = make_freeze_mask(cfg, self.variables["params"])
        # each process's loader shard must split over its LOCAL share of
        # the DP extent (batch shards over the data AND fsdp axes —
        # parallel/mesh.data_sharded; a 'model' axis replicates the batch)
        dp_extent = data_extent(self.mesh)
        nproc = jax.process_count()
        # the data(+fsdp) extent must PARTITION the process set: with
        # dp_extent < nproc (e.g. a cross-host pure-model mesh) every
        # host feeds its own loader shard into a dim-0 spec that XLA
        # treats as replicated — divergent "global" batches, silently
        # wrong gradients. Reject the config instead.
        assert dp_extent % nproc == 0, (
            f"mesh data*fsdp extent {dp_extent} does not partition "
            f"{nproc} processes — every host must own at least one "
            f"whole batch shard (add data/fsdp ways or fewer hosts)"
        )
        local_dp = dp_extent // nproc
        assert data.train_dl.batch_size % max(local_dp, 1) == 0, (
            f"per-process batch {data.train_dl.batch_size} must be divisible "
            f"by this process's {local_dp}-way share of the mesh's "
            f"{dp_extent}-way data parallelism"
        )
        self.init_log_dirs()
        self.prepare_log_file()
        if cfg.train.resume:
            resume_path = cfg.train.resume_path
            if not resume_path:
                # prefer a preemption checkpoint (current state, newer)
                # over the best-model file
                resume_path = str(
                    self.preempt_file
                    if self.preempt_file.exists()
                    else self.model_file
                )
            self.load_model_dict(
                resume_path=resume_path, load_opt=cfg.train.load_opt
            )
            if resume_path == str(self.preempt_file):
                # consumed — but keep the file until the FIRST subsequent
                # successful save: if the resumed run dies hard (OOM, kill
                # -9) before saving anything, the next resume must still
                # see this state rather than silently falling back to the
                # older best-model file. save_model_dict deletes it.
                self._stale_preempt = self.preempt_file

    # -- scaffolding (trn_utils.py:433-478) -----------------------------------
    def init_log_dirs(self):
        tmp = Path(self.cfg.misc.tmp_path)
        self.txt_log_file = tmp / "txt_logs" / f"{self.uid}.txt"
        self.extra_logger_file = tmp / "ext_logs" / f"{self.uid}.txt"
        self.model_file = tmp / "models" / f"{self.uid}.ckpt"
        # preemption state saves separately so it never clobbers the
        # best-model checkpoint at model_file
        self.preempt_file = tmp / "models" / f"{self.uid}.preempt.ckpt"
        self.model_epoch_dir = tmp / "model_epochs" / self.uid
        self.predictions_dir = tmp / "predictions" / self.uid
        for p in (
            self.txt_log_file.parent,
            self.extra_logger_file.parent,
            self.model_file.parent,
            self.predictions_dir,
        ):
            p.mkdir(parents=True, exist_ok=True)
        self.logger = logging.getLogger(f"vidsitu_tpu.{self.uid}")
        self.logger.setLevel(logging.DEBUG)
        if not self.logger.handlers:
            fh = logging.FileHandler(self.extra_logger_file)
            sh = logging.StreamHandler(sys.stdout)
            sh.setLevel(logging.INFO)
            self.logger.addHandler(fh)
            self.logger.addHandler(sh)

    @property
    def _is_main(self) -> bool:
        return jax.process_index() == 0

    def prepare_log_file(self):
        # txt log is a rank-0-only side effect (ref exec_func_if_main_proc,
        # trn_utils.py:124-129): on a shared tmp_path every rank appending
        # would interleave lines
        if not self._is_main:
            return
        with open(self.txt_log_file, "a") as f:
            f.write(CfgProcessor.to_str(self.cfg))
            f.write("\n\n")

    def update_log_file(self, line: str):
        if not self._is_main:
            return
        with open(self.txt_log_file, "a") as f:
            f.write(line + "\n")

    # -- step compilation ---------------------------------------------------------
    def prepare_optimizer(self, lr: float):
        """Adam(0.9, 0.99) + optional gradient accumulation, with the lr
        injected as a mutable hyperparameter (for reduce-on-plateau)."""
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.99)
        )(learning_rate=lr)
        accum = int(self.cfg.train.grad_accum)
        if accum > 1:
            base = optax.MultiSteps(base, every_k_schedule=accum)
        self.optimizer = base
        self._grad_accum = accum
        self._lr = lr
        self.opt_state = self.optimizer.init(self.variables["params"])
        if self._pending_opt is not None:
            # consume optimizer state stashed by load_model_dict(load_opt=True)
            # — the reference restores optimizer+scheduler on resume
            # (trn_utils.py:676-706)
            self.opt_state = self.ckpt_backend.restore_opt(
                self.opt_state, self._pending_opt
            )
            self._pending_opt = None
            restored_lr = self._pending_lr
            if restored_lr is None:
                hp = (
                    self.opt_state.inner_opt_state.hyperparams
                    if accum > 1
                    else self.opt_state.hyperparams
                )
                restored_lr = float(hp["learning_rate"])
            self._set_lr(restored_lr)
            self._pending_lr = None
            self.logger.info("restored optimizer state (lr=%.2e)", self._lr)

    def _set_lr(self, lr: float):
        self._lr = lr
        state = self.opt_state
        if self._grad_accum > 1:
            state.inner_opt_state.hyperparams["learning_rate"] = (
                jnp.asarray(lr, jnp.float32)
            )
        else:
            state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def _build_train_step(self) -> Callable:
        model = self.model
        optimizer = self.optimizer
        repl = replicated(self.mesh)
        datash = data_sharded(self.mesh)
        # ZeRO-3-style FSDP when the mesh has an 'fsdp' axis
        # (cfg.tpu.mesh_shape [-1, N] + mesh_axis_names ['data','fsdp']):
        # params + Adam moments sharded per param_shardings, XLA inserts
        # the all-gather/reduce-scatter pattern
        from ..parallel.mesh import param_shardings

        p_sh = param_shardings(self.mesh, self.variables["params"])
        opt_sh = param_shardings(self.mesh, self.opt_state)
        # non-param collections (e.g. BatchNorm batch_stats) are threaded
        # through the step and updated mutably
        extra_cols = [k for k in self.variables if k != "params"]
        grad_mask = self._grad_mask

        def train_step(params, extra, opt_state, batch, rng):
            def loss_fn(p):
                if extra_cols:
                    out, new_extra = model.apply(
                        {"params": p, **extra},
                        batch,
                        deterministic=False,
                        rngs={"dropout": rng},
                        mutable=extra_cols,
                    )
                    return out["loss"], new_extra
                out = model.apply(
                    {"params": p},
                    batch,
                    deterministic=False,
                    rngs={"dropout": rng},
                )
                return out["loss"], {}

            (loss, new_extra), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            if grad_mask is not None:
                grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
            updates, opt_state = optimizer.update(updates=grads,
                                                  state=opt_state,
                                                  params=params)
            params = optax.apply_updates(params, updates)
            return params, new_extra, opt_state, loss

        # donate params/extra/opt_state: they are consumed and re-emitted
        # every step, so XLA can update in place instead of double-buffering
        # the whole optimizer state in HBM
        return jax.jit(
            train_step,
            in_shardings=(p_sh, repl, opt_sh, datash, repl),
            out_shardings=(p_sh, repl, opt_sh, repl),
            donate_argnums=(0, 1, 2),
        )

    def _split_vars(self):
        params = self.variables["params"]
        extra = {k: v for k, v in self.variables.items() if k != "params"}
        return params, extra

    def _ensure_global(self):
        """Multi-process: lift host-local variables/opt_state to global
        replicated arrays before they enter a mesh-sharded jit."""
        import jax as _jax

        if _jax.process_count() <= 1:
            return
        self.variables = globalize_replicated(self.variables, self.mesh)
        if self.opt_state is not None:
            self.opt_state = globalize_replicated(self.opt_state, self.mesh)

    def _install_preempt_handler(self):
        """SIGTERM -> finish the in-flight step (single process) or the
        in-flight epoch (multi-process), checkpoint, exit cleanly
        (cfg.train.handle_preemption). Returns a restore callable; no-op
        outside the main thread or when disabled.

        Multi-process: ranks may observe the signal at different
        iterations (or only SOME ranks may receive it at all), and
        breaking mid-epoch on one rank would desync the collective train
        step — so the flag is only honored at the epoch boundary, which
        every rank reaches in lockstep, and fit() all-reduces it there
        (_sync_preempt_flag) so every rank takes the same branch even
        under partial signal delivery. Works with either backend; the
        collective orbax save then runs on all ranks as required."""
        import signal

        self._preempt_requested = False  # clear any stale flag
        if not getattr(self.cfg.train, "handle_preemption", True):
            return lambda: None
        try:
            prev = signal.getsignal(signal.SIGTERM)

            def _on_term(signum, frame):
                # flag only: logging/stream IO is not reentrant-safe
                # inside a signal handler
                self._preempt_requested = True

            signal.signal(signal.SIGTERM, _on_term)
            return lambda: signal.signal(signal.SIGTERM, prev)
        except ValueError:  # not the main thread
            return lambda: None

    def _sync_preempt_flag(self) -> bool:
        """Global OR of the preempt flag across processes. Called at the
        epoch boundary so that if ANY rank observed SIGTERM, every rank
        takes the checkpoint-and-exit branch together — otherwise the
        signaled rank would return from fit() while un-signaled ranks
        proceed into validate()'s collectives and hang."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(self._preempt_requested, np.int32)
            )
            self._preempt_requested = bool(np.max(flags))
        return self._preempt_requested

    # -- mid-run elasticity (beyond reference parity; SURVEY §5.3 says the
    # reference has none) -----------------------------------------------------
    def request_resize(self, n_devices: int):
        """Ask the training loop to rebuild the mesh over ``n_devices``
        at the next epoch boundary — mid-run elasticity: shrink off a
        cordoned chip or grow into freed ones WITHOUT a restart. The
        cross-process analog (process count changes) is the topology-free
        checkpoint restart (tests/test_elastic_resume.py)."""
        self._pending_resize = int(n_devices)

    def _apply_resize(self):
        """Rebuild mesh + jitted step over the requested device count and
        re-shard the live training state (params, Adam moments, BN stats).
        Returns the new train_step. In-process only: the device pool is
        jax.devices() as initialized."""
        n, self._pending_resize = self._pending_resize, None
        assert jax.process_count() <= 1, (
            "mid-run resize is single-process (in-process device pool); "
            "for process-count changes use the topology-free checkpoint "
            "restart (tests/test_elastic_resume.py)"
        )
        devices = jax.devices()[:n]
        assert len(devices) == n, (
            f"elastic resize to {n} devices, but only "
            f"{len(jax.devices())} visible"
        )
        try:
            new_mesh = make_mesh(self.cfg, devices=devices)
        except AssertionError:
            # the configured mesh shape doesn't tile n devices (e.g.
            # fsdp=4 but n=6): fall back to pure data parallelism
            from jax.sharding import Mesh as _Mesh

            new_mesh = _Mesh(np.asarray(devices), ("data",))
        dp_extent = data_extent(new_mesh)
        assert dp_extent % jax.process_count() == 0, (
            f"resized mesh data*fsdp extent {dp_extent} does not "
            f"partition {jax.process_count()} processes"
        )
        local_dp = max(dp_extent // jax.process_count(), 1)
        assert self.data.train_dl.batch_size % local_dp == 0, (
            f"per-process batch {self.data.train_dl.batch_size} is not "
            f"divisible by the resized mesh's {local_dp}-way local share"
        )
        # fail HERE, not deep inside the next validation's batch-placement
        # assert (the evaluator is rebound to the same mesh below).
        # The divisor is the data(+fsdp) extent, NOT the device count:
        # a 'model' axis replicates the batch (tensor parallelism)
        bsv = getattr(getattr(self.data, "valid_dl", None), "batch_size", None)
        assert bsv is None or bsv % local_dp == 0, (
            f"eval batch {bsv} is not divisible by the resized mesh's "
            f"{local_dp}-way local data-parallel share; pick a "
            f"compatible n_devices or bsv"
        )
        # pull the live state to host; the rebuilt jit's in_shardings
        # re-shard it on entry (the old buffers were step outputs laid
        # out for the old mesh)
        self.variables = jax.device_get(self.variables)
        if self.opt_state is not None:
            self.opt_state = jax.device_get(self.opt_state)
        old = dict(self.mesh.shape)
        self.mesh = new_mesh
        # the evaluator cached jits over the OLD mesh at construction;
        # retarget it too, or post-shrink validation would still touch
        # the devices the run just moved off of
        rebind = getattr(self.eval_fn, "rebind_mesh", None)
        if callable(rebind):
            rebind(new_mesh)
        self.logger.info(
            "elastic resize: mesh %s -> %s", old, dict(new_mesh.shape)
        )
        self.update_log_file(
            f"elastic resize at epoch {self.num_epoch}: "
            f"{old} -> {dict(new_mesh.shape)}"
        )
        return self._build_train_step()

    def _own_buffers(self):
        """Copy caller-provided variables once before training: the jitted
        train step donates params/extra, which would otherwise delete the
        arrays the caller still holds (e.g. the ``variables`` passed to
        ``Learner(...)``). After the first step every buffer is a step
        output the learner owns, so one copy up front suffices."""
        self.variables = jax.tree.map(
            lambda x: x.copy() if hasattr(x, "copy") else x, self.variables
        )

    # -- training loop (trn_utils.py:583-628,788-867) ------------------------------
    def train_epoch(self, train_step, smoother: SmoothenDict) -> Dict[str, float]:
        dl = self.data.train_dl
        dl.set_epoch(self.num_epoch)
        params, extra = self._split_vars()
        losses = []
        profiling = self.cfg.tpu.profile and self.num_epoch == 0
        prof_started = False
        prof_dir = str(Path(self.cfg.misc.tmp_path) / "profile" / self.uid)

        def consume(pending_loss, pending_it):
            # host fetch of a PREVIOUS step's loss: by the time we block
            # here, the next step has already been dispatched, so the
            # device never idles waiting for the host round-trip (one
            # step of EMA/NaN-log latency, same values)
            lossf = float(pending_loss)
            if np.isnan(lossf):
                self.logger.info("Nan loss at iteration %d", pending_it)
            losses.append(lossf)
            # the jitted step emits ONE scalar; the head key carries it
            # and any extra loss_keys smooth zeros (SmoothenDict
            # iterates every key, so a partial dict would KeyError)
            smoother.add_value(
                {k: lossf if i == 0 else 0.0
                 for i, k in enumerate(self.loss_keys)}
            )
            if pending_it % max(self.cfg.log.deb_it, 1) == 0:
                self.logger.debug(
                    "it %d loss %.4f smooth %.4f",
                    pending_it, lossf, smoother.smooth[self.loss_keys[0]],
                )

        pending = None  # (loss device array, its iteration number)
        # device transfers of batch k+1 overlap with the compute of batch
        # k (prefetch_to_device); host-side decode overlaps via the
        # loader's own prefetch threads. Frame tensors fold (B,5,...) ->
        # (B*5,...) on the host — in-graph the fold materializes a copy
        # (data/loader.fold_frame_events)
        from ..data.loader import fold_frame_events

        folded = (fold_frame_events(b) for b in dl)
        for bix, batch in enumerate(prefetch_to_device(folded, self.mesh)):
            if profiling and bix == 1:
                jax.profiler.start_trace(prof_dir)
                prof_started = True
            self.rng, step_rng = jax.random.split(self.rng)
            params, extra, self.opt_state, loss = train_step(
                params, extra, self.opt_state, batch, step_rng
            )
            if prof_started and bix == self.cfg.tpu.profile_steps:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                prof_started = False
                profiling = False
                self.logger.info("profiler trace written to %s", prof_dir)
            self.num_it += 1
            if pending is not None:
                consume(*pending)
            pending = (loss, self.num_it)
            if self._preempt_requested and jax.process_count() <= 1:
                # preemption notice (SIGTERM): stop after this completed
                # step; fit() checkpoints the synced state below.
                # Multi-process honors the flag only at the epoch
                # boundary (see _install_preempt_handler).
                self.logger.info(
                    "preemption requested; stopping epoch at it %d",
                    self.num_it,
                )
                break
        if pending is not None:
            consume(*pending)
        if prof_started:  # epoch shorter than profile window
            jax.profiler.stop_trace()
        self.variables = dict(extra, params=params)
        return {"loss": float(np.mean(losses)) if losses else float("nan")}

    def validate(self, db: Optional[Dict] = None, write_to_file: bool = False):
        self._ensure_global()
        if db is None:
            db = {self.cfg.val_dl_name: self.data.valid_dl}
        out_loss, out_acc = {}, {}
        for dl_name, dl in db.items():
            loss, acc = self.eval_fn(
                self.variables, dl, dl_name,
                pred_path=self.predictions_dir,
            )
            out_loss.update(loss)
            out_acc.update(acc)
        if write_to_file:
            # reference parity (trn_utils.py:568-578): write_to_file
            # persists the validation stats line to the txt log —
            # prediction pkls are written by the evaluator regardless,
            # exactly as the reference's eval_fn does
            keys = ["epochs"] + list(out_loss) + list(out_acc)
            vals = [str(self.num_epoch)] + [
                f"{float(v):.4f}"
                for v in list(out_loss.values()) + list(out_acc.values())
            ]
            self.update_log_file("  ".join(keys))
            self.update_log_file("  ".join(vals))
        return out_loss, out_acc, {}

    def fit(self, epochs: int, lr: float):
        from .tracking import Tracker
        from ..utils.config import CfgProcessor as _CP

        self.prepare_optimizer(lr)
        self._ensure_global()
        self._own_buffers()
        train_step = self._build_train_step()
        smoother = SmoothenDict(self.loss_keys)
        met_keys = self.eval_fn.met_keys
        hdr = ["epochs", "trn_loss", "val_loss"] + list(met_keys)
        self.update_log_file("  ".join(hdr))
        st_time = time.time()
        tracker = Tracker(self.cfg, self.uid, enabled=self._is_main)
        tracker.log_params(_CP.cfg_to_flat_dct(self.cfg))
        restore_sig = self._install_preempt_handler()
        try:
            for _ep in range(epochs):
                ep_start = time.time()
                trn_loss = self.train_epoch(train_step, smoother)
                if self._sync_preempt_flag():
                    # preemption (SIGTERM): checkpoint the full state
                    # (model + optimizer + counters) to the dedicated
                    # preempt file (never clobbering the best model at
                    # model_file) so re-running the same uid resumes,
                    # then exit cleanly. Beyond reference parity (it has
                    # no preemption handling, SURVEY §5.3) — preemptible
                    # TPU fleets need it.
                    self.save_model_dict(self.preempt_file)
                    self.update_log_file(
                        f"preempted at epoch {self.num_epoch} "
                        f"it {self.num_it}; checkpoint saved"
                    )
                    self.logger.info(
                        "preempted: checkpoint saved to %s; re-run uid "
                        "%s to resume", self.preempt_file, self.uid,
                    )
                    tracker.end_run()
                    self.ckpt_backend.wait()
                    return
                val_loss, val_acc, _ = self.validate()
                if jax.process_count() > 1:
                    # rank 0 alone computed the real metrics (evaluators
                    # merge + score on host 0; other ranks return zeros,
                    # like the reference). Broadcast so the improved/
                    # plateau/save decisions below agree on EVERY rank —
                    # divergence would hang the collective orbax save
                    # (rank 0 skips it while others wait) or silently
                    # split the plateau LR across hosts.
                    from jax.experimental import multihost_utils

                    keys = list(met_keys)  # rank-invariant key set
                    vec = np.asarray(
                        [float(val_acc.get(k, 0.0)) for k in keys]
                        + [float(val_loss.get("loss", 0.0))],
                        np.float32,
                    )
                    vec = np.asarray(
                        multihost_utils.broadcast_one_to_all(vec)
                    )
                    val_acc = {
                        **val_acc,
                        **{k: float(v) for k, v in zip(keys, vec)},
                    }
                    val_loss = dict(val_loss, loss=float(vec[-1]))
                self.num_epoch += 1
                # .get: a scorer that fails to produce the headline key
                # must log a zero epoch, not KeyError away the training
                # epoch (the multi-process branch already guards this)
                met0 = float(val_acc.get(met_keys[0], 0.0))
                # STRICT >: a tie is not an improvement (reference
                # trn_utils.py:825 `best_met < met`); counting ties as
                # improvements would reset plateau_wait every epoch and
                # starve reduce-on-plateau on quantized metrics
                improved = self.best_met is None or met0 > self.best_met
                if improved:
                    self.best_met = met0
                    self.best_epoch = self.num_epoch
                    self.save_model_dict()
                    self.plateau_wait = 0
                elif self.cfg.train.use_reduce_lr_plateau:
                    self.plateau_wait += 1
                    if self.plateau_wait >= self.cfg.train.plateau_patience:
                        self._set_lr(self._lr * self.cfg.train.plateau_factor)
                        self.plateau_wait = 0
                        self.logger.info("plateau: lr -> %.2e", self._lr)
                tracker.log_metrics(
                    {
                        "trn_loss": trn_loss["loss"],
                        "val_loss": float(val_loss.get("loss", 0.0)),
                        "lr": self._lr,
                        **{k: float(v) for k, v in val_acc.items()},
                    },
                    step=self.num_epoch,
                )
                if self.cfg.train.save_mdl_epochs:
                    self.model_epoch_dir.mkdir(parents=True, exist_ok=True)
                    self.save_model_dict(
                        self.model_epoch_dir / f"mdl_ep_{self.num_epoch}.ckpt"
                    )
                row = (
                    f"{self.num_epoch}  "
                    f"{trn_loss['loss']:.4f}  "
                    f"{float(val_loss.get('loss', 0.0)):.4f}  "
                    + good_format_stats(met_keys, val_acc)
                )
                self.update_log_file(row)
                self.logger.info(
                    "epoch %d done in %.1fs: %s",
                    self.num_epoch, time.time() - ep_start, row,
                )
                if self._pending_resize:
                    # mid-run elasticity: rebuild the mesh + step at the
                    # epoch boundary (request_resize)
                    train_step = self._apply_resize()
        except Exception as e:
            # reference logs on exception, then re-checks best-vs-last in a
            # finally block (trn_utils.py:851-867); here that re-check is
            # subsumed: every improving epoch saves IMMEDIATELY after its
            # validation, so at any exception the best model is already on
            # disk — nothing additional to save
            self.update_log_file(f"exited due to exception {e!r}")
            self.update_log_file(f"elapsed {time.time() - st_time:.1f}s")
            tracker.end_run()
            self.ckpt_backend.wait()
            raise
        finally:
            restore_sig()
        self.update_log_file(f"epochs done. elapsed {time.time() - st_time:.1f}s")
        tracker.log_artifact(self.txt_log_file)
        tracker.end_run()
        self.ckpt_backend.wait()  # flush any in-flight async save

    def overfit_batch(self, epochs: int, lr: float):
        """Single-batch convergence sanity (trn_utils.py:915-939)."""
        self.prepare_optimizer(lr)
        self._ensure_global()
        self._own_buffers()
        train_step = self._build_train_step()
        from ..data.loader import fold_frame_events

        batch = shard_batch(
            fold_frame_events(next(iter(self.data.train_dl))), self.mesh
        )
        params, extra = self._split_vars()
        losses = []
        for _ in range(epochs):
            self.rng, step_rng = jax.random.split(self.rng)
            params, extra, self.opt_state, loss = train_step(
                params, extra, self.opt_state, batch, step_rng
            )
            losses.append(float(loss))
            self.logger.info("overfit loss %.5f", losses[-1])
        self.variables = dict(extra, params=params)
        return losses

    # -- checkpointing (trn_utils.py:631-749) ---------------------------------------
    def _fetch_host(self, tree):
        """Device tree -> host values on every rank. COLLECTIVE when a
        leaf is sharded across processes (multi-process FSDP): rank 0
        alone cannot address remote shards, so all ranks gather
        together before the rank-0 write. Host-side leaves pass
        through; the result is topology-free (elastic restarts resume
        it on any device count)."""
        if tree is None:
            return None
        from jax.experimental import multihost_utils as mhu

        def f(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                if x.is_fully_replicated:
                    return np.asarray(x)
                return np.asarray(mhu.process_allgather(x, tiled=True))
            return x

        return jax.tree.map(f, tree)

    def save_model_dict(self, path: Optional[Path] = None):
        params = self.variables["params"]
        extra = {k: v for k, v in self.variables.items() if k != "params"}
        opt_state = self.opt_state
        if not self.ckpt_backend.collective:
            # pickle saves are a rank-0-only side effect (ref
            # exec_func_if_main_proc) — but the gather off the devices
            # must run on EVERY rank first when params/opt shards live
            # on other processes. Orbax saves are themselves collective
            # (every rank participates in the commit barrier) and
            # consume sharded device arrays natively.
            params = self._fetch_host(params)
            extra = self._fetch_host(extra)
            opt_state = self._fetch_host(opt_state)
            if jax.process_index() != 0:
                return
        path = Path(path) if path else self.model_file
        meta = {
            "num_it": self.num_it,
            "num_epoch": self.num_epoch,
            "cfgtxt": json.dumps(self.cfg.to_dict()),
            "best_met": self.best_met,
            # plateau-scheduler state (ref scheduler_state_dict,
            # trn_utils.py:712-716)
            "scheduler_state_dict": {
                "plateau_wait": self.plateau_wait,
                "lr": getattr(self, "_lr", None),
            },
            # rng for bit-exact dropout resume (over-delivery: the torch
            # reference does not persist RNG)
            "rng": np.asarray(self.rng).tolist(),
        }
        self.ckpt_backend.save(path, params, extra, opt_state, meta)
        if self._stale_preempt is not None and path == self.model_file:
            # a newer checkpoint now exists AT A PATH RESUME ACTUALLY
            # READS (resume looks at preempt_file then model_file, never
            # the per-epoch dir), so the consumed preempt state is
            # finally safe to drop. Backend-mediated delete (orbax ckpts
            # are directories); rank-0-only to avoid cross-rank races.
            stale, self._stale_preempt = self._stale_preempt, None
            if jax.process_index() == 0:
                self.ckpt_backend.delete(stale)

    def load_model_dict(self, resume_path: str, load_opt: bool = False):
        loaded = self.ckpt_backend.load(resume_path)
        if loaded is None:
            self.logger.info(
                "no checkpoint at %s; starting fresh", resume_path
            )
            return
        params = self.ckpt_backend.restore_params(
            self.variables["params"], loaded
        )
        extra = {k: v for k, v in self.variables.items() if k != "params"}
        if extra:
            extra = self.ckpt_backend.restore_extra(extra, loaded)
        self.variables = dict(extra, params=params)
        meta = loaded["meta"]
        self.num_it = meta.get("num_it", 0)
        self.num_epoch = meta.get("num_epoch", 0)
        self.best_met = meta.get("best_met", None)
        if meta.get("rng") is not None:
            self.rng = jnp.asarray(meta["rng"], dtype=jnp.uint32)
        if load_opt and self.ckpt_backend.has_opt(loaded):
            sched = meta.get("scheduler_state_dict") or {}
            self.plateau_wait = int(sched.get("plateau_wait", 0))
            if self.opt_state is None and self.optimizer is None:
                # optimizer is created at fit() time; prepare_optimizer
                # consumes this stash (ref restores in load_model_dict,
                # trn_utils.py:703-706)
                self._pending_opt = loaded
                self._pending_lr = sched.get("lr")
            else:
                self.opt_state = self.ckpt_backend.restore_opt(
                    self.opt_state, loaded
                )
                if sched.get("lr") is not None:
                    self._set_lr(float(sched["lr"]))
        self.logger.info(
            "resumed from %s at epoch %d it %d",
            resume_path, self.num_epoch, self.num_it,
        )
