"""Shared experiment wiring: cfg -> fully-assembled Learner.

The ONE construction path for a (task, model) experiment — mesh, sharded
data, model + variables (+ pretrained weights), per-task evaluator, and
the Learner — used by the CLI (main.py), the release fit-rehearsal
(``verify_release --fit``) and tooling. Mirrors the reference's learner
assembly in main_dist.py:94-129 (get_mdl_loss_eval -> get_dl ->
Learner), made a reusable function so every entry point rehearses the
same production path.
"""

from __future__ import annotations

import jax

from ..data import get_data
from ..models.selector import (
    build_model,
    build_srl_generate_fn,
    init_model_variables,
)
from ..parallel.mesh import make_mesh
from .learner import Learner
from .pretrained import load_pretrained_variables


def build_learner(cfg, uid: str) -> Learner:
    """Assemble the full production training stack for ``cfg``.

    Returns a ready Learner whose ``data``/``eval_fn``/``mesh`` are the
    exact objects the CLI would run with (main.py delegates here).
    """
    from ..evaluation.evaluators import EvalB_Gen

    mesh = make_mesh(cfg)
    data = get_data(
        cfg,
        num_shards=jax.process_count(),
        shard_id=jax.process_index(),
    )
    comm = data.train_dl.dataset.comm
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch, seed=cfg.train.seed)
    variables = load_pretrained_variables(cfg, model, variables)

    if cfg.task_type == "vb_arg":
        gen_fn = build_srl_generate_fn(cfg, comm, model, mesh=mesh)
        eval_fn = EvalB_Gen(
            cfg, comm, gen_fn,
            split_type="valid" if not cfg.only_test else "test_srl",
            rank=jax.process_index(), world_size=jax.process_count(),
            mesh=mesh,
            # mid-run elasticity (learner.request_resize): lets the
            # evaluator rebuild the decode fn over the resized mesh
            gen_builder=lambda m: build_srl_generate_fn(
                cfg, comm, model, mesh=m
            ),
        )
    elif cfg.task_type == "vb":
        from ..evaluation.evaluators import EvalB

        eval_fn = EvalB(
            cfg, comm, model,
            split_type="valid" if not cfg.only_test else "test_verb",
            rank=jax.process_index(), world_size=jax.process_count(),
            mesh=mesh,
        )
    elif cfg.task_type == "evrel":
        from ..evaluation.evaluators import EvalB_Acc

        eval_fn = EvalB_Acc(
            cfg, comm, model,
            split_type="valid" if not cfg.only_test else "test_evrel",
            rank=jax.process_index(), world_size=jax.process_count(),
            mesh=mesh,
        )
    else:
        raise NotImplementedError(cfg.task_type)

    return Learner(
        uid=uid, cfg=cfg, model=model, variables=variables, data=data,
        eval_fn=eval_fn, mesh=mesh,
    )
