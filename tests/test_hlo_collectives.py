"""HLO-inspection tests: the compiled multi-device train step must carry
the EXPECTED collective schedule, not merely produce the right numbers.

TPU-native counterpart of verifying the reference's DDP wiring
(main_dist.py:73-79 — gradient allreduce via backward hooks): here the
collectives come from XLA's SPMD partitioner, so we compile the real
train step over the 8-virtual-device mesh and assert on the optimized
HLO text:

  * pure data-parallel mesh: the gradient all-reduce exists and covers
    at least every parameter element (one reduced element per grad
    element), with NO all-gather / reduce-scatter (params replicated);
  * data x fsdp mesh: the ZeRO-3 pattern appears — all-gathers before
    parameter use and reduce-scatters on the gradients.
"""

import re

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evaluators import EvalB_Gen
from vidsitu_tpu.models.selector import (
    build_model,
    build_srl_generate_fn,
    init_model_variables,
)
from vidsitu_tpu.parallel.mesh import shard_batch
from vidsitu_tpu.train.learner import Learner
from vidsitu_tpu.utils.config import get_cfg_with_overrides

pytestmark = pytest.mark.slow

TINY = {
    "tx_dec.decoder_embed_dim": 32,
    "tx_dec.decoder_ffn_embed_dim": 64,
    "tx_dec.decoder_layers": 1,
    "tx_dec.decoder_attention_heads": 2,
    "tx_dec.encoder_embed_dim": 32,
    "tx_dec.encoder_ffn_embed_dim": 64,
    "tx_dec.encoder_layers": 1,
    "tx_dec.encoder_attention_heads": 2,
    "tx_dec.dropout": 0.0,
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("hlodata")
    paths = make_synth_dataset(root, n_train=8, n_valid=5, seed=61)
    return paths, root


def _compiled_step_text(env_, uid, mesh):
    paths, root = env_
    cfg = get_cfg_with_overrides(
        uid,
        **{
            **paths,
            **TINY,
            "task_type": "vb_arg",
            "mdl.mdl_name": "tx_only",
            "train.bs": 8,
            "train.bsv": 8,
            "train.nw": 0,
            "train.nwv": 0,
            "train.dtype": "float32",
            "misc.tmp_path": str(root / "tmp"),
        },
    )
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch, seed=7)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    learner = Learner(
        uid=cfg.uid, cfg=cfg, model=model, variables=variables, data=data,
        eval_fn=EvalB_Gen(cfg, comm, gen_fn), mesh=mesh,
    )
    learner.prepare_optimizer(1e-3)
    step = learner._build_train_step()
    params, extra = learner._split_vars()
    batch_d = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)
    lowered = step.lower(params, extra, learner.opt_state, batch_d, rng)
    txt = lowered.compile().as_text()
    n_param_elems = sum(
        int(np.asarray(p).size) for p in jax.tree.leaves(params)
    )
    return txt, n_param_elems


def _collective_elems(txt, opname):
    """Total output elements across all `opname` ops in optimized HLO.

    Matches both scalar-result and tuple-result forms, e.g.
      %ar = f32[2080]{0} all-reduce(...)
      %ar = (f32[10]{0}, f32[20]{0}) all-reduce(...)
    """
    total = 0
    count = 0
    for line in txt.splitlines():
        if f" {opname}(" not in line and f" {opname}-start(" not in line:
            continue
        lhs = line.split(f" {opname}")[0]
        shapes = re.findall(r"f32\[([0-9,]*)\]", lhs)
        if not shapes:
            continue
        count += 1
        for s in shapes:
            dims = [int(d) for d in s.split(",") if d]
            total += int(np.prod(dims)) if dims else 1
    return count, total


def test_dp_mesh_allreduces_every_grad_element(env):
    """8-way data mesh: grads all-reduce (>= one reduced element per
    parameter element); replicated params => no gather/scatter."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    txt, n_params = _compiled_step_text(env, "hlo_dp8", mesh)
    n_ar, ar_elems = _collective_elems(txt, "all-reduce")
    assert n_ar >= 1, "no gradient all-reduce in the compiled train step"
    # every grad element is reduced exactly once; the loss mean and token
    # counts add a handful more elements on top
    assert ar_elems >= n_params, (
        f"all-reduced elements {ar_elems} < parameter elements {n_params}"
    )
    # XLA should batch the per-parameter grad reductions into a small
    # number of fused all-reduces, not hundreds of tiny ones
    assert n_ar <= 16, f"{n_ar} all-reduces — grad reduction not batched"
    n_ag, _ = _collective_elems(txt, "all-gather")
    n_rs, _ = _collective_elems(txt, "reduce-scatter")
    assert n_ag == 0, "unexpected all-gather on a replicated-params mesh"
    assert n_rs == 0, "unexpected reduce-scatter on a replicated-params mesh"


def test_fsdp_mesh_has_gather_scatter_pattern(env):
    """2x4 data x fsdp mesh: ZeRO-3 collective schedule — all-gather
    (params materialized from shards before use) + reduce-scatter or
    sharded all-reduce on the grads."""
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "fsdp")
    )
    txt, n_params = _compiled_step_text(env, "hlo_fsdp", mesh)
    n_ag, ag_elems = _collective_elems(txt, "all-gather")
    assert n_ag >= 1, "no all-gather: fsdp params never materialized"
    # the gathered bytes must cover the big (sharded) parameter tensors;
    # small non-divisible leaves stay replicated so the total can be
    # slightly below n_params — demand at least half
    assert ag_elems >= n_params // 2, (
        f"all-gathered elements {ag_elems} too few for {n_params} params"
    )
    n_rs, _ = _collective_elems(txt, "reduce-scatter")
    n_ar, _ = _collective_elems(txt, "all-reduce")
    assert n_rs + n_ar >= 1, "no gradient reduction on the fsdp mesh"
