"""Elastic resume: checkpoints are topology-free.

A run saved under one device count / mesh shape must resume under
another (preempted 8-chip job resumed on 1 chip, or scaled up), because
both backends persist HOST values: pickle fetches to numpy before
writing (Learner._fetch_host), and the orbax backend restores every
leaf as numpy via metadata-driven RestoreArgs instead of re-attaching
the saved topology's sharding. The reference has no equivalent (a DDP
checkpoint is world-size-agnostic only because torch replicates
everything; its sampler state is not) — SURVEY §5.4.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.utils.config import get_cfg_with_overrides

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

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
    root = tmp_path_factory.mktemp("elastic")
    paths = make_synth_dataset(root, n_train=8, n_valid=5, seed=61)
    return paths, root


def mk(env_, uid, **kw):
    paths, root = env_
    return get_cfg_with_overrides(
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
            **kw,
        },
    )


def _make_learner(cfg, mesh):
    from vidsitu_tpu.data import build_comm, get_data
    from vidsitu_tpu.evaluation.evaluators import EvalB_Gen
    from vidsitu_tpu.models.selector import (
        build_model,
        build_srl_generate_fn,
        init_model_variables,
    )
    from vidsitu_tpu.train.learner import Learner

    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch, seed=7)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    evalb = EvalB_Gen(cfg, comm, gen_fn)
    return Learner(
        uid=cfg.uid, cfg=cfg, model=model, variables=variables, data=data,
        eval_fn=evalb, mesh=mesh,
    )


def _mesh8():
    return Mesh(
        np.asarray(jax.devices()).reshape(2, 4), ("data", "fsdp")
    )


def _mesh1():
    return Mesh(np.asarray(jax.devices()[:1]), ("data",))


def _elastic_roundtrip(env, backend, save_mesh, resume_mesh, tag):
    """Save after 2 steps under save_mesh, resume under resume_mesh for
    2 more; must match an uninterrupted 4-step run on resume_mesh
    (same init seed, same batch; restored RNG makes the dropout/rng
    stream line up exactly)."""
    lr = 1e-3
    kw = {"train.ckpt_backend": backend}

    la = _make_learner(mk(env, f"el_{tag}_a", **kw), save_mesh)
    la.overfit_batch(2, lr)
    la.save_model_dict()
    la.ckpt_backend.wait()
    ckpt = la.model_file

    lb = _make_learner(mk(env, f"el_{tag}_b", **kw), resume_mesh)
    lb.load_model_dict(str(ckpt), load_opt=True)
    assert lb.num_it == 0  # overfit_batch does not tick num_it
    lb.overfit_batch(2, lr)

    lc = _make_learner(mk(env, f"el_{tag}_c", **kw), resume_mesh)
    lc.overfit_batch(4, lr)

    for a, b in zip(
        jax.tree.leaves(lb.variables["params"]),
        jax.tree.leaves(lc.variables["params"]),
    ):
        # cross-device reduction order differs between mesh shapes:
        # allow fp noise only
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4
        )


def test_midrun_resize(env):
    """Mid-run elasticity: request_resize rebuilds the mesh + jitted step
    at the epoch boundary and training CONTINUES in-process (no restart,
    no checkpoint). Epoch 1 runs on the 2x4 data+fsdp mesh, epoch 2 on a
    4-device data mesh; the final params must match an uninterrupted
    same-seed 2-epoch run on the original mesh to fp-reduction noise."""
    la = _make_learner(mk(env, "rsz_a"), _mesh8())
    la.request_resize(4)  # applied after epoch 1 completes
    la.fit(2, 1e-3)
    assert dict(la.mesh.shape) == {"data": 4}
    # the evaluator retargeted too (epoch 2's validation already ran
    # over the resized mesh inside fit)
    assert la.eval_fn.mesh is la.mesh
    assert "elastic resize" in la.txt_log_file.read_text()

    lb = _make_learner(mk(env, "rsz_b"), _mesh8())
    lb.fit(2, 1e-3)

    for a, b in zip(
        jax.tree.leaves(la.variables["params"]),
        jax.tree.leaves(lb.variables["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_elastic_shrink_pickle(env):
    """8-device {data:2, fsdp:4} checkpoint resumes on 1 device."""
    _elastic_roundtrip(env, "pickle", _mesh8(), _mesh1(), "shr_p")


def test_elastic_grow_pickle(env):
    """1-device checkpoint resumes on the 8-device FSDP mesh."""
    _elastic_roundtrip(env, "pickle", _mesh1(), _mesh8(), "gro_p")


def test_elastic_shrink_orbax(env):
    """Orbax checkpoint written under the FSDP mesh resumes on 1
    device: the restore must come back as host numpy, not arrays
    pinned to the saved sharding."""
    _elastic_roundtrip(env, "orbax", _mesh8(), _mesh1(), "shr_o")


CHILD_SAVE = """
import sys; sys.path.insert(0, {repo!r})
import jax, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from vidsitu_tpu.train.checkpoint import OrbaxBackend

assert jax.device_count() == 4, jax.devices()
mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ("data", "fsdp"))
params = {{
    "w": jax.device_put(
        np.arange(8 * 16, dtype=np.float32).reshape(8, 16),
        NamedSharding(mesh, P("fsdp", None)),
    ),
    "b": jax.device_put(
        np.arange(16, dtype=np.float32), NamedSharding(mesh, P())
    ),
}}
be = OrbaxBackend()
be.save({path!r}, params, {{}}, None,
        {{"num_it": 7, "num_epoch": 2, "rng": [1, 2]}})
be.wait()
print("SAVED")
"""

CHILD_LOAD = """
import sys; sys.path.insert(0, {repo!r})
import jax, numpy as np
from vidsitu_tpu.train.checkpoint import OrbaxBackend

assert jax.device_count() == 2, jax.devices()
be = OrbaxBackend()
loaded = be.load({path!r})
assert loaded is not None
target = {{
    "w": np.zeros((8, 16), np.float32),
    "b": np.zeros((16,), np.float32),
}}
params = be.restore_params(target, loaded)
np.testing.assert_array_equal(
    params["w"], np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
)
np.testing.assert_array_equal(
    params["b"], np.arange(16, dtype=np.float32)
)
assert not isinstance(params["w"], jax.Array) or \\
    params["w"].is_fully_addressable
assert loaded["meta"]["num_it"] == 7 and loaded["meta"]["num_epoch"] == 2
print("LOADED")
"""


def test_orbax_restore_across_device_counts(tmp_path):
    """The honest elastic case: the checkpoint's saved topology (4
    devices) does NOT exist in the restoring process (2 devices).
    Restoring must not try to re-attach the recorded sharding."""
    ckpt = str(tmp_path / "elastic.ckpt")

    def run(code, ndev):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={ndev}"
        )
        env.pop("PYTHONPATH", None)
        return subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=str(REPO),
            capture_output=True, text=True, timeout=600,
        )

    p = run(CHILD_SAVE.format(repo=str(REPO), path=ckpt), 4)
    assert p.returncode == 0 and "SAVED" in p.stdout, p.stderr[-3000:]
    p = run(CHILD_LOAD.format(repo=str(REPO), path=ckpt), 2)
    assert p.returncode == 0 and "LOADED" in p.stdout, p.stderr[-3000:]


def test_midrun_resize_rejects_indivisible_eval_batch(env):
    """A resize whose device count does not divide bsv must fail AT the
    resize (precise message), not deep inside the next validation."""
    cfg = mk(env, "rsz_bad", **{"train.bsv": 4})
    la = _make_learner(cfg, _mesh8())
    la.request_resize(8)  # train bs=8 divides 8, eval bsv=4 does not
    with pytest.raises(AssertionError, match="eval batch"):
        la.fit(2, 1e-3)
