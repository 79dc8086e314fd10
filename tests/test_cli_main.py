"""CLI contract tests: drive `python main.py <uid> --key=val` end-to-end
for all three tasks, as a user (or the reference's run commands) would.

These subprocess tests catch arg-wiring/entry-point regressions that
python-API e2e tests cannot (reference surface: main_dist.py CLI).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from vidsitu_tpu.data.synth import make_synth_dataset

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

TINY_TX = [
    "--tx_dec.decoder_embed_dim=48",
    "--tx_dec.decoder_ffn_embed_dim=96",
    "--tx_dec.decoder_layers=1",
    "--tx_dec.decoder_attention_heads=2",
    "--tx_dec.encoder_embed_dim=48",
    "--tx_dec.encoder_ffn_embed_dim=96",
    "--tx_dec.encoder_layers=1",
    "--tx_dec.encoder_attention_heads=2",
]
TINY_ROB = [
    "--rob_mdl.d_model=48",
    "--rob_mdl.n_layers=1",
    "--rob_mdl.n_heads=2",
    "--rob_mdl.ffn_dim=96",
    "--rob_mdl.max_pos=130",
]
TINY_VID = [
    "--vid_mdl.resnet.depth=26",
    "--vid_mdl.crop_size=32",
    "--vid_mdl.num_frames=4",
]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    paths = make_synth_dataset(
        root, n_train=8, n_valid=4, seed=61, with_frames=True
    )
    args = [f"--{k}={v}" for k, v in paths.items()]
    return args, root


def run_cli(uid, extra, root):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # env alone is overridden by the axon sitecustomize; main.py's
    # VIDSITU_PLATFORM hook re-pins the config to cpu
    env["VIDSITU_PLATFORM"] = "cpu"
    # don't inherit the pytest session's 8-device flag: pin a device
    # count the bs=4/bsv=4 (and bs=2 preempt) configs divide
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "main.py", uid,
        "--train.epochs=1", "--train.bs=4", "--train.bsv=4",
        "--train.nw=0", "--train.nwv=0", "--debug_mode=True",
        f"--misc.tmp_path={root / 'tmp'}",
    ] + extra
    proc = subprocess.run(
        cmd, cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


def test_cli_vb_arg(env):
    args, root = env
    out = run_cli(
        "cli_vbarg",
        args + TINY_TX + [
            "--task_type=vb_arg", "--mdl.mdl_name=tx_only",
            "--gen.max_len_b=30",
        ],
        root,
    )
    assert "cider" in out
    assert (root / "tmp" / "models" / "cli_vbarg.ckpt").exists()
    assert (root / "tmp" / "predictions" / "cli_vbarg" / "valid_0.pkl").exists()


def test_cli_evrel(env):
    args, root = env
    out = run_cli(
        "cli_evrel",
        args + TINY_TX + TINY_ROB + [
            "--task_type=evrel", "--mdl.mdl_name=txe_evrel",
        ],
        root,
    )
    assert "Macro_Top_1" in out or "Top_1" in out


def test_cli_vb(env):
    args, root = env
    out = run_cli(
        "cli_vb",
        args + TINY_VID + [
            "--task_type=vb", "--mdl.mdl_name=sf_base",
        ],
        root,
    )
    assert "Per_Ev_Top_1" in out


def test_cli_sigterm_preempts_cleanly(env):
    """Send SIGTERM to a real `python main.py` run mid-training: the
    process checkpoints to {uid}.preempt.ckpt and exits 0."""
    import signal
    import time

    args, root = env
    env_vars = dict(os.environ)
    env_vars["JAX_PLATFORMS"] = "cpu"
    env_vars["VIDSITU_PLATFORM"] = "cpu"  # see run_cli comment
    env_vars["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_vars["PYTHONPATH"] = str(REPO) + os.pathsep + env_vars.get(
        "PYTHONPATH", "")
    uid = "cli_preempt"
    cmd = [
        sys.executable, "main.py", uid,
        # bs=2 -> 4 batches/epoch, so the SIGTERM (sent once "it 2"
        # logs) lands MID-first-epoch: the hard case with no best-model
        # checkpoint yet (main.py must skip run_final_val)
        "--train.epochs=500", "--train.bs=2", "--train.bsv=4",
        "--train.nw=0", "--train.nwv=0", "--debug_mode=True",
        f"--misc.tmp_path={root / 'tmp'}",
        "--task_type=vb_arg", "--mdl.mdl_name=tx_only",
        "--gen.max_len_b=20",
    ] + args + TINY_TX
    proc = subprocess.Popen(cmd, cwd=str(REPO), env=env_vars,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    ext_log = root / "tmp" / "ext_logs" / f"{uid}.txt"
    deadline = time.time() + 600
    started = False
    while time.time() < deadline:
        if ext_log.exists() and "it " in ext_log.read_text():
            started = True
            break
        if proc.poll() is not None:
            break
        time.sleep(1.0)
    assert started, (
        f"training never started; rc={proc.poll()}\n"
        + (proc.stderr.read()[-2000:] if proc.poll() is not None else "")
    )
    proc.send_signal(signal.SIGTERM)
    try:
        out, err = proc.communicate(timeout=600)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("process did not exit after SIGTERM")
    assert proc.returncode == 0, err[-2000:]
    assert (root / "tmp" / "models" / f"{uid}.preempt.ckpt").exists()
    assert "preempted" in (root / "tmp" / "txt_logs" / f"{uid}.txt").read_text()
