"""Preemption tolerance: SIGTERM -> checkpoint + clean stop + exact resume.

TPU pods are preempted with SIGTERM (maintenance events, spot reclaims);
the Trainer turns that into a graceful stop at the next epoch boundary
with the FULL train state checkpointed, and ``--resume`` continues the
exact trajectory. The reference has no preemption story (a kill loses
the run — it cannot resume at all, SURVEY §5).
"""
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
from downgan_tpu.training.trainer import Trainer
from downgan_tpu.utils.checkpoint import CheckpointManager


def tiny_config(epochs=6):
    return Config(
        coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
        hp=HyperParams(batch_size=8, epochs=epochs,
                       metrics_to_calculate=("MAE", "MSE", "Wass")),
    )


def tiny_datasets():
    coarse, fine = synthetic_dataset(n_samples=24, coarse_size=8, fine_size=32)
    return (DeviceDataset.from_numpy(coarse[:16], fine[:16]),
            DeviceDataset.from_numpy(coarse[16:], fine[16:]))


def test_preempted_flag_stops_checkpoints_and_resumes_exactly(tmp_path):
    """Flag set mid-run (what the SIGTERM handler does) -> stop at the
    next epoch boundary with that epoch checkpointed; resuming trains the
    remaining epochs onto the SAME trajectory as an uninterrupted run."""
    config = tiny_config(epochs=6)
    train_ds, test_ds = tiny_datasets()

    # uninterrupted baseline
    base = Trainer(config, train_ds, test_ds, verbose=False)
    base.train()

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    t = Trainer(config, train_ds, test_ds, checkpoint_manager=ckpt,
                verbose=False)
    orig = t._run_train_epoch

    def preempt_after_epoch_1(rng):
        if t.epoch == 1:
            t.preempted = True  # exactly what the SIGTERM handler sets
        return orig(rng)

    t._run_train_epoch = preempt_after_epoch_1
    t.train()
    assert t.preempted
    assert t.epoch == 2  # stopped at the boundary after epoch 1
    assert ckpt.latest_step() == 1
    ckpt.close()

    # resume: restores epoch 1's state, trains epochs 2..5
    ckpt2 = CheckpointManager(str(tmp_path / "ck"))
    t2 = Trainer(config, train_ds, test_ds, checkpoint_manager=ckpt2,
                 verbose=False)
    assert t2.maybe_resume()
    assert t2.epoch == 2
    t2.train()
    assert not t2.preempted
    assert ckpt2.latest_step() == 5
    ckpt2.close()

    for a, b in zip(jax.tree.leaves(base.state.g_params),
                    jax.tree.leaves(t2.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(base.state.c_params),
                    jax.tree.leaves(t2.state.c_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigterm_subprocess_graceful_checkpoint_and_resume(tmp_path):
    """Real signal, real CLI: SIGTERM mid-training exits 0 with the last
    completed epoch checkpointed; --resume finishes the run."""
    cfg = tiny_config(epochs=100000)  # never finishes on its own
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    ckpt_dir = str(tmp_path / "ckpt")
    worker = os.path.join(os.path.dirname(__file__), "_preempt_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker)), env.get("PYTHONPATH", "")])
    args = [sys.executable, worker, "train", "--config", cfg_path,
            "--synthetic", "--samples", "24", "--checkpoint-dir", ckpt_dir,
            "--tracking-root", str(tmp_path / "exps"),
            "--print-every", "1", "--plot-every", "100000"]
    p = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, bufsize=1)
    lines = []
    deadline = time.time() + 420
    try:
        # wait until at least 2 epochs have completed, then preempt
        seen = 0
        while seen < 2:
            assert time.time() < deadline, "".join(lines[-50:])
            line = p.stdout.readline()
            if not line:
                assert p.poll() is None, "".join(lines[-50:])
                continue
            lines.append(line)
            if line.startswith("epoch "):
                seen += 1
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=240)
        lines.append(out)
    finally:
        if p.poll() is None:
            p.kill()
    output = "".join(lines)
    assert p.returncode == 0, output[-4000:]
    assert "preempted" in output, output[-4000:]

    mngr = CheckpointManager(ckpt_dir)
    last = mngr.latest_step()
    mngr.close()
    assert last is not None and last >= 1

    # resume to a nearby finish line: trains the remaining epochs, exits 0
    done = subprocess.run(
        args + ["--resume", "--epochs", str(last + 3)], env=env,
        capture_output=True, text=True, timeout=420)
    assert done.returncode == 0, done.stdout[-2000:] + done.stderr[-2000:]
    assert f"resumed from checkpoint of epoch {last}" in done.stdout
    mngr = CheckpointManager(ckpt_dir)
    assert mngr.latest_step() == last + 2
    mngr.close()


def test_sigterm_during_test_pass_stops_this_epoch(tmp_path):
    """A SIGTERM landing DURING the per-epoch test pass (after the
    post-epoch preemption check already said 'keep going') must stop at
    THIS epoch boundary — not run one more full compiled train epoch
    under the preemption grace window."""
    config = tiny_config(epochs=6)
    train_ds, test_ds = tiny_datasets()
    trainer = Trainer(config, train_ds, test_ds, verbose=False)

    real_test_pass = trainer._run_test_pass
    fired = {"epoch": None}

    def preempt_during_test_pass(*args, **kwargs):
        out = real_test_pass(*args, **kwargs)
        if trainer.epoch == 1 and fired["epoch"] is None:
            fired["epoch"] = trainer.epoch
            trainer.preempted = True  # what the SIGTERM handler does
        return out

    trainer._run_test_pass = preempt_during_test_pass
    trainer.train()
    assert fired["epoch"] == 1
    # Stopped after epoch 1 (self.epoch is the NEXT epoch), not epoch 2.
    assert trainer.epoch == 2
    assert trainer.preempted
