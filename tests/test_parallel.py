"""Mesh / data-parallel tests on the virtual 8-device CPU mesh.

SURVEY §4: multi-device tests must run on a CPU mesh so DP is testable
without a pod (conftest.py forces 8 host devices).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.parallel.dp import build_dp_epoch_scan, build_dp_train_step
from downgan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    shard_batch,
)
from downgan_tpu.training.state import create_state, make_models
from downgan_tpu.training.wgan import build_train_step


def tiny_config(batch):
    hp = HyperParams(batch_size=batch, metrics_to_calculate=("MAE", "MSE", "Wass"))
    return Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1, hp=hp)


def test_make_mesh_wildcard_and_validation():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh((2, -1), ("data", "spatial"))
    assert mesh2.shape == {"data": 2, "spatial": len(jax.devices()) // 2}
    with pytest.raises(ValueError):
        make_mesh((3,), devices=jax.devices())  # 8 % 3 != 0


def test_dp_step_matches_single_device():
    """The DP-sharded step must produce the same updated params as the
    unsharded step on the same global batch (GSPMD all-reduce == global
    mean)."""
    config = tiny_config(batch=8)
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    coarse = np.random.default_rng(0).standard_normal((8, 8, 8, 7)).astype(np.float32)
    fine = np.random.default_rng(1).standard_normal((8, 32, 32, 2)).astype(np.float32)

    single = jax.jit(build_train_step(config, gen, critic, with_metrics=False))
    s1, m1 = single(state, jnp.asarray(coarse), jnp.asarray(fine), rng)

    mesh = make_mesh()
    dp = build_dp_train_step(config, gen, critic, mesh, with_metrics=False,
                             donate_state=False)
    state_r = replicate_state(mesh, create_state(config, jax.random.PRNGKey(0)))
    coarse_s, fine_s = shard_batch(mesh, coarse, fine)
    s2, m2 = dp(state_r, coarse_s, fine_s, rng)

    assert float(m1["critic_loss"]) == pytest.approx(float(m2["critic_loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.c_params), jax.tree.leaves(s2.c_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_epoch_scan_runs_and_advances():
    config = tiny_config(batch=8)
    gen, critic = make_models(config)
    mesh = make_mesh()
    epoch_fn = build_dp_epoch_scan(config, gen, critic, mesh, with_metrics=True,
                                   donate_state=False)
    state = replicate_state(mesh, create_state(config, jax.random.PRNGKey(0)))
    rng_np = np.random.default_rng(0)
    coarse = rng_np.standard_normal((32, 8, 8, 7)).astype(np.float32)
    fine = rng_np.standard_normal((32, 32, 32, 2)).astype(np.float32)
    perm = jnp.arange(32, dtype=jnp.int32).reshape(4, 8)
    new_state, stacked = epoch_fn(
        state, jnp.asarray(coarse), jnp.asarray(fine), perm, jax.random.PRNGKey(1)
    )
    assert int(new_state.step) == 4
    assert stacked["MAE"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(stacked["critic_loss"])))


def test_batch_sharding_layout():
    mesh = make_mesh()
    arr = np.zeros((16, 4, 4, 2), np.float32)
    sharded = jax.device_put(arr, batch_sharding(mesh, arr.ndim))
    # each device holds 16/8 = 2 rows
    shard = sharded.addressable_shards[0]
    assert shard.data.shape == (2, 4, 4, 2)


def test_dp_fused_schedule_round():
    """DP + fused schedule: the round's inputs shard on axis 1."""
    config = tiny_config(batch=8).replace(
        hp=tiny_config(batch=8).hp.__class__(
            batch_size=8, critic_iterations=2, schedule="fused",
            metrics_to_calculate=("MAE", "MSE", "Wass"),
        )
    )
    gen, critic = make_models(config)
    mesh = make_mesh()
    dp = build_dp_train_step(config, gen, critic, mesh, with_metrics=False,
                             donate_state=False)
    state = replicate_state(mesh, create_state(config, jax.random.PRNGKey(0)))
    rng_np = np.random.default_rng(0)
    coarse = jnp.asarray(rng_np.standard_normal((2, 8, 8, 8, 7)), jnp.float32)
    fine = jnp.asarray(rng_np.standard_normal((2, 8, 32, 32, 2)), jnp.float32)
    new_state, metrics = dp(state, coarse, fine, jax.random.PRNGKey(1))
    assert int(new_state.step) == 2
    assert np.isfinite(float(metrics["critic_loss"]))


def test_device_dataset_sharded_residency():
    """DeviceDataset.from_numpy with a batch sharding places each sample
    shard on its device; epoch gathers still work."""
    from downgan_tpu.data.dataset import DeviceDataset

    mesh = make_mesh()
    coarse = np.random.default_rng(0).standard_normal((16, 4, 4, 3)).astype(np.float32)
    fine = coarse * 2.0
    ds = DeviceDataset.from_numpy(coarse, fine, sharding=batch_sharding(mesh))
    assert ds.coarse.sharding.num_devices == mesh.devices.size
    assert ds.coarse.addressable_shards[0].data.shape[0] == 2
    c, f = next(ds.batches(np.random.default_rng(0), batch_size=4))
    np.testing.assert_allclose(np.asarray(f), np.asarray(c) * 2.0)


def test_global_dataset_retains_host_copies():
    """from_numpy_global keeps the staged numpy arrays so multihost eval/
    plot gathers index on host instead of re-fetching the whole replicated
    set device-to-host on every call."""
    from downgan_tpu.data.dataset import DeviceDataset

    mesh = make_mesh()
    coarse = np.random.default_rng(1).standard_normal((8, 4, 4, 3)).astype(np.float32)
    fine = coarse + 1.0
    ds = DeviceDataset.from_numpy_global(mesh, coarse, fine)
    assert ds.host_coarse is not None and ds.host_fine is not None
    np.testing.assert_array_equal(ds.host_coarse, coarse)
    np.testing.assert_array_equal(np.asarray(ds.fine), fine)


def test_multihost_helpers_single_host():
    from downgan_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        make_global_batch,
        process_batch_slice,
    )

    initialize(num_processes=1)  # no-op path
    assert process_batch_slice(64, process_index=0, process_count=1) == (0, 64)
    assert process_batch_slice(64, process_index=3, process_count=4) == (48, 64)
    with pytest.raises(ValueError):
        process_batch_slice(10, process_index=0, process_count=4)

    mesh = global_mesh()
    rows = np.arange(16, dtype=np.float32).reshape(16, 1, 1, 1)
    arr = make_global_batch(mesh, rows)
    assert arr.shape == (16, 1, 1, 1)
    np.testing.assert_array_equal(np.asarray(arr).ravel(), rows.ravel())


def test_multihost_initialize_reraises_on_explicit_args(monkeypatch):
    """ADVICE r1: a misconfigured pod job (explicit coordinator args) must
    fail loudly; only the already-initialized case is tolerated."""
    from downgan_tpu.parallel import multihost

    def boom(**kw):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="connection refused"):
        multihost.initialize(coordinator_address="127.0.0.1:9999",
                             num_processes=2, process_id=0)

    def already(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    multihost.initialize(coordinator_address="127.0.0.1:9999",
                         num_processes=2, process_id=0)  # tolerated

    def noauto(**kw):
        raise ValueError("cannot auto-detect")

    monkeypatch.setattr(jax.distributed, "initialize", noauto)
    multihost.initialize()  # no explicit args: degrade quietly
    with pytest.raises(ValueError):
        multihost.initialize(num_processes=2)


def test_dp_full_metric_registry_128px_matches_single_device():
    """VERDICT r1 #3: the full metric pass (incl. MS-SSIM, whose min-max
    normalization takes batch-GLOBAL min/max) must be invariant to batch
    sharding. 128px fields (the real metric size), full registry, 8-way DP
    step == single-device step."""
    hp = HyperParams(batch_size=8)  # default registry: MAE/MSE/MSSSIM/Wass
    config = Config(coarse_size=16, fine_size=128, filters=8,
                    num_res_blocks=1, hp=hp)
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    rng_np = np.random.default_rng(0)
    coarse = rng_np.standard_normal((8, 16, 16, 7)).astype(np.float32)
    fine = rng_np.standard_normal((8, 128, 128, 2)).astype(np.float32)

    single = jax.jit(build_train_step(config, gen, critic, with_metrics=True))
    s1, m1 = single(state, jnp.asarray(coarse), jnp.asarray(fine), rng)

    mesh = make_mesh()
    dp = build_dp_train_step(config, gen, critic, mesh, with_metrics=True,
                             donate_state=False)
    state_r = replicate_state(mesh, create_state(config, jax.random.PRNGKey(0)))
    coarse_s, fine_s = shard_batch(mesh, coarse, fine)
    s2, m2 = dp(state_r, coarse_s, fine_s, rng)

    assert set(m1) == set(m2) and "MSSSIM" in m1
    for k in m1:
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=2e-4, abs=1e-6), k


def test_two_process_distributed_dp_step(tmp_path):
    """VERDICT r1 #6: real 2-process jax.distributed smoke test — localhost
    coordinator, 2 CPU devices per process, global mesh over 4 devices,
    per-host batch slices assembled with make_global_batch, one DP step.
    Both processes must agree bit-exactly, and match the single-process
    step on the same global batch."""
    import json
    import os
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker)), env.get("PYTHONPATH", "")]
    )
    procs = []
    outs = []
    for pid in range(2):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, stderr.decode()[-3000:]
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))

    r0, r1 = results
    assert r0["process_count"] == 2 and r0["n_devices"] == 4
    assert r0["step"] == 1
    # the two processes ran the same global program: bit-identical scalars
    for key in ("critic_loss", "gen_loss", "g_abs_sum", "c_abs_sum"):
        assert r0[key] == r1[key], key

    # single-process baseline on the same global batch
    config = Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=8,
                                   metrics_to_calculate=("MAE", "MSE", "Wass")))
    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    coarse = rng_np.standard_normal((8, 8, 8, 7)).astype(np.float32)
    fine = rng_np.standard_normal((8, 32, 32, 2)).astype(np.float32)
    step = jax.jit(build_train_step(config, gen, critic, with_metrics=False))
    s1, m1 = step(state, jnp.asarray(coarse), jnp.asarray(fine),
                  jnp.asarray(np.asarray(jax.random.PRNGKey(1))))
    assert float(m1["critic_loss"]) == pytest.approx(r0["critic_loss"], rel=1e-4)
    g_sum = float(sum(float(jnp.sum(jnp.abs(x)))
                      for x in jax.tree.leaves(s1.g_params)))
    assert g_sum == pytest.approx(r0["g_abs_sum"], rel=1e-5)


def test_two_process_full_trainer(tmp_path):
    """VERDICT r2 #1: the FULL Trainer loop (2 epochs, collective Orbax
    checkpoints, tracker metrics + plots from process 0) runs across 2
    real jax.distributed processes on both multihost data paths — per-host
    rows (HostDataset + process_batch_slice/make_global_batch) and the
    replicated-global fused epoch scan — and matches the single-process
    trajectory on the same global mesh size."""
    import csv
    import json
    import os
    import socket
    import subprocess
    import sys

    from downgan_tpu.data.dataset import DeviceDataset
    from downgan_tpu.data.feed import HostDataset
    from downgan_tpu.data.dataset import synthetic_dataset
    from downgan_tpu.tracking import TrackingStore
    from downgan_tpu.training.trainer import Trainer
    from downgan_tpu.utils.checkpoint import CheckpointManager

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    worker = os.path.join(os.path.dirname(__file__), "_multihost_trainer_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker)), env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=1200)
        assert p.returncode == 0, stderr.decode()[-4000:]
    results = []
    for pid in range(2):
        with open(tmp_path / f"proc{pid}.json") as f:
            results.append(json.load(f))
    r0, r1 = results
    assert r0["n_devices"] == 4 and r0["process_count"] == 2

    # the two processes ran one SPMD program: identical trajectories
    for mode in ("host", "fused"):
        assert r0[f"{mode}_step"] == r1[f"{mode}_step"] == 4  # 2 epochs x 2 steps
        assert r0[f"{mode}_g_abs_sum"] == r1[f"{mode}_g_abs_sum"], mode
        assert r0[f"{mode}_c_abs_sum"] == r1[f"{mode}_c_abs_sum"], mode

    # elastic recovery: kill-after-epoch-0 + collective restart must land
    # exactly on the uninterrupted fused 2-epoch trajectory
    assert r0["resume_step"] == r1["resume_step"] == 4
    assert r0["resume_g_abs_sum"] == r0["fused_g_abs_sum"]
    assert r0["resume_c_abs_sum"] == r0["fused_c_abs_sum"]
    assert r1["resume_g_abs_sum"] == r1["fused_g_abs_sum"]

    # single-process baseline on the same global mesh size (4 devices)
    coarse, fine = synthetic_dataset(n_samples=26, coarse_size=8,
                                     fine_size=32, seed=0)
    mesh4 = make_mesh(devices=jax.devices()[:4])
    baselines = {}
    for mode in ("host", "fused"):
        fused = mode == "fused"
        config = Config(
            coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
            hp=HyperParams(batch_size=8, fused_epoch=fused,
                           metrics_to_calculate=("MAE", "MSE", "Wass")),
        )
        if fused:
            tr = DeviceDataset.from_numpy(coarse[:16], fine[:16])
            te = DeviceDataset.from_numpy(coarse[16:], fine[16:])
        else:
            tr = HostDataset(coarse[:16], fine[:16])
            te = HostDataset(coarse[16:], fine[16:])
        store = TrackingStore(str(tmp_path / f"base_exps_{mode}"))
        run = store.create_run(store.create_experiment("base")).start()
        t = Trainer(config, tr, te, run=run, mesh=mesh4, verbose=False,
                    multihost=False)
        t.train(epochs=2)
        run.end("FINISHED")
        baselines[mode] = (t, run, config)

        import jax.numpy as jnp
        base_g = float(sum(float(jnp.sum(jnp.abs(x).astype(jnp.float64)))
                           for x in jax.tree.leaves(t.state.g_params)))
        assert r0[f"{mode}_g_abs_sum"] == pytest.approx(base_g, rel=1e-7), mode

        # FULL-params check: restore the workers' collective checkpoint
        # (epoch 1) and compare every leaf against the baseline state
        mngr = CheckpointManager(str(tmp_path / f"ckpt_{mode}"))
        assert list(mngr.all_steps()) == [0, 1]
        restored = mngr.restore(
            create_state(config, jax.random.PRNGKey(config.seed)), step=1)
        mngr.close()
        # 2-proc-x-2-dev vs 1-proc-x-4-dev compile marginally different
        # collective schedules; after 4 Adam steps that shows up as <1e-6
        # ulp-level drift on a handful of weights (measured 2.2e-7 max).
        for a, b in zip(jax.tree.leaves(restored.g_params),
                        jax.tree.leaves(t.state.g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-6)
        for a, b in zip(jax.tree.leaves(restored.c_params),
                        jax.tree.leaves(t.state.c_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-6)

        # tracker metrics from process 0 match the baseline run's epochs
        art = r0[f"{mode}_artifact_dir"]
        for split in ("train", "test"):
            with open(os.path.join(art, f"{split}_metrics.csv")) as f:
                mh_rows = list(csv.DictReader(f))
            with open(run.artifact_path(f"{split}_metrics.csv")) as f:
                base_rows = list(csv.DictReader(f))
            assert [r["epoch"] for r in mh_rows] == ["0", "1"]
            for mr, br in zip(mh_rows, base_rows):
                for key in ("MAE", "MSE", "Wass"):
                    assert float(mr[key]) == pytest.approx(
                        float(br[key]), rel=1e-5, abs=1e-7), (mode, split, key)
            assert os.path.exists(os.path.join(art, f"{split}_images.png"))
