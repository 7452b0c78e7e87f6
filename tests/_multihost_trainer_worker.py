"""Worker for the 2-process FULL-Trainer integration test.

Launched by tests/test_parallel.py::test_two_process_full_trainer. Each
worker: force CPU with 2 local devices, initialize jax.distributed, build
the global 4-device mesh, then run the COMPLETE Trainer loop twice:

  * mode "host": HostDataset — per-host batch rows assembled with
    process_batch_slice + make_global_batch (the pod data path), per-step
    DP updates;
  * mode "fused": DeviceDataset.from_numpy_global — replicated global
    arrays through the compiled DP epoch scan.

Both modes run 2 epochs with collective Orbax checkpointing; process 0
also writes tracker metrics + grid plots. Parameter fingerprints go to
<workdir>/proc<id>.json; the parent compares them across processes and
against the single-process baseline, and restores the shared checkpoint
for a full-params comparison.

Usage: python _multihost_trainer_worker.py <coordinator> <n> <pid> <workdir>
"""
from __future__ import annotations

import json
import os
import sys


def fingerprint(tree) -> float:
    import jax
    import jax.numpy as jnp

    return float(sum(float(jnp.sum(jnp.abs(x).astype(jnp.float64)))
                     for x in jax.tree.leaves(tree)))


def main() -> None:
    coordinator, num_procs, proc_id, workdir = sys.argv[1:5]
    num_procs, proc_id = int(num_procs), int(proc_id)

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.data.feed import HostDataset
    from downgan_tpu.parallel.multihost import global_mesh, initialize
    from downgan_tpu.tracking import TrackingStore
    from downgan_tpu.training.trainer import Trainer
    from downgan_tpu.utils.checkpoint import CheckpointManager

    initialize(coordinator_address=coordinator, num_processes=num_procs,
               process_id=proc_id)
    assert jax.process_count() == num_procs
    mesh = global_mesh()

    coarse, fine = synthetic_dataset(n_samples=26, coarse_size=8,
                                     fine_size=32, seed=0)
    out = {"process": proc_id, "process_count": jax.process_count(),
           "n_devices": len(jax.devices())}

    for mode in ("host", "fused"):
        fused = mode == "fused"
        config = Config(
            coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
            hp=HyperParams(batch_size=8, fused_epoch=fused,
                           metrics_to_calculate=("MAE", "MSE", "Wass")),
        )
        if fused:
            train_ds = DeviceDataset.from_numpy_global(mesh, coarse[:16], fine[:16])
            test_ds = DeviceDataset.from_numpy_global(mesh, coarse[16:], fine[16:])
        else:
            train_ds = HostDataset(coarse[:16], fine[:16])
            test_ds = HostDataset(coarse[16:], fine[16:])

        run = None
        if jax.process_index() == 0:
            store = TrackingStore(os.path.join(workdir, f"exps_{mode}"))
            run = store.create_run(store.create_experiment("mh")).start()
        ckpt = CheckpointManager(os.path.join(workdir, f"ckpt_{mode}"))
        trainer = Trainer(config, train_ds, test_ds, run=run,
                          checkpoint_manager=ckpt, mesh=mesh, verbose=False)
        assert trainer.multihost, "process_count>1 must auto-enable multihost"
        trainer.train(epochs=2)
        ckpt.wait()
        ckpt.close()
        if run is not None:
            run.end("FINISHED")
        out[f"{mode}_step"] = int(jax.device_get(trainer.state.step))
        out[f"{mode}_g_abs_sum"] = fingerprint(trainer.state.g_params)
        out[f"{mode}_c_abs_sum"] = fingerprint(trainer.state.c_params)
        if run is not None:
            out[f"{mode}_artifact_dir"] = run.artifact_dir

    # Elastic-recovery leg: a pod job that dies after epoch 0 and restarts
    # from the shared collective checkpoint must reproduce the fused
    # 2-epoch trajectory bit-exactly (permutations are (seed, epoch)-keyed,
    # so resume is on-trajectory; restore is collective — every process
    # calls it against its own addressable shards).
    config = Config(
        coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
        hp=HyperParams(batch_size=8, fused_epoch=True,
                       metrics_to_calculate=("MAE", "MSE", "Wass")),
    )
    train_ds = DeviceDataset.from_numpy_global(mesh, coarse[:16], fine[:16])
    test_ds = DeviceDataset.from_numpy_global(mesh, coarse[16:], fine[16:])
    ckpt_dir = os.path.join(workdir, "ckpt_resume")
    ckpt = CheckpointManager(ckpt_dir)
    t1 = Trainer(config, train_ds, test_ds, checkpoint_manager=ckpt,
                 mesh=mesh, save_every=1, verbose=False)
    t1.train(epochs=1)
    ckpt.wait()
    ckpt.close()
    ckpt2 = CheckpointManager(ckpt_dir)
    t2 = Trainer(config, train_ds, test_ds, checkpoint_manager=ckpt2,
                 mesh=mesh, save_every=1, verbose=False)
    assert t2.maybe_resume(), "collective restore must find the checkpoint"
    t2.train(epochs=2)  # continues at epoch 1
    ckpt2.wait()
    ckpt2.close()
    out["resume_step"] = int(jax.device_get(t2.state.step))
    out["resume_g_abs_sum"] = fingerprint(t2.state.g_params)
    out["resume_c_abs_sum"] = fingerprint(t2.state.c_params)

    with open(os.path.join(workdir, f"proc{proc_id}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
