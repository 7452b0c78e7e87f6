"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_parallel.py::test_two_process_distributed_dp_step.
Each worker: force CPU platform (fresh process — the axon TPU plugin
overrides JAX_PLATFORMS), initialize jax.distributed against a localhost
coordinator, build the global mesh over BOTH processes' devices, feed only
its own rows of the global batch (per-host data loading), run ONE DP
train step, and write the resulting scalars to a JSON file for the parent
to compare against the single-process baseline.

Usage: python _distributed_worker.py <coordinator> <num_procs> <proc_id> <outfile>
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    coordinator, num_procs, proc_id, outfile = sys.argv[1:5]
    num_procs, proc_id = int(num_procs), int(proc_id)

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.parallel.dp import build_dp_train_step
    from downgan_tpu.parallel.mesh import replicated
    from downgan_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        make_global_batch,
        process_batch_slice,
    )
    from downgan_tpu.training.state import create_state, make_models

    initialize(coordinator_address=coordinator, num_processes=num_procs,
               process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

    mesh = global_mesh()
    config = Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                    hp=HyperParams(batch_size=8,
                                   metrics_to_calculate=("MAE", "MSE", "Wass")))
    gen, critic = make_models(config)

    # Global replicated state, built ON the mesh (no host->nonlocal-device
    # transfers in multi-process jax): the same seed yields the same params
    # in every process.
    rep = replicated(mesh)
    state = jax.jit(
        lambda: create_state(config, jax.random.PRNGKey(0)), out_shardings=rep
    )()

    # Per-host data loading: every process materializes ONLY its slice.
    global_batch = 8
    rng_np = np.random.default_rng(0)
    coarse_all = rng_np.standard_normal((global_batch, 8, 8, 7)).astype(np.float32)
    fine_all = rng_np.standard_normal((global_batch, 32, 32, 2)).astype(np.float32)
    lo, hi = process_batch_slice(global_batch)
    coarse = make_global_batch(mesh, coarse_all[lo:hi])
    fine = make_global_batch(mesh, fine_all[lo:hi])

    step = build_dp_train_step(config, gen, critic, mesh,
                               with_metrics=False, donate_state=False)
    rng = np.asarray(jax.random.PRNGKey(1))  # uncommitted, same on all procs
    new_state, metrics = step(state, coarse, fine, rng)

    g_sum = float(sum(float(jax.numpy.sum(jax.numpy.abs(x)))
                      for x in jax.tree.leaves(new_state.g_params)))
    c_sum = float(sum(float(jax.numpy.sum(jax.numpy.abs(x)))
                      for x in jax.tree.leaves(new_state.c_params)))
    out = {
        "process": proc_id,
        "process_count": jax.process_count(),
        "n_devices": len(jax.devices()),
        "step": int(jax.device_get(new_state.step)),
        "critic_loss": float(metrics["critic_loss"]),
        "gen_loss": float(metrics["gen_loss"]),
        "g_abs_sum": g_sum,
        "c_abs_sum": c_sum,
    }
    with open(outfile, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
