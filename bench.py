"""Headline benchmark: fused WGAN-GP train steps/sec at batch 64, one chip.

Measures the complete per-batch work of the reference hot loop
(``DoWnGAN/GAN/wasserstein.py:120-148`` + the per-batch metric pass,
``mlflow_tools/mlflow_epoch.py:53-63``) as one jitted TPU program: critic
update with nested-grad gradient penalty, scheduled generator update, and
the MAE/MSE/MSSSIM/Wass metric pass — florida workload shapes
(64x16x16x7 coarse -> 64x128x128x2 fine, G 1.70M / C 1.11M params).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
measured against a modeled reference throughput of 10 train-steps/sec for
the same full per-batch work at batch 64 on one A100 (ESRGAN-class
training at 128px with a 5-forward critic pass and double backward), per
the BASELINE.json north-star framing (>=5x A100 on v5e-8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_BATCH (64), BENCH_STEPS (30), BENCH_DTYPE (float32),
BENCH_METRICS (1).
"""
from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

A100_REFERENCE_STEPS_PER_SEC = 10.0


def main() -> None:
    from downgan_tpu.runtime import setup_cache

    setup_cache()
    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.parallel.dp import build_dp_train_step
    from downgan_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from downgan_tpu.training.state import create_state, make_models

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    n_steps = int(os.environ.get("BENCH_STEPS", "30"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    with_metrics = os.environ.get("BENCH_METRICS", "1") == "1"

    config = Config(hp=HyperParams(batch_size=batch, compute_dtype=dtype))
    mesh = make_mesh()
    gen, critic = make_models(config)
    state = replicate_state(mesh, create_state(config, jax.random.PRNGKey(0)))

    rng_np = np.random.default_rng(0)
    coarse = rng_np.standard_normal((batch, 16, 16, 7)).astype(np.float32)
    fine = rng_np.standard_normal((batch, 128, 128, 2)).astype(np.float32)
    coarse, fine = shard_batch(mesh, coarse, fine)
    rng = jax.device_put(
        jax.random.PRNGKey(1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )

    step = build_dp_train_step(config, gen, critic, mesh, with_metrics=with_metrics)

    # Warmup: compile + 3 steps.
    for _ in range(3):
        state, metrics = step(state, coarse, fine, rng)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, coarse, fine, rng)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    n_chips = len(jax.devices())
    print(
        json.dumps(
            {
                "metric": f"wgan_gp_train_steps_per_sec_b{batch}"
                + ("" if with_metrics else "_nometrics"),
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / A100_REFERENCE_STEPS_PER_SEC, 3),
                "patches_per_sec_per_chip": round(steps_per_sec * batch / n_chips, 1),
                "n_chips": n_chips,
                "dtype": dtype,
            }
        )
    )


if __name__ == "__main__":
    main()
