"""bf16-vs-fp32 end-to-end convergence receipt (PERF.md "dtype story").

PERF.md round 1 showed a bf16 step stays finite and is perf-neutral on
one chip; this script closes the remaining question — does bf16 TRAINING
converge equivalently? It runs the identical synthetic workload (same
seeds, same schedule) once per compute dtype through the full Trainer
stack and prints the per-dtype test metrics at the final epoch plus the
trajectory every `every` epochs.

Usage: python benchmarks/dtype_convergence.py [epochs] (default 300).
Output: one JSON line per dtype + a "verdict" line comparing final
MSSSIM/RALSD/MAE. Runs on whatever jax.devices() offers (TPU here).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(compute_dtype: str, epochs: int, every: int) -> dict:
    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.training.trainer import Trainer

    config = Config(hp=HyperParams(
        batch_size=32,
        compute_dtype=compute_dtype,
        epochs=epochs,
        metrics_to_calculate=("MAE", "MSE", "MSSSIM", "RALSD", "Wass"),
    ))
    coarse, fine = synthetic_dataset(
        n_samples=512, coarse_size=config.coarse_size,
        fine_size=config.fine_size, n_covariates=config.n_covariates,
        n_predictands=config.n_predictands, seed=config.seed,
    )
    train_ds = DeviceDataset.from_numpy(coarse[:460], fine[:460])
    test_ds = DeviceDataset.from_numpy(coarse[460:], fine[460:])

    trainer = Trainer(config, train_ds, test_ds, verbose=False)
    history = []
    for target in list(range(every, epochs, every)) + [epochs]:
        trainer.train(epochs=target)  # epoch counter persists across calls
        test_m = trainer._run_test_pass()
        history.append({"epoch": target,
                        **{f"{k}_test": round(float(v), 4)
                           for k, v in test_m.items()}})

    final = history[-1] if history else {}
    out = {"dtype": compute_dtype, "epochs": epochs, "final": final,
           "trajectory": history}
    print(json.dumps(out))
    return out


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    every = max(1, epochs // 6)
    from downgan_tpu.runtime import setup_cache
    from downgan_tpu.utils.tpulock import hold_chip_lock

    hold_chip_lock(enabled=True)  # held until process exit
    setup_cache()
    results = {d: run(d, epochs, every) for d in ("float32", "bfloat16")}
    f32, bf16 = results["float32"]["final"], results["bfloat16"]["final"]
    verdict = {
        "metric_deltas_bf16_minus_f32": {
            k: round(bf16.get(k, float("nan")) - f32.get(k, float("nan")), 4)
            for k in ("MSSSIM_test", "RALSD_test", "MAE_test")
            if k in f32
        },
    }
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
