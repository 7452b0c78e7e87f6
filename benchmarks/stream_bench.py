"""Data-residency throughput receipt: device-resident vs host-fed vs
disk-streamed training on the SAME workload.

Trains the full florida-shaped model for a few epochs through the
Trainer's per-step loop (the loop all three residency tiers share —
``hp.fused_epoch=False``) with the dataset (a) resident in HBM
(``DeviceDataset``), (b) in host RAM behind the double-buffered feed
(``HostDataset``), and (c) on disk in the preprocessed-NetCDF layout
(``StreamDataset`` — batches read lazily through h5py on the feed's
reader thread). Prints per-epoch wall times; steady-state epochs (not
epoch 0, which includes compile) are the receipt: if the reader thread
does its job, (b) and (c) match (a) to within session noise because
batch assembly and disk I/O overlap the step's device compute.

Usage: python benchmarks/stream_bench.py [--samples 2048] [--epochs 4]
Writes the synthetic set to a temp dir; one JSON line per tier.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU harness check (tiny model/shapes)")
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from downgan_tpu.utils.tpulock import hold_chip_lock

    hold_chip_lock(enabled=not args.smoke)  # held until process exit
    from downgan_tpu.runtime import setup_cache

    setup_cache()
    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.data.feed import HostDataset
    from downgan_tpu.data.staging import write_preprocessed
    from downgan_tpu.data.stream import StreamDataset
    from downgan_tpu.training.trainer import Trainer

    model_kw = {}
    if args.smoke:
        model_kw = dict(coarse_size=8, fine_size=32, filters=8,
                        num_res_blocks=1)
        args.samples = min(args.samples, 64)
        args.epochs = min(args.epochs, 2)

    with tempfile.TemporaryDirectory() as tmp:
        config = Config(
            **model_kw, proc_data_dir=tmp, already_preprocessed=True,
            hp=HyperParams(
                batch_size=args.batch, fused_epoch=False,
                metrics_to_calculate=("MAE", "MSE", "Wass"),
            ),
        )
        coarse, fine = synthetic_dataset(
            n_samples=args.samples, coarse_size=config.coarse_size,
            fine_size=config.fine_size, seed=0)
        split = args.samples - args.batch  # tiny test split, same for all
        write_preprocessed(config, coarse[:split], fine[:split],
                           coarse[split:], fine[split:])

        def tiers():
            yield "device", (DeviceDataset.from_numpy(coarse[:split], fine[:split]),
                             DeviceDataset.from_numpy(coarse[split:], fine[split:]))
            yield "host", (HostDataset(coarse[:split], fine[:split]),
                           HostDataset(coarse[split:], fine[split:]))
            yield "stream", (StreamDataset.from_preprocessed(config, "train"),
                             StreamDataset.from_preprocessed(config, "test"))

        for name, (train_ds, test_ds) in tiers():
            times = []
            t = Trainer(config, train_ds, test_ds, verbose=False)
            for epoch in range(args.epochs):
                t0 = time.perf_counter()
                t.train(epochs=epoch + 1)  # runs just the next epoch
                times.append(round(time.perf_counter() - t0, 3))
            steady = times[1:] or times
            print(json.dumps({
                "tier": name,
                "epoch_s": times,
                "steady_epoch_s": round(sum(steady) / len(steady), 3),
                "samples": split,
                "batch": args.batch,
                "smoke": args.smoke,
            }))
            if hasattr(train_ds, "close"):
                train_ds.close()
                test_ds.close()


if __name__ == "__main__":
    main()
