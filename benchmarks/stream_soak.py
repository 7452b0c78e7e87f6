"""Production-scale data-residency soak (VERDICT r4 #6).

benchmarks/stream_bench.py receipts the three residency tiers at 2,016
samples; the reference's PRODUCTION dataset is ~19k samples (13 years of
6-hourly fields, config/config.py time range) — the scale at which the
reference's whole-set-on-GPU design (``DoWnGAN/GAN/dataloader.py:6-33``,
``GAN/stage.py:28-31``) stops being an option on accelerators without
tens of GB free. This soak proves the disk-stream tier carries that
scale:

  * a 13-year-shaped synthetic NetCDF set (~2.6 GB float32) is written
    through the real preprocessed-layout writer;
  * each tier (device-resident HBM vs disk-streamed through the reader
    thread) then trains the florida model at the b128 production batch
    in a FRESH subprocess, reporting two memory ceilings:
    ``py_peak_mb`` (tracemalloc peak — the DATA PATH's host allocations:
    the device tier must materialize the whole array in host RAM to
    stage it, the stream tier only ever holds reader buffers) and
    ``max_rss_mb`` (process peak RSS — on the dev tunnel this is
    dominated by the axon client's host staging arena, which retains
    ~batch_bytes per device_put up to a ~16.4 GiB recycle cap, measured
    directly: 120 x 16.8 MB puts grow RSS linearly by exactly the
    transferred bytes — so identical RSS across tiers here means both
    saturated the ARENA, not that the data paths cost the same; on a
    production host the arena behavior is the PCIe driver's);
  * steady-state epochs (after the compile epoch) give sustained
    patches/s for the receipt: reader-thread overlap at production batch
    means the stream tier tracks the device tier up to the host->device
    transfer path (which on the dev tunnel is ~30 MB/s and dominates —
    see PERF.md "Data-residency tiers"; on production PCIe both tiers
    converge).

Usage:
  python benchmarks/stream_soak.py                  # TPU, ~19k samples
  python benchmarks/stream_soak.py --smoke          # CPU harness check
  python benchmarks/stream_soak.py --samples N --epochs E --batch B
Prints one JSON line per tier (+ one writer record); committed receipt
in benchmarks/stream_soak_results.jsonl.
"""
from __future__ import annotations

import argparse
import contextlib
import json
import os
import resource
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 13 years of 6-hourly samples (the reference's production time range,
# 2000-01-01 .. 2013-01-01 at 4/day) minus the leap-day details — the
# scale claim, not a calendar claim.
PRODUCTION_SAMPLES = 19_000
TEST_ROWS = 256


def _config(args):
    from downgan_tpu.config.config import Config, HyperParams

    model_kw = {}
    if args.smoke:
        model_kw = dict(coarse_size=8, fine_size=32, filters=8,
                        num_res_blocks=1)
    return Config(
        **model_kw, proc_data_dir=args.dir, already_preprocessed=True,
        hp=HyperParams(
            batch_size=args.batch,
            compute_dtype="float32" if args.smoke else "bfloat16",
            fused_epoch=False,  # the per-step loop all tiers share
            metrics_to_calculate=("MAE", "MSE", "Wass"),
        ),
    )


def child(args) -> None:
    import tracemalloc

    tracemalloc.start()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from downgan_tpu.utils.tpulock import hold_chip_lock

    hold_chip_lock(enabled=not args.smoke)  # held until process exit
    from downgan_tpu.runtime import setup_cache

    setup_cache()
    from downgan_tpu.data.dataset import DeviceDataset
    from downgan_tpu.data.stream import StreamDataset
    from downgan_tpu.training.trainer import Trainer

    config = _config(args)
    if args.child == "device":
        # The whole-set-in-accelerator-memory design (the reference's):
        # load the full arrays into host RAM, stage onto the device.
        from downgan_tpu.data.staging import load_preprocessed

        coarse_tr, fine_tr, coarse_te, fine_te = load_preprocessed(config)
        train_ds = DeviceDataset.from_numpy(coarse_tr, fine_tr)
        test_ds = DeviceDataset.from_numpy(coarse_te, fine_te)
        del coarse_tr, fine_tr, coarse_te, fine_te
    else:
        train_ds = StreamDataset.from_preprocessed(config, "train")
        test_ds = StreamDataset.from_preprocessed(config, "test")
    n_train = len(train_ds)

    times = []
    t = Trainer(config, train_ds, test_ds, verbose=False)
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        t.train(epochs=epoch + 1)  # runs just the next epoch
        times.append(round(time.perf_counter() - t0, 3))
    steady = times[1:] or times
    steady_s = sum(steady) / len(steady)
    steps = n_train // args.batch
    print(json.dumps({
        "tier": args.child,
        "epoch_s": times,
        "steady_epoch_s": round(steady_s, 3),
        "patches_per_sec": round(steps * args.batch / steady_s, 1),
        # Data-path host allocations (tracemalloc peak): the number the
        # residency claim rides on — whole-array staging vs reader
        # buffers. max_rss_mb is the raw process peak; see the module
        # docstring for why the tunnel's staging arena dominates it here.
        "py_peak_mb": round(tracemalloc.get_traced_memory()[1] / 2**20, 1),
        "max_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
        "samples": n_train,
        "batch": args.batch,
        "dtype": config.hp.compute_dtype,
        "smoke": args.smoke,
    }), flush=True)
    if hasattr(train_ds, "close"):
        train_ds.close()
        test_ds.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=PRODUCTION_SAMPLES)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tiers", default="device,stream")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU harness check (tiny model/shapes)")
    ap.add_argument("--dir", default=None,
                    help="keep the generated set here (default: temp dir)")
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    if args.smoke:
        args.samples = min(args.samples, 256)
        args.epochs = min(args.epochs, 2)
        args.batch = min(args.batch, 16)

    if args.dir is None:
        ctx = tempfile.TemporaryDirectory()
    else:
        os.makedirs(args.dir, exist_ok=True)
        ctx = contextlib.nullcontext(args.dir)
    with ctx as tmp:
        args.dir = tmp
        from downgan_tpu.data.dataset import synthetic_dataset
        from downgan_tpu.data.staging import write_preprocessed

        config = _config(args)
        t0 = time.perf_counter()
        coarse, fine = synthetic_dataset(
            n_samples=args.samples, coarse_size=config.coarse_size,
            fine_size=config.fine_size, seed=0)
        split = args.samples - min(TEST_ROWS, args.samples // 8)
        paths = write_preprocessed(config, coarse[:split], fine[:split],
                                   coarse[split:], fine[split:])
        nbytes = sum(os.path.getsize(p) for p in paths)
        print(json.dumps({
            "writer": "preprocessed_netcdf",
            "samples": args.samples,
            "bytes": nbytes,
            "gb": round(nbytes / 1e9, 3),
            "write_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        del coarse, fine

        for tier in args.tiers.split(","):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", tier, "--dir", tmp,
                   "--samples", str(args.samples),
                   "--epochs", str(args.epochs), "--batch", str(args.batch)]
            if args.smoke:
                cmd.append("--smoke")
            proc = subprocess.run(cmd, cwd=REPO, text=True,
                                  capture_output=True, timeout=7200)
            if proc.returncode != 0:
                print(json.dumps({"tier": tier, "error":
                                  proc.stderr[-2000:]}), flush=True)
                sys.exit(1)
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)



if __name__ == "__main__":
    main()
