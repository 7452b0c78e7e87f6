"""Model-width MFU scaling receipt: the framework sustains rising MXU
utilization as soon as the model supplies the arithmetic intensity.

The headline bench's ~23 % MFU is the REFERENCE architecture's
structural ceiling, not framework overhead: its cout=16 conv trunk pins
one MXU dimension at 12.5 % lane utilization by construction (PERF.md
"Levers" #4 — the Pallas rewrite measured XLA's conv emitter already
beating the hand-kernel ceiling at that width). This receipt makes the
claim checkable: sweep ``Config.filters`` (the trunk width; the critic's
channel base scales with it too, ``training/state.py make_models``)
through the EXACT headline harness (``downgan_tpu/bench.py`` — one
subprocess per width, the PERF.md clean-process measurement rule) at
production semantics (fused schedule + ``metrics_reuse_fake``, bf16) and
record each width's self-audited FLOPs/step, achieved TF/s/chip, and
``mfu_vs_peak``. If utilization climbs with width, the gap at width 16
is the model, not the framework.

Usage:
    python benchmarks/width_scaling.py [--widths 16,32,64]
        [--batches 128] [--scan-steps 15] [--reps 3]
        [--out benchmarks/width_scaling_results.jsonl] [--smoke]

``--batches`` is either one batch size for every width or a
comma-separated list matched to ``--widths`` (wider models need more HBM
for the GP double backward at the same batch). One JSON line per width;
``--out benchmarks/width_scaling_results.jsonl`` appends the on-TPU
records there (committed alongside the PERF.md table once measured —
each width not in the persistent compile cache costs ~10 min of compile
on this 1-core host, so the receipt runs widths sequentially).
``--smoke`` validates the harness on the host CPU backend with tiny
shapes (tests/test_width_scaling.py).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build_config_json(width: int, batch: int, smoke: bool) -> str:
    # Config/HyperParams are plain frozen dataclasses (no jax at
    # construction time) — the parent process never touches the device;
    # each measurement runs in its own clean subprocess.
    from downgan_tpu.config.config import Config, HyperParams

    hp = HyperParams(
        batch_size=batch,
        compute_dtype="float32" if smoke else "bfloat16",
        schedule="fused",
        metrics_reuse_fake=True,
        # MS-SSIM needs >=128 px fields; the smoke config is 32 px.
        metrics_to_calculate=(("MAE", "MSE", "Wass") if smoke
                              else ("MAE", "MSE", "MSSSIM", "Wass")),
    )
    shape_kw = (dict(coarse_size=8, fine_size=32, num_res_blocks=1)
                if smoke else {})
    return Config(filters=width, hp=hp, **shape_kw).to_json()


def measure(width: int, batch: int, args: argparse.Namespace) -> dict | None:
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("BENCH_")}
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.update(
        BENCH_SCAN_STEPS=str(args.scan_steps),
        BENCH_REPS=str(args.reps),
    )
    if args.smoke:
        # Harness check off-TPU; a fake 1 TF/s peak exercises the
        # mfu_vs_peak field the receipt is about.
        env.update(BENCH_FORCE_CPU="1", BENCH_PEAK_TFLOPS="1")
    with tempfile.NamedTemporaryFile(
            "w", suffix=f"_w{width}.json", delete=False) as f:
        f.write(build_config_json(width, batch, args.smoke))
        cfg_path = f.name
    env["BENCH_CONFIG"] = cfg_path
    label = f"filters={width} b{batch}"
    print(f"measuring {label} ...", file=sys.stderr)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "downgan_tpu.bench"], env=env,
            capture_output=True, text=True, timeout=args.timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"  {label}: TIMEOUT after {args.timeout}s", file=sys.stderr)
        return None
    finally:
        os.unlink(cfg_path)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        print(f"  {label}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
        return None
    rec = json.loads(lines[-1])
    rec["width"] = width
    print(f"  {label}: {rec['value']} {rec['unit']}, "
          f"mfu={rec.get('mfu_vs_peak')}", file=sys.stderr)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="16,32,64",
                    help="Comma-separated Config.filters values.")
    ap.add_argument("--batches", default="128",
                    help="One batch size, or one per width.")
    ap.add_argument("--scan-steps", type=int, default=15)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1800,
                    help="Per-width wall timeout (a width not in the "
                    "persistent compile cache can take ~10 min to compile "
                    "on small hosts).")
    ap.add_argument("--out", default=None,
                    help="Append one JSON line per width here too.")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU harness check (tiny shapes, fake peak).")
    args = ap.parse_args()
    if args.smoke:
        args.widths = "8,16"
        args.batches = "8"
        args.scan_steps = min(args.scan_steps, 2)
        args.reps = 1

    widths = [int(w) for w in args.widths.split(",") if w.strip()]
    batches = [int(b) for b in args.batches.split(",") if b.strip()]
    if len(batches) == 1:
        batches = batches * len(widths)
    if len(batches) != len(widths):
        raise SystemExit("--batches must be one value or one per width")

    records = []
    for width, batch in zip(widths, batches):
        rec = measure(width, batch, args)
        if rec is None:
            continue
        records.append(rec)
        print(json.dumps(rec))
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    if not records:
        raise SystemExit("every width failed or timed out")


if __name__ == "__main__":
    main()
