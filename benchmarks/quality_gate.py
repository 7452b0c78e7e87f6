"""Fixed-budget training-quality gate (VERDICT r2 #9).

The perf receipts prove the stack is fast; this gate proves a fixed
training budget still produces a SKILLFUL model — catching regressions in
training quality (loss wiring, schedule, metric, data-path bugs) that
speed benchmarks cannot see.

Workload: the florida-shaped synthetic task at REALISTIC SNR — unlike the
test-suite fixtures, the coarse covariates here are block-averaged fine
fields *plus noise* (``synthetic_dataset(covariate_noise=...)``), so the
generator must denoise as well as downscale, the same regime as regridded
ERA5 predictors vs WRF truth (reference: coarse/fine pairing built by
``DoWnGAN/helpers/gen_experiment_datasets.py``). Budget and thresholds are
pinned below; thresholds are set from a measured TPU calibration run
(``quality_gate_results.jsonl``) with margin for run-to-run seed noise.

Usage:
  python benchmarks/quality_gate.py             # full gate (TPU, ~7 min)
  python benchmarks/quality_gate.py --smoke     # harness path only (CPU, ~1 min)
  python benchmarks/quality_gate.py --augment   # same budget with the
      physics-aware flip augmentation ON (ablation receipt; thresholds
      still asserted — the synthetic covariates' u/v channels are block
      means of the fine u/v, so the sign-corrected flips are exactly
      consistent on this task)
  python benchmarks/quality_gate.py --conditional  # same budget with the
      conditional critic ON (Config.critic_conditional ablation receipt;
      thresholds still asserted)
  python benchmarks/quality_gate.py --stochastic   # same budget with a
      stochastic generator (Config.noise_channels=4): thresholds asserted
      on the fixed-realization metrics, plus a probabilistic report —
      fair CRPS / spread / ensemble-mean MAE over an 8-member test
      ensemble (CRPS <= member MAE is the informative-spread check)
  python benchmarks/quality_gate.py --freq-sep     # same budget with the
      frequency-separation trainer (hp.freq_sep=True — the reference's
      bit-rotted wasserstein_fs.py variant made first-class: critic sees
      high-pass residuals, content loss applies to the low-pass component;
      thresholds calibrated for the variant's own dynamics)
  python benchmarks/quality_gate.py --arch srresnet  # same budget with
      the second generator family (the reference's dead SRGAN variant,
      networks/generator.py:93-204, made real as
      Config.generator_arch="srresnet"); receipts that the family TRAINS
      to quality, not merely that it runs
  python benchmarks/quality_gate.py --divergence | --vorticity | --eof
      # same budget with ONE physics regularizer on the generator
      objective (hp.divergence_lambda / vorticity_lambda / eof_lambda =
      1.0 — the loss terms the reference ships but never wires into a
      trainer, losses.py:119-155 / :158-193 / :72-116): thresholds
      calibrated per variant, and the report carries the
      physical-consistency errors (std-normalized divergence/vorticity
      MSE between generated and real test fields) that show what the
      term buys
  python benchmarks/quality_gate.py --physics       # divergence +
      vorticity together (the combined physics run)
  python benchmarks/quality_gate.py --grad-accum 2  # compose any
      variant with microbatch gradient accumulation (per-microbatch
      physics-loss normalization semantics receipted at TRAINING scale,
      not just step scale; the variant key gains "accum")
  python benchmarks/quality_gate.py --calibrate     # run the budget and
      report metrics WITHOUT asserting thresholds (exit 0) — how new
      variant bounds are measured before being pinned here

Prints one JSON line ``{"gate": "quality", "passed": bool, ...}`` and
exits non-zero on failure, so it drops into any CI with TPU runners as a
single command; the smoke mode is exercised by ``tests/test_quality_gate.py``
on every CI run.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fixed budget: one seed, one schedule — change these and the thresholds
# must be recalibrated.
EPOCHS = 300
BATCH = 32
N_SAMPLES = 512
COVARIATE_NOISE = 0.5  # noise std per unit-variance covariate (SNR 4:1)

# Thresholds: calibrated on TPU per VARIANT (quality_gate_results.jsonl;
# the pinned budget is bit-reproducible at fixed seed, so margins are cut
# to regression-detecting width ~15-20% rather than the round-3
# harness-sanity bounds). MSSSIM climbs from ~0 only when the
# adversarial + content training actually works; RALSD (dB distance of
# radial log-spectra) only falls when generated fields carry realistic
# small-scale power. A change that halves MSSSIM or adds 2 dB of
# spectral error now FAILS every variant's gate.
#
# Receipted round-3 values per variant:
#   base                 MSSSIM 0.2613  RALSD 5.33  MAE 0.822
#   stochastic (nz=4)    MSSSIM 0.2578  RALSD 6.63  MAE 0.804
#   augment              MSSSIM 0.2707  RALSD 5.06  MAE ~0.82
#   conditional          MSSSIM 0.2437  RALSD 4.80  MAE ~0.83
#   augment+conditional  MSSSIM 0.2304  RALSD 5.63  MAE 0.829
THRESHOLDS_BY_VARIANT = {
    (): {"MSSSIM_test": (">=", 0.22), "RALSD_test": ("<=", 6.5),
         "MAE_test": ("<=", 0.87)},
    ("stochastic",): {"MSSSIM_test": (">=", 0.21), "RALSD_test": ("<=", 8.0),
                      "MAE_test": ("<=", 0.86)},
    ("augment",): {"MSSSIM_test": (">=", 0.22), "RALSD_test": ("<=", 6.2),
                   "MAE_test": ("<=", 0.87)},
    ("conditional",): {"MSSSIM_test": (">=", 0.20), "RALSD_test": ("<=", 6.0),
                       "MAE_test": ("<=", 0.88)},
    ("augment", "conditional"): {"MSSSIM_test": (">=", 0.19),
                                 "RALSD_test": ("<=", 7.0),
                                 "MAE_test": ("<=", 0.88)},
    # The tune-recommended production fast path (schedule=fused +
    # metrics_reuse_fake), held to the SAME bounds as the base variant —
    # the claim is that the fused round matches the reference schedule's
    # quality at the fixed budget (a slightly conservative budget: the
    # fused epoch drops the ragged <n_critic tail of each epoch's
    # steps). Receipt in quality_gate_results.jsonl.
    ("fused",): {"MSSSIM_test": (">=", 0.22), "RALSD_test": ("<=", 6.5),
                 "MAE_test": ("<=", 0.87)},
    # Frequency-separation trainer (reference wasserstein_fs.py made
    # first-class as hp.freq_sep). The critic only ever scores high-pass
    # residuals and the content loss only constrains the low-pass
    # component, so at this budget structure/pointwise metrics land below
    # the base variant by construction (the adversarial signal carries
    # ALL the small-scale structure) while the SPECTRUM is the best any
    # gate-budget variant measures — RALSD 3.67 dB vs the base 5.33.
    # Receipted on TPU: MSSSIM 0.1430 / RALSD 3.6681 / MAE 0.9376.
    ("freq_sep",): {"MSSSIM_test": (">=", 0.12), "RALSD_test": ("<=", 4.6),
                    "MAE_test": ("<=", 0.98)},
    # Physics regularizers (VERDICT r4 #2; reference losses.py:119-193 /
    # :72-116, shipped there but never wired into a trainer). Calibrated
    # on TPU at the fixed budget (quality_gate_results.jsonl round 5,
    # base re-run same session: MSSSIM 0.2613 / RALSD 5.3314 /
    # Div_err 1.9910 / Vort_err 1.9875):
    #   divergence λ=1   MSSSIM 0.2396  RALSD 5.1805  MAE 0.8243  Div 1.9868
    #   vorticity  λ=1   MSSSIM 0.2768  RALSD 4.9060  MAE 0.8280  Vort 1.9850
    #   eof        λ=1   MSSSIM 0.2589  RALSD 5.5154  MAE 0.8222
    #   div+vort +accum2 MSSSIM 0.2521  RALSD 5.9452  MAE 0.8151
    # What the terms buy at this budget: the paired-realization
    # derivative errors sit at their predictability floor (std-normalized
    # MSE = 2(1-rho) with the small-scale derivative realization largely
    # unpredictable from noisy covariates — all variants ~1.98-1.99, the
    # physics terms shave only ~0.003-0.005), but the terms act as real
    # REGULARIZERS: vorticity is the best structure+spectrum combo any
    # single knob has measured (MSSSIM +0.016, RALSD -0.43 dB vs base),
    # divergence trades structure for spectrum (-0.15 dB), EOF is
    # base-equivalent. The derivative-error bounds assert "no worse than
    # uncorrelated" (a sign-flipped/unphysical field would exceed 2).
    ("divergence",): {"MSSSIM_test": (">=", 0.20), "RALSD_test": ("<=", 6.2),
                      "MAE_test": ("<=", 0.88),
                      "Divergence_err_test": ("<=", 2.1)},
    ("vorticity",): {"MSSSIM_test": (">=", 0.23), "RALSD_test": ("<=", 5.9),
                     "MAE_test": ("<=", 0.88),
                     "Vorticity_err_test": ("<=", 2.1)},
    ("eof",): {"MSSSIM_test": (">=", 0.21), "RALSD_test": ("<=", 6.6),
               "MAE_test": ("<=", 0.87)},
    # The combined physics run (--physics). Calibrated: MSSSIM 0.2733 /
    # RALSD 5.3927 / MAE 0.8198 — structure near vorticity-alone's best,
    # spectrum ~base.
    ("divergence", "vorticity"): {
        "MSSSIM_test": (">=", 0.22), "RALSD_test": ("<=", 6.5),
        "MAE_test": ("<=", 0.87),
        "Divergence_err_test": ("<=", 2.1),
        "Vorticity_err_test": ("<=", 2.1)},
    # The combined physics run composed with microbatch accumulation
    # (per-microbatch std-normalization semantics at training scale).
    # Note the measured composition cost vs accum=1 (0.2733/5.39 ->
    # 0.2521/5.95): the physics terms normalize by a per-MICROBATCH std
    # (documented semantics), whose noisier estimate at microbatch 16
    # weakens both regularizers at this budget — prefer accum=1 when the
    # batch fits, and recalibrate if grad_accum changes.
    ("accum", "divergence", "vorticity"): {
        "MSSSIM_test": (">=", 0.21), "RALSD_test": ("<=", 7.1),
        "MAE_test": ("<=", 0.87),
        "Divergence_err_test": ("<=", 2.1),
        "Vorticity_err_test": ("<=", 2.1)},
    # Second generator family (generator_arch="srresnet"): a plain
    # residual trunk without the RRDB dense connections. Receipted on
    # TPU four times: runs 1, 3, and 4 are bit-identical (MSSSIM 0.2652,
    # RALSD 6.7958 dB, MAE 0.8050 — reproducibility holds for this
    # family too); run 2, which RECOMPILED while another gate process
    # held the single-tenant chip (concurrent compile under contention),
    # landed 0.6 dB away (7.39 dB / MAE 0.7995) — a different compiled
    # binary, not model nondeterminism. That contention mode is now
    # excluded by construction (chip_lock serializes every gate/bench
    # process, run 4 re-receipted the reproducible value under it), so
    # the spectral bound is re-tightened to the reproducible value +
    # ~10% margin instead of covering the contention outlier.
    # Structure/pointwise on par with the RRDB base at this budget,
    # spectrum ~1.5 dB behind (the dense blocks earn their FLOPs in
    # small-scale power).
    ("srresnet",): {"MSSSIM_test": (">=", 0.21), "RALSD_test": ("<=", 7.5),
                    "MAE_test": ("<=", 0.88)},
}
# The round-3 stochastic receipt also pinned an informative ensemble:
# fair CRPS 0.6819, 15% below the single-member MAE. Keep it that way.
ENSEMBLE_CRPS_MAX = 0.78


def run(smoke: bool, augment: bool = False, conditional: bool = False,
        stochastic: bool = False, fused: bool = False,
        freq_sep: bool = False, arch: str = "rrdb",
        divergence: bool = False, vorticity: bool = False,
        eof: bool = False, grad_accum: int = 1,
        calibrate: bool = False) -> dict:
    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.training.trainer import Trainer

    # Resolve the variant's calibrated bounds BEFORE spending the training
    # budget: an uncalibrated combo must abort here, not after the ~7 min
    # TPU run whose metrics it would then discard.
    variant = tuple(name for name, on in (
        ("accum", grad_accum > 1),
        ("augment", augment), ("conditional", conditional),
        ("divergence", divergence), ("eof", eof),
        ("freq_sep", freq_sep), ("fused", fused),
        ("srresnet", arch == "srresnet"),
        ("stochastic", stochastic), ("vorticity", vorticity)) if on)
    thresholds = ({} if (smoke or calibrate)
                  else THRESHOLDS_BY_VARIANT.get(variant))
    if thresholds is None:
        raise SystemExit(
            f"no calibrated thresholds for variant {variant}; run the "
            "combo with --calibrate on TPU first and add its receipt + "
            "bounds")

    # Physics-regularizer weights (VERDICT r4 #2): std-normalized MSE
    # terms are O(2) for uncorrelated fields; lambda 1.0 makes each term
    # comparable to the content term (content_lambda=5 x MAE~0.8) without
    # drowning the adversarial signal.
    phys_kw = dict(
        divergence_lambda=1.0 if divergence else 0.0,
        vorticity_lambda=1.0 if vorticity else 0.0,
        eof_lambda=1.0 if eof else 0.0,
        grad_accum=grad_accum,
    )
    if smoke:
        # Harness validation on CPU: tiny model/fields (MS-SSIM needs
        # >=128 px, so the spectral/structural metrics drop out), 2 epochs.
        config = Config(
            coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
            generator_arch=arch,
            noise_channels=2 if stochastic else 0,
            hp=HyperParams(batch_size=8, epochs=2,
                           schedule="fused" if fused else "reference",
                           metrics_reuse_fake=fused,
                           freq_sep=freq_sep, **phys_kw,
                           # smoke set is 28 train rows -> 3 steps/epoch;
                           # a fused round needs critic_iterations of them
                           critic_iterations=2 if fused else 5,
                           metrics_to_calculate=("MAE", "MSE", "Wass")),
        )
        n_samples = 32
    else:
        config = Config(
            critic_conditional=conditional,
            generator_arch=arch,
            noise_channels=4 if stochastic else 0,
            hp=HyperParams(
                batch_size=BATCH,
                epochs=EPOCHS,
                augment_flips=augment,
                # --fused: the tune-recommended production fast path
                # (textbook WGAN-GP rounds + reused metric fake) trains
                # at the SAME fixed budget — the quality receipt behind
                # making it the benchmark default.
                schedule="fused" if fused else "reference",
                metrics_reuse_fake=fused,
                freq_sep=freq_sep, **phys_kw,
                metrics_to_calculate=("MAE", "MSE", "MSSSIM", "RALSD", "Wass"),
            ))
        n_samples = N_SAMPLES

    coarse, fine = synthetic_dataset(
        n_samples=n_samples, coarse_size=config.coarse_size,
        fine_size=config.fine_size, n_covariates=config.n_covariates,
        n_predictands=config.n_predictands, seed=config.seed,
        covariate_noise=COVARIATE_NOISE,
    )
    split = int(0.9 * n_samples)
    train_ds = DeviceDataset.from_numpy(coarse[:split], fine[:split])
    test_ds = DeviceDataset.from_numpy(coarse[split:], fine[split:])

    trainer = Trainer(config, train_ds, test_ds, verbose=False)
    trainer.train()
    test_m = {f"{k}_test": round(float(v), 4)
              for k, v in trainer._run_test_pass().items()}

    # Physical-consistency report (VERDICT r4 #2): std-normalized
    # divergence/vorticity MSE between generated and real TEST fields —
    # the quantity the physics regularizers are supposed to buy
    # (reference losses.py:119-193). Reported for EVERY run (the
    # trainer's jitted eval forward already injects the FIXED eval
    # realization for stochastic generators, so the column is
    # deterministic there too); thresholded only where calibrated.
    import jax.numpy as jnp

    from downgan_tpu.ops.losses import divergence_loss, vorticity_loss

    fake = trainer._gen_fwd(trainer.state.g_params,
                            jnp.asarray(test_ds.coarse))
    fine_t = jnp.asarray(test_ds.fine)
    test_m["Divergence_err_test"] = round(
        float(divergence_loss(fine_t, fake)), 4)
    test_m["Vorticity_err_test"] = round(
        float(vorticity_loss(fine_t, fake)), 4)

    ens_report = None
    if stochastic:
        import numpy as np

        from downgan_tpu.inference import ensemble_metrics

        ens_report = {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in ensemble_metrics(
                          trainer.config, trainer.state.g_params,
                          np.asarray(test_ds.coarse), np.asarray(test_ds.fine),
                          n_members=3 if smoke else 8).items()}

    checks = {}
    passed = True
    for key, (op, bound) in thresholds.items():
        val = test_m.get(key)
        ok = val is not None and (val >= bound if op == ">=" else val <= bound)
        checks[key] = {"value": val, "op": op, "bound": bound, "ok": ok}
        passed = passed and ok
    if ens_report is not None and not smoke:
        ok = ens_report["CRPS"] <= ENSEMBLE_CRPS_MAX
        checks["ensemble_CRPS"] = {"value": ens_report["CRPS"], "op": "<=",
                                   "bound": ENSEMBLE_CRPS_MAX, "ok": ok}
        passed = passed and ok

    out = {
        "gate": "quality",
        "smoke": smoke,
        "augment": augment,
        "conditional": conditional,
        "stochastic": stochastic,
        "fused": fused,
        "freq_sep": freq_sep,
        "arch": arch,
        "divergence": divergence,
        "vorticity": vorticity,
        "eof": eof,
        "grad_accum": grad_accum,
        "calibrate": calibrate,
        "passed": passed,
        "epochs": config.hp.epochs,
        "covariate_noise": COVARIATE_NOISE,
        "metrics": test_m,
        "checks": checks,
    }
    if ens_report is not None:
        out["ensemble"] = ens_report
    return out


def main() -> None:
    smoke = "--smoke" in sys.argv
    arch = "rrdb"
    if "--arch" in sys.argv:
        i = sys.argv.index("--arch")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--arch requires a value (rrdb | srresnet)")
        arch = sys.argv[i + 1]
        if arch not in ("rrdb", "srresnet"):
            raise SystemExit(f"unknown --arch {arch!r} (rrdb | srresnet)")
    on_cpu = smoke or os.environ.get("QUALITY_GATE_FORCE_CPU") == "1"
    if on_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from downgan_tpu.utils.tpulock import chip_lock

    # Gate hygiene (VERDICT r4 #5): one gate at a time on the
    # single-tenant chip — a gate that compiles while another process
    # holds the chip can produce a different binary (the srresnet run-2
    # outlier), so the lock wraps compile + the whole budget run.
    grad_accum = 1
    if "--grad-accum" in sys.argv:
        i = sys.argv.index("--grad-accum")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--grad-accum requires an integer value")
        grad_accum = int(sys.argv[i + 1])
    physics = "--physics" in sys.argv  # combined divergence + vorticity
    with chip_lock(enabled=not on_cpu):
        from downgan_tpu.runtime import setup_cache

        setup_cache()
        out = run(smoke, augment="--augment" in sys.argv,
                  conditional="--conditional" in sys.argv,
                  stochastic="--stochastic" in sys.argv,
                  fused="--fused" in sys.argv,
                  freq_sep="--freq-sep" in sys.argv,
                  arch=arch,
                  divergence=physics or "--divergence" in sys.argv,
                  vorticity=physics or "--vorticity" in sys.argv,
                  eof="--eof" in sys.argv,
                  grad_accum=grad_accum,
                  calibrate="--calibrate" in sys.argv)
    print(json.dumps(out))
    sys.exit(0 if out["passed"] else 1)


if __name__ == "__main__":
    main()
