"""The fixed-budget quality gate's harness runs end-to-end (VERDICT r2 #9).

The REAL gate (300 epochs at florida scale, MSSSIM/RALSD thresholds) runs
on TPU hardware as one command — ``python benchmarks/quality_gate.py`` —
with calibrated thresholds; this test exercises the full harness path
(noisy-covariate synthetic data, Trainer budget run, JSON verdict, exit
code) in smoke mode on CPU so CI catches harness rot.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

GATE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "benchmarks", "quality_gate.py")


def test_quality_gate_smoke():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, GATE, "--smoke"], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stdout
    rec = json.loads(lines[-1])
    assert rec["gate"] == "quality"
    assert rec["smoke"] is True
    assert rec["passed"] is True
    # smoke mode still trains for real: finite metrics from the test pass
    assert rec["metrics"]["MAE_test"] > 0
    assert rec["metrics"]["Wass_test"] == rec["metrics"]["Wass_test"]  # not NaN


def test_quality_gate_smoke_fused():
    """--fused drives the tune-recommended production fast path (fused
    schedule + reused metric fake) through the same harness."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, GATE, "--smoke", "--fused"], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["fused"] is True
    assert rec["passed"] is True
    assert rec["metrics"]["MAE_test"] > 0


def test_quality_gate_smoke_stochastic():
    """--stochastic trains a noise-conditioned generator and appends the
    probabilistic report (fair CRPS / spread / ensemble-mean MAE)."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, GATE, "--smoke", "--stochastic"], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["stochastic"] is True
    ens = rec["ensemble"]
    assert ens["n_members"] == 3
    # a noise-conditioned generator yields distinct members -> positive spread
    assert ens["spread"] > 0
    assert ens["CRPS"] > 0 and ens["member_MAE"] > 0


def test_quality_gate_smoke_freq_sep_and_srresnet():
    """--freq-sep (reference wasserstein_fs.py made first-class) and
    --arch srresnet (the second generator family) drive their variants
    through the same harness; variant flags land in the verdict JSON."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for extra, key, want in ((["--freq-sep"], "freq_sep", True),
                             (["--arch", "srresnet"], "arch", "srresnet")):
        proc = subprocess.run(
            [sys.executable, GATE, "--smoke"] + extra, env=env,
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("{")]
        rec = json.loads(lines[-1])
        assert rec[key] == want
        assert rec["passed"] is True
        assert rec["metrics"]["MAE_test"] > 0


def test_quality_gate_smoke_physics_and_accum():
    """--physics (divergence + vorticity regularizers ON) composed with
    --grad-accum 2 drives the physics terms through the microbatch
    accumulation path, and every deterministic run now reports the
    physical-consistency errors (VERDICT r4 #2)."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, GATE, "--smoke", "--physics", "--grad-accum", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["divergence"] is True and rec["vorticity"] is True
    assert rec["grad_accum"] == 2
    assert rec["passed"] is True
    assert rec["metrics"]["Divergence_err_test"] > 0
    assert rec["metrics"]["Vorticity_err_test"] > 0


def test_quality_gate_smoke_eof():
    """--eof fits the EOF basis from the training fine fields and trains
    with the EOF-projection regularizer on the generator objective."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, GATE, "--smoke", "--eof"], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["eof"] is True
    assert rec["passed"] is True
    assert rec["metrics"]["MAE_test"] > 0


def test_quality_gate_uncalibrated_combo_aborts_before_training():
    """An uncalibrated variant combo must abort up front naming
    --calibrate, not after spending the training budget."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["QUALITY_GATE_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, GATE, "--eof", "--conditional", "--stochastic"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "no calibrated thresholds" in (proc.stderr + proc.stdout)
    assert "--calibrate" in (proc.stderr + proc.stdout)


def test_stream_soak_smoke():
    """The production-scale residency soak (benchmarks/stream_soak.py):
    writer record + per-tier subprocess receipts with their own host-RSS
    ceilings."""
    bench = os.path.join(os.path.dirname(GATE), "stream_soak.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, bench, "--smoke"], env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    recs = [json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith("{")]
    assert recs[0]["writer"] == "preprocessed_netcdf"
    tiers = {r["tier"]: r for r in recs[1:]}
    assert set(tiers) == {"device", "stream"}
    for r in tiers.values():
        assert r["steady_epoch_s"] > 0
        assert r["patches_per_sec"] > 0
        assert r["max_rss_mb"] > 0
        assert r["py_peak_mb"] > 0


def test_stream_bench_smoke():
    """The data-residency throughput harness (benchmarks/stream_bench.py)
    runs all three tiers end-to-end in smoke mode."""
    bench = os.path.join(os.path.dirname(GATE), "stream_bench.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, bench, "--smoke"], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    tiers = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    assert [t["tier"] for t in tiers] == ["device", "host", "stream"]
    assert all(t["steady_epoch_s"] > 0 for t in tiers)
