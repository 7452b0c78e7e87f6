"""The benchmark harness itself is testable off-TPU (VERDICT r2 #2).

``bench.py`` is what produces the headline number on real hardware; these
tests run the FULL harness path — mesh build, DP shardings, jitted scan,
scalar-fetch sync, JSON emission — on a virtual CPU mesh, so that on a
v5e-8 (or a pod) the headline is one command with no new code:

  * single-process over an 8-virtual-device mesh;
  * 2 real jax.distributed processes x 2 devices with BENCH_MULTIHOST=1
    (per-host batch assembly through make_global_batch).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")


def _bench_env(n_devices: int, **extra: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.update(
        BENCH_FORCE_CPU="1",
        BENCH_SMOKE="1",
        # smoke defaults: batch 8, 2 scan steps, 1 rep, tiny model
        **extra,
    )
    return env


def _last_json_line(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in bench output: {stdout!r}"
    return json.loads(lines[-1])


def test_bench_smoke_8_device_mesh():
    proc = subprocess.run(
        [sys.executable, BENCH], env=_bench_env(8), capture_output=True,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    rec = _last_json_line(proc.stdout)
    assert rec["n_chips"] == 8
    assert rec["unit"] == "patches/sec/chip"
    assert rec["value"] > 0
    # value is rounded independently of the aggregate; allow rounding slack
    assert rec["aggregate_patches_per_sec"] == pytest.approx(
        rec["value"] * 8, abs=0.8)
    assert rec["vs_baseline"] > 0
    assert "smoke" in rec["metric"]
    # self-audit fields (VERDICT r3): FLOP census + raw rep times
    assert rec["schedule"] == "reference"
    assert rec["flops_per_step"] > 0
    assert len(rec["rep_times_s"]) == 1  # BENCH_REPS smoke default


def test_bench_smoke_fused_schedule():
    """BENCH_SCHEDULE=fused measures build_fused_round: per-round patch
    accounting (batch * critic_iterations) and a bigger FLOP census than
    the per-step reference schedule."""
    env = _bench_env(8, BENCH_SCHEDULE="fused")
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    rec = _last_json_line(proc.stdout)
    assert rec["schedule"] == "fused"
    assert "_fused" in rec["metric"]
    assert rec["value"] > 0
    # one round = critic_iterations minibatches: patches/sec accounting
    # scales value by n_critic relative to rounds/sec
    assert rec["aggregate_patches_per_sec"] == pytest.approx(
        rec["steps_per_sec"] * 8 * 5, rel=0.05)

    ref = subprocess.run(
        [sys.executable, BENCH], env=_bench_env(8), capture_output=True,
        text=True, timeout=600,
    )
    ref_rec = _last_json_line(ref.stdout)
    # a fused ROUND does ~n_critic times the critic work of one step
    assert rec["flops_per_step"] > 2 * ref_rec["flops_per_step"]


def test_bench_smoke_dual_emits_parity_and_tuned():
    """BENCH_DUAL=1 (the non-smoke default with no explicit schedule
    knobs) measures BOTH the reference-parity step and the tuned fused
    production point in one run: ONE JSON line, tuned record top-level,
    full parity record nested under reference_parity — each with its own
    FLOP census (VERDICT r4: the archived BENCH_rN artifact must be
    self-contained)."""
    env = _bench_env(8, BENCH_DUAL="1")
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1  # still ONE JSON line (driver contract)
    rec = json.loads(lines[0])
    assert rec["dual"] is True
    assert rec["schedule"] == "fused"
    assert "_reusefake" in rec["metric"]
    parity = rec["reference_parity"]
    assert parity["schedule"] == "reference"
    assert "_reusefake" not in parity["metric"]
    for r in (rec, parity):
        assert r["value"] > 0
        assert r["vs_baseline"] > 0
        assert r["flops_per_step"] > 0
        assert r["rep_times_s"]
    # a fused ROUND does ~n_critic x the per-iteration work of one step
    assert rec["flops_per_step"] > 2 * parity["flops_per_step"]
    # explicit schedule knobs must keep sweeps single-variant
    single = subprocess.run(
        [sys.executable, BENCH], env=_bench_env(8, BENCH_SCHEDULE="fused"),
        capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stderr[-4000:]
    assert "reference_parity" not in _last_json_line(single.stdout)


def test_tune_smoke(tmp_path, monkeypatch):
    """`downgan tune` sweeps candidates through the bench harness and
    writes the recommended production config. A --config base is plumbed
    to the measuring subprocess (BENCH_CONFIG) and carried into the
    recommendation; stray exported BENCH_* vars must not leak into the
    sweep."""
    import dataclasses

    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli
    from downgan_tpu.config.config import Config, HyperParams

    # Would switch every candidate to the inference bench (whose JSON has
    # no aggregate field) if it leaked through — the scrub must drop it.
    monkeypatch.setenv("BENCH_MODE", "infer")

    base = Config(hp=HyperParams(critic_iterations=3,
                                 metrics_to_calculate=("MAE", "MSE", "Wass")))
    base_path = tmp_path / "base.json"
    base_path.write_text(base.to_json())

    out = str(tmp_path / "tuned.json")
    sweep_out = str(tmp_path / "sweep.json")
    result = CliRunner().invoke(
        cli,
        ["tune", "--smoke", "--config", str(base_path),
         "--batches", "8", "--dtypes", "float32",
         "--schedules", "reference",
         "--scan-steps", "2", "--reps", "1", "--no-fast-paths",
         "--out", out, "--sweep-out", sweep_out],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    report = json.loads(
        [l for l in result.output.splitlines() if l.startswith("{")][-1])
    assert report["best"]["batch"] == 8
    assert report["best"]["value"] > 0
    assert report["recommended_hp"]["metrics_reuse_fake"] is False
    with open(out) as f:
        cfg = Config.from_json(f.read())
    assert cfg.hp.batch_size == 8
    assert cfg.hp.compute_dtype == "float32"
    # the --config base (not the default) is what the recommendation edits
    assert cfg.hp.critic_iterations == 3
    # the full-sweep artifact carries complete bench records (variance
    # hygiene: rep times + FLOP census live in artifacts, not prose)
    with open(sweep_out) as f:
        sweep = json.load(f)
    assert sweep["best"] == report["best"]["metric"]
    assert all("rep_times_s" in r for r in sweep["sweep"])


def test_tune_smoke_fused_schedule(tmp_path):
    """Sweeping --schedules fused recommends hp.schedule='fused'."""
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli
    from downgan_tpu.config.config import Config

    out = str(tmp_path / "tuned.json")
    result = CliRunner().invoke(
        cli,
        ["tune", "--smoke", "--batches", "8", "--dtypes", "float32",
         "--schedules", "fused", "--scan-steps", "2", "--reps", "1",
         "--no-fast-paths", "--out", out],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    report = json.loads(
        [l for l in result.output.splitlines() if l.startswith("{")][-1])
    assert report["recommended_hp"]["schedule"] == "fused"
    with open(out) as f:
        cfg = Config.from_json(f.read())
    assert cfg.hp.schedule == "fused"


def test_tune_smoke_grad_accum_axis(tmp_path):
    """--grad-accums crosses hp.grad_accum with the batch axis (skipping
    non-dividing combos) and the winner's accum lands in the recommended
    config."""
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli
    from downgan_tpu.config.config import Config

    out = str(tmp_path / "tuned.json")
    result = CliRunner().invoke(
        cli,
        ["tune", "--smoke", "--batches", "8", "--dtypes", "float32",
         "--schedules", "reference", "--grad-accums", "1,2,3",
         "--scan-steps", "2", "--reps", "1", "--no-fast-paths",
         "--out", out],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    report = json.loads(
        [l for l in result.output.splitlines() if l.startswith("{")][-1])
    # accum 3 does not divide batch 8 -> two measured candidates
    assert len(report["candidates"]) == 2
    assert report["recommended_hp"]["grad_accum"] in (1, 2)
    with open(out) as f:
        cfg = Config.from_json(f.read())
    assert cfg.hp.grad_accum == report["recommended_hp"]["grad_accum"]


def test_tune_all_combos_skipped_reports_constraint(tmp_path):
    """A sweep where no batch divides any grad-accum aborts up front
    naming the divisibility constraint (not 'failed or timed out'), and
    the skip line prints once per combo, not per schedule x dtype."""
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli

    result = CliRunner().invoke(
        cli,
        ["tune", "--smoke", "--batches", "8", "--dtypes", "float32,bfloat16",
         "--schedules", "reference,fused", "--grad-accums", "3",
         "--scan-steps", "2", "--reps", "1", "--no-fast-paths",
         "--out", str(tmp_path / "tuned.json")],
    )
    assert result.exit_code != 0
    assert "no runnable (batch, grad-accum) combination" in result.output
    assert "failed or timed out" not in result.output
    assert result.output.count("b8 accum3: skipped") == 1


def test_bench_smoke_multihost_two_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, BENCH],
            env=_bench_env(
                2,
                BENCH_MULTIHOST="1",
                BENCH_COORDINATOR=coordinator,
                BENCH_NUM_PROCESSES="2",
                BENCH_PROCESS_ID=str(pid),
            ),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, stderr[-4000:]
        outs.append(stdout)
    # only process 0 prints the record (Gloo banner lines may precede it)
    json_outs = [o for o in outs
                 if any(l.startswith("{") for l in o.splitlines())]
    assert len(json_outs) == 1
    rec = _last_json_line(json_outs[0])
    assert rec["n_chips"] == 4
    assert rec["n_processes"] == 2
    assert rec["value"] > 0
    assert rec["aggregate_patches_per_sec"] == pytest.approx(
        rec["value"] * 4, abs=0.8)
