"""The Adam end-to-end training-equivalence harness runs (VERDICT r3 #1).

The REAL receipt — 1000 steps of the reference's actual torch Adam loop
(critic iteration + GP + Adam lr=2.5e-4 β=(0.9,0.99),
``/root/reference/DoWnGAN/GAN/wasserstein.py:27-83``, ``GAN/stage.py:63-64``)
head-to-head against the shipped downgan_tpu step from identical ported
initial weights on an identical batch sequence — runs as one command,
``python benchmarks/adam_equivalence.py`` (~5 min CPU), with its result
committed in ``benchmarks/adam_equivalence_results.jsonl``. This test
exercises the full harness path (reference import, weight port, both
training loops, the shared measuring stick, the band logic) in smoke mode
so CI catches harness rot; the smoke's 40 steps must already TRACK (the
calibrated per-point bands apply from the first eval), it just isn't long
enough to assert learning.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

HARNESS = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "benchmarks", "adam_equivalence.py")


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not present")
def test_adam_equivalence_smoke():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, HARNESS, "--smoke"], env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stdout
    rec = json.loads(lines[-1])
    assert rec["gate"] == "adam_equivalence"
    assert rec["passed"] is True
    # ported init: both sides start from the SAME weights, so the first
    # record's diffs are the measuring-stick fp floor
    assert all(v <= 1e-3 for v in rec["init_diff"].values()), rec["init_diff"]
    # trajectories genuinely tracked (not vacuous): real diffs recorded
    assert rec["steps"] == 40
    assert len(rec["trajectory"]) == 3  # init + evals at 20, 40


def _committed_records():
    path = os.path.join(os.path.dirname(HARNESS),
                        "adam_equivalence_results.jsonl")
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_committed_receipt_is_green():
    """The committed 1000-step result must exist, pass, and carry the
    learning evidence — a drift in either side's dynamics regenerates
    this file red."""
    recs = [r for r in _committed_records()
            if r["steps"] >= 600 and r["fine_hw"] < 112]
    assert recs, "no long-budget toy receipt committed"
    rec = recs[-1]
    assert rec["passed"] is True
    assert rec["wass_traj_corr"] >= 0.95
    assert rec["violations"] == []


def test_committed_florida_receipt_is_green():
    """The full-geometry receipt (VERDICT r4 #4): the REAL workload shape
    (16x16x7 -> 128x128x2, filters 16, 16 RRDBs — 4x the toy's fp
    accumulation depth) tracks the reference torch loop at every eval
    point, with the independent torch-side MS-SSIM oracle in the metric
    set agreeing with the jax metric on both sides' fields."""
    recs = [r for r in _committed_records()
            if r["fine_hw"] == 128 and r.get("filters") == 16]
    assert recs, "no florida-geometry receipt committed"
    rec = recs[-1]
    assert rec["passed"] is True
    assert rec["num_res_blocks"] == 16
    assert rec["violations"] == []
    # the trajectory-level checks actually RAN (learning_min_steps gate)
    # and the recorded correlation clears the recorded band — a receipt
    # cannot imply enforcement of bands that never applied
    assert rec["steps"] >= rec.get("learning_min_steps", 600)
    assert rec["wass_traj_corr"] >= rec["bands"]["Wass"]["corr_min"]
    # ported full-depth init is exact to the measuring stick's fp floor
    assert all(v <= 1e-3 for v in rec["init_diff"].values())
    # the torch-oracle stick was in the set and tracked like the jax one
    assert rec["max_diff"]["MSSSIM_torch"] <= 0.08
    assert abs(rec["max_diff"]["MSSSIM_torch"]
               - rec["max_diff"]["MSSSIM"]) <= 1e-3
