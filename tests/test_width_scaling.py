"""Harness check for the width-scaling MFU receipt
(benchmarks/width_scaling.py): the sweep drives the real bench harness
end-to-end on the CPU backend and the self-audit fields the receipt
keys on (FLOP census, params, mfu_vs_peak) come back consistent."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_width_scaling_smoke():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "width_scaling.py"),
         "--smoke"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    records = [json.loads(l) for l in proc.stdout.splitlines()
               if l.startswith("{")]
    assert [r["width"] for r in records] == [8, 16]
    by_width = {r["width"]: r for r in records}
    for rec in records:
        assert rec["value"] > 0
        assert rec["filters"] == rec["width"]
        # Self-audit fields present: the census counted every piece and
        # the fake smoke peak exercises the MFU field.
        assert rec["flops_per_step"] > 0
        assert rec["mfu_vs_peak"] > 0
        assert rec["g_params"] > 0 and rec["c_params"] > 0
    # Wider model => more params and more FLOPs per step — the axis the
    # receipt scales along.
    assert by_width[16]["g_params"] > by_width[8]["g_params"]
    assert by_width[16]["c_params"] > by_width[8]["c_params"]
    assert by_width[16]["flops_per_step"] > by_width[8]["flops_per_step"]
