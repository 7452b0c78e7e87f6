"""Full-domain tiled SR inference timing (PERF.md "Inference" numbers).

Times ``parallel.spatial.tiled_sr_inference`` on the PERF.md full-domain
workload — 8 x (56x112) coarse fields -> 8 x (448x896) fine — comparing
per-tile dispatch (tiles_per_dispatch=1, round 1's behavior) against the
batched-dispatch default, and 1-D row bands against 2-D tiles. Steady
state: first call per config compiles, second is timed.

Usage: python benchmarks/tiled_inference_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.parallel.spatial import tiled_sr_inference
    from downgan_tpu.runtime import setup_cache
    from downgan_tpu.training.state import create_state

    setup_cache()
    config = Config(hp=HyperParams(batch_size=8))
    state = create_state(config, jax.random.PRNGKey(0))
    coarse = np.random.default_rng(0).standard_normal((8, 56, 112, 7)).astype(np.float32)

    cases = [
        ("per_tile_dispatch_rows", dict(tile_rows=16, overlap=8, tiles_per_dispatch=1)),
        ("batched_dispatch_rows", dict(tile_rows=16, overlap=8, tiles_per_dispatch=8)),
        ("batched_dispatch_2d", dict(tile_rows=16, overlap=8, tile_cols=16,
                                     tiles_per_dispatch=8)),
    ]
    outs = {}
    for name, kw in cases:
        tiled_sr_inference(config, state.g_params, coarse, **kw)  # compile
        t0 = time.perf_counter()
        out = tiled_sr_inference(config, state.g_params, coarse, **kw)
        dt = time.perf_counter() - t0
        outs[name] = out
        print(json.dumps({
            "metric": f"tiled_sr_full_domain_{name}",
            "value": round(dt, 3),
            "unit": "s (8 fields, 448x896 fine)",
            "fields_per_sec": round(8 / dt, 2),
        }))
    # dispatch batching must not change results
    err = float(np.abs(outs["per_tile_dispatch_rows"] - outs["batched_dispatch_rows"]).max())
    print(json.dumps({"rows_dispatch_equivalence_max_err": err}))


if __name__ == "__main__":
    main()
