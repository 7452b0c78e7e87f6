"""Serving-layer throughput under concurrent load (PERF.md receipt).

Starts the HTTP service in-process on the florida generator with the
coalescing BatchingSRModel, hammers /v1/generate from N client threads
sending M requests of `req_samples` patches each, and reports requests/s,
patches/s, dispatch count (coalescing effectiveness) and p50/p95 request
latency from /metrics.

Usage: python benchmarks/serving_bench.py [n_clients] [reqs_per_client]
       (--stochastic serves a noise_channels=4 generator — receipts that
       the host-side eval-latent append keeps probabilistic serving at
       the deterministic path's request rate)
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--stochastic"]
    stochastic = "--stochastic" in sys.argv[1:]
    n_clients = int(args[0]) if len(args) > 0 else 8
    reqs_per_client = int(args[1]) if len(args) > 1 else 10
    req_samples = 8

    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.runtime import setup_cache
    from downgan_tpu.serving import BatchingSRModel, generate_remote, serve_model
    from downgan_tpu.training.state import create_state
    from downgan_tpu.utils.tpulock import hold_chip_lock

    hold_chip_lock(enabled=True)  # held until process exit
    setup_cache()
    config = Config(hp=HyperParams(batch_size=32),
                    noise_channels=4 if stochastic else 0)
    state = create_state(config, jax.random.PRNGKey(0))
    model = BatchingSRModel(config, state.g_params, batch_size=64,
                            max_wait_ms=5.0)
    # warm the compiled program before timing
    model.generate(np.zeros((1, 16, 16, 7), np.float32))

    server = serve_model(model, host="127.0.0.1", port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    rng = np.random.default_rng(0)
    payloads = [rng.standard_normal((req_samples, 16, 16, 7)).astype(np.float32)
                for _ in range(n_clients)]
    errors = []

    def client(i):
        try:
            for _ in range(reqs_per_client):
                out = generate_remote(url, payloads[i])
                assert out.shape == (req_samples, 128, 128, 2)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    assert not errors, errors[:3]

    stats = model.stats()
    total_reqs = n_clients * reqs_per_client
    print(json.dumps({
        "metric": ("serving_requests_per_sec_stochastic" if stochastic
                   else "serving_requests_per_sec"),
        "value": round(total_reqs / wall, 1),
        "unit": "req/s",
        "patches_per_sec": round(total_reqs * req_samples / wall, 1),
        "clients": n_clients,
        "req_samples": req_samples,
        "dispatches": stats["dispatches"],
        "coalesce_ratio": round(stats["requests"] / stats["dispatches"], 2),
        "latency_ms_p50": stats["latency_ms_p50"],
        "latency_ms_p95": stats["latency_ms_p95"],
    }))
    model.close()
    server.shutdown()


if __name__ == "__main__":
    main()
