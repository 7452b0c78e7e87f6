"""HTTP inference service for super-resolution generation.

The task brief calls for production serving; the reference's only
inference surface is a batch CLI (``helpers/gen_fake_ds.py``). This is a
dependency-free serving layer: a stdlib HTTP server holding a jitted
generator with fixed-size batching (static shapes — ragged requests are
padded to the compiled batch and trimmed), so every request after the
first reuses one compiled program.

Protocol:
  * ``GET /healthz``                -> ``{"status": "ok", ...}``
  * ``GET /metrics``                -> request/sample/dispatch counters +
    p50/p95 request latency (observability)
  * ``POST /v1/generate`` with a .npy body of coarse covariates
    (N, h, w, C) float32        -> .npy body of generated (N, H, W, P)
  * ``POST /v1/generate-domain?tile_rows=16&overlap=8&tile_cols=0&``
    ``tiles_per_dispatch=8`` with a .npy body of ARBITRARY-size coarse
    fields (B, H, W, C) -> .npy of (B, H*sf, W*sf, P) via overlap-tiled
    inference (the full-domain path the training-patch endpoint cannot
    serve). Domain requests bypass request coalescing (uniquely-shaped
    fields have no shared compiled batch) and are bounded by BOTH a body
    cap and an estimated-OUTPUT cap (413) — the output is ~sf^2*(P/C)
    times the input, so a body cap alone would not protect host RAM.

Client: ``downgan_tpu.serving.generate_remote(url, coarse)``.
Run: ``python -m downgan_tpu.cli serve --checkpoint <dir>``.
"""
from __future__ import annotations

import collections
import io
import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from downgan_tpu.config.config import Config


class RequestTooLarge(ValueError):
    """A request's input or estimated output exceeds the serving caps."""


class SRModel:
    """Jitted generator with fixed-batch padding; thread-safe."""

    def __init__(self, config: Config, g_params, batch_size: int = 0,
                 max_request_samples: int = 8192,
                 max_domain_output_bytes: int = 1 << 30,
                 mesh=None):
        from downgan_tpu.training.state import make_models

        self.config = config
        self.batch = batch_size or config.chunk_size
        gen, _ = make_models(config)
        # Stochastic generators serve the FIXED eval noise realization
        # (wgan.eval_noise_rng): responses are deterministic — the same
        # request always returns the same fields. Ensemble draws are an
        # offline workflow (`generate --ensemble`), not a serving concern.
        # Each request's samples get the latents of their OWN padded block
        # layout (row i of a compiled-batch block gets eval-noise row i),
        # appended as extra input channels, so a coalesced union batch
        # reproduces the direct path's latents bit-for-bit — injecting
        # inside the forward would key each latent on union-batch
        # position, i.e. on whatever concurrent traffic a request happened
        # to coalesce with. The latent block is a constant (fixed rng,
        # fixed block shape): materialize it ONCE here and append on host
        # (_augment) — zero per-request device traffic.
        from downgan_tpu.training.wgan import eval_noise_rng

        self._stochastic = config.noise_channels > 0
        self._eval_noise = (
            np.asarray(jax.random.normal(
                eval_noise_rng(config),
                (self.batch, config.coarse_size, config.coarse_size,
                 config.noise_channels), jnp.float32))
            if self._stochastic else None)
        self._fwd = jax.jit(gen.apply)
        # Multi-chip domain inference: tiles shard over the mesh's data
        # axis (parallel.spatial.tiled_sr_inference(mesh=...)). The
        # fixed-batch patch path stays single-program — its batches are
        # latency-sized, and GSPMD would add a gather per dispatch.
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            g_params = jax.device_put(
                g_params, NamedSharding(mesh, PartitionSpec()))
        self._params = g_params
        self._lock = threading.Lock()
        # Observability counters (GET /metrics): requests/samples served,
        # device dispatches, recent request latencies for p50/p95.
        self.dispatch_count = 0
        self._stats_lock = threading.Lock()
        self._requests = 0
        self._samples = 0
        self._latencies_ms: "collections.deque[float]" = collections.deque(maxlen=512)
        # Request-body cap: the largest legal payload is max_request_samples
        # coarse patches (float32) plus npy header slack. Anything larger is
        # rejected with 413 BEFORE the body is read, so one oversized request
        # cannot exhaust host RAM.
        per_sample = config.coarse_size * config.coarse_size * config.n_covariates * 4
        self.max_request_bytes = max_request_samples * per_sample + 4096
        # Domain requests carry whole fields, not training patches — allow
        # proportionally more before the 413 cut. The binding bound for
        # domain traffic is max_domain_output_bytes below: the OUTPUT is
        # ~sf^2 * (P/C) times the input (~18x on the florida defaults), so
        # capping only the body would still admit requests whose response
        # allocation exhausts host RAM.
        self.max_domain_request_bytes = 4 * self.max_request_bytes
        self.max_domain_output_bytes = max_domain_output_bytes

    def check_domain_output(self, shape) -> None:
        """Reject a domain request whose OUTPUT allocation would exceed
        the cap, after the .npy header is parsed but before any compute:
        output bytes = B * (H*sf) * (W*sf) * n_predictands * 4."""
        b, h, w = int(shape[0]), int(shape[1]), int(shape[2])
        sf = 2 ** self.config.num_upsample
        out_bytes = b * (h * sf) * (w * sf) * self.config.n_predictands * 4
        if out_bytes > self.max_domain_output_bytes:
            raise RequestTooLarge(
                f"estimated output {out_bytes} bytes for input shape "
                f"{tuple(shape)} exceeds cap {self.max_domain_output_bytes}"
            )

    def _validate_patches(self, coarse: np.ndarray) -> None:
        """Shared request contract for the patch endpoints (direct AND
        coalesced paths — one site, so they cannot drift)."""
        cs, c = self.config.coarse_size, self.config.n_covariates
        if coarse.ndim != 4 or coarse.shape[1:] != (cs, cs, c):
            raise ValueError(
                f"expected (N, {cs}, {cs}, {c}) float32, got {coarse.shape}")
        if coarse.shape[0] == 0:
            raise ValueError("empty request: need at least one sample")

    def _pad_blocks(self, union: np.ndarray):
        """Yield compiled-batch-size blocks of ``union`` (last one padded),
        with the pad count — the ONE padding rule every dispatch path uses."""
        for start in range(0, union.shape[0], self.batch):
            block = union[start : start + self.batch]
            pad = self.batch - block.shape[0]
            if pad:
                block = np.concatenate(
                    [block, np.zeros((pad, *block.shape[1:]), block.dtype)]
                )
            yield block, pad

    def _augment(self, coarse: np.ndarray) -> np.ndarray:
        """Append this request's fixed eval latents as extra input channels,
        in the request's OWN padded block layout (row i of each
        compiled-batch block gets eval-noise row i) — exactly the latents
        an in-forward injection would draw for a standalone request, with
        no lock or device work (the block is precomputed in __init__)."""
        if not self._stochastic:
            return coarse
        n = coarse.shape[0]
        z = np.concatenate([self._eval_noise[: min(self.batch, n - s)]
                            for s in range(0, n, self.batch)])
        return np.concatenate([coarse, z], axis=-1)

    def generate(self, coarse: np.ndarray) -> np.ndarray:
        self._validate_patches(coarse)
        t0 = time.perf_counter()  # latency includes latent injection
        coarse = self._augment(np.asarray(coarse, np.float32))
        outs = []
        with self._lock:  # one compiled program, serialized TPU access
            for block, pad in self._pad_blocks(coarse):
                fake = np.asarray(self._fwd(self._params, jnp.asarray(block, jnp.float32)))
                self.dispatch_count += 1
                outs.append(fake[: self.batch - pad] if pad else fake)
        self._record(coarse.shape[0], time.perf_counter() - t0)
        return np.concatenate(outs, axis=0)

    def generate_domain(self, coarse: np.ndarray, tile_rows: int = 16,
                        overlap: int = 8, tile_cols: int = 0,
                        tiles_per_dispatch: int = 8) -> np.ndarray:
        """Overlap-tiled SR over arbitrary-size fields (B, H, W, C) — the
        serving surface of :func:`parallel.spatial.tiled_sr_inference`.

        Domain requests bypass the :class:`BatchingSRModel` coalescer by
        design (each carries a uniquely-shaped whole field, so there is no
        shared compiled batch to fold them into); they serialize against
        all other device work on the model lock. ``/metrics`` counts the
        REAL device dispatches the tiler issues
        (:func:`parallel.spatial.count_tiled_dispatches`), not one logical
        dispatch per request."""
        from downgan_tpu.parallel.spatial import (
            count_tiled_dispatches,
            tiled_sr_inference,
        )

        if coarse.ndim != 4 or coarse.shape[-1] != self.config.n_covariates:
            raise ValueError(
                f"expected (B, H, W, {self.config.n_covariates}) float32, "
                f"got {coarse.shape}"
            )
        if tile_rows < 1 or overlap < 0 or tile_cols < 0:
            raise ValueError(
                f"invalid tiling: tile_rows={tile_rows} (>=1), "
                f"overlap={overlap} (>=0), tile_cols={tile_cols} (>=0)"
            )
        if tiles_per_dispatch < 1:
            raise ValueError(
                f"tiles_per_dispatch must be >= 1, got {tiles_per_dispatch}")
        self.check_domain_output(coarse.shape)
        t0 = time.perf_counter()
        b, h, w, _ = coarse.shape
        # Clamp the fold to the request's real tile count: the tiler pads
        # the last chunk UP to tiles_per_dispatch, so a client-supplied
        # huge value would otherwise force an unbounded device/host
        # allocation (the same class of over-allocation the output cap
        # guards against). Clamped, the worst case is one dispatch of all
        # tiles — already bounded by check_domain_output.
        n_tiles = (b * -(-h // tile_rows)
                   * (-(-w // tile_cols) if tile_cols else 1))
        tiles_per_dispatch = min(tiles_per_dispatch, n_tiles)
        with self._lock:  # serialized device access
            out = tiled_sr_inference(
                self.config, self._params, np.asarray(coarse, np.float32),
                tile_rows=tile_rows, overlap=overlap, tile_cols=tile_cols,
                tiles_per_dispatch=tiles_per_dispatch, mesh=self._mesh,
            )
            self.dispatch_count += count_tiled_dispatches(
                b, h, w, tile_rows, tile_cols, tiles_per_dispatch,
                mesh_size=(self._mesh.devices.size
                           if self._mesh is not None else 1))
        self._record(coarse.shape[0], time.perf_counter() - t0)
        return out

    def _record(self, n_samples: int, seconds: float) -> None:
        with self._stats_lock:
            self._requests += 1
            self._samples += n_samples
            self._latencies_ms.append(seconds * 1e3)

    def stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies_ms)
            # nearest-rank percentile: index ceil(p*n) - 1
            pct = (lambda p: round(lat[max(0, math.ceil(p * len(lat) - 1e-9) - 1)], 2)) \
                if lat else (lambda p: None)
            return {
                "requests": self._requests,
                "samples": self._samples,
                "dispatches": self.dispatch_count,
                "serving_batch": self.batch,
                "latency_ms_p50": pct(0.50),
                "latency_ms_p95": pct(0.95),
            }


class BatchingSRModel(SRModel):
    """SRModel with cross-request batching (production serving path).

    :class:`SRModel` serializes concurrent requests on a lock, so N
    clients sending small requests pay N device dispatches. This variant
    coalesces: requests enqueue their samples and a worker thread drains
    the queue — waiting up to ``max_wait_ms`` for stragglers once the
    first request arrives — then runs ONE padded forward over the union
    and scatters the slices back. Per-sample results are identical to
    :meth:`SRModel.generate` (same compiled program, same padding).

    No reference equivalent (the reference's only inference surface is a
    batch CLI, ``helpers/gen_fake_ds.py``).
    """

    def __init__(self, config: Config, g_params, batch_size: int = 0,
                 max_request_samples: int = 8192, max_wait_ms: float = 5.0,
                 max_domain_output_bytes: int = 1 << 30, mesh=None):
        super().__init__(config, g_params, batch_size=batch_size,
                         max_request_samples=max_request_samples,
                         max_domain_output_bytes=max_domain_output_bytes,
                         mesh=mesh)
        self.max_wait_ms = max_wait_ms
        self.dispatch_count = 0  # device dispatches (observability/tests)
        self._queue: "list[tuple[np.ndarray, list, threading.Event]]" = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._drain_loop, daemon=True)
        self._worker.start()

    def close(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)

    def generate(self, coarse: np.ndarray) -> np.ndarray:
        self._validate_patches(coarse)
        # Latents are drawn HERE, per request, before coalescing: the
        # union batch then carries them as input channels, so a sample's
        # fields never depend on what traffic it coalesced with.
        t0 = time.perf_counter()  # latency includes latent injection
        coarse = self._augment(np.asarray(coarse, np.float32))
        slot: list = [None]
        done = threading.Event()
        with self._cv:
            if self._stop:
                raise RuntimeError("BatchingSRModel is closed")
            self._queue.append((coarse, slot, done))
            self._cv.notify()
        done.wait()
        if isinstance(slot[0], BaseException):
            raise slot[0]
        self._record(coarse.shape[0], time.perf_counter() - t0)
        return slot[0]

    # -- worker ------------------------------------------------------------
    def _drain_loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop and not self._queue:
                    return
                # First request in hand: linger briefly so concurrent
                # clients coalesce into the same device batch.
                deadline = time.monotonic() + self.max_wait_ms / 1e3
                while (sum(a.shape[0] for a, _, _ in self._queue) < self.batch
                       and not self._stop):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                work, self._queue = self._queue, []
            # Two-phase delivery: assign EVERY slot first, signal events
            # only after — no event fires until all slots are final, so a
            # mid-scatter failure can never swap a result a client already
            # woke up to read for the exception (they race otherwise).
            try:
                union = np.concatenate([a for a, _, _ in work], axis=0)
                outs = []
                # _lock actually serializes device access against
                # generate_domain (and any direct SRModel.generate use);
                # dispatch_count is only ever touched under it.
                with self._lock:
                    for block, pad in self._pad_blocks(union):
                        fake = np.asarray(
                            self._fwd(self._params, jnp.asarray(block, jnp.float32))
                        )
                        self.dispatch_count += 1
                        outs.append(fake[: self.batch - pad] if pad else fake)
                fields = np.concatenate(outs, axis=0)
                offset = 0
                for arr, slot, _ in work:
                    slot[0] = fields[offset : offset + arr.shape[0]]
                    offset += arr.shape[0]
            except BaseException as exc:  # deliver the failure to every waiter
                for _, slot, _ in work:
                    slot[0] = exc
            finally:
                for _, _, done in work:
                    done.set()


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _load_npy_checked(body: bytes) -> np.ndarray:
    """Decode a .npy body, verifying the HEADER's declared payload first:
    np.load allocates from the declared shape before reading any data, so
    a few-hundred-byte body declaring a (1e12, ...) array would attempt a
    multi-TB allocation despite the Content-Length cap."""
    buf = io.BytesIO(body)
    version = np.lib.format.read_magic(buf)
    if version == (1, 0):
        shape, _, dtype = np.lib.format.read_array_header_1_0(buf)
    elif version == (2, 0):
        shape, _, dtype = np.lib.format.read_array_header_2_0(buf)
    else:
        raise ValueError(f"unsupported .npy format version {version}")
    declared = math.prod(shape) * dtype.itemsize  # Python ints: no overflow
    remaining = len(body) - buf.tell()
    if declared != remaining:
        raise ValueError(
            f".npy header declares {declared} payload bytes but the body "
            f"carries {remaining}")
    buf.seek(0)
    return np.load(buf, allow_pickle=False)


class _Handler(BaseHTTPRequestHandler):
    model: SRModel = None  # injected

    def log_message(self, *args) -> None:
        pass

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802
        if self.path == "/healthz":
            cfg = self.model.config
            body = json.dumps({
                "status": "ok",
                "coarse_shape": [cfg.coarse_size, cfg.coarse_size, cfg.n_covariates],
                "fine_shape": [cfg.fine_size, cfg.fine_size, cfg.n_predictands],
                "serving_batch": self.model.batch,
                "generator_arch": cfg.generator_arch,
            }).encode()
            self._send(200, body, "application/json")
        elif self.path == "/metrics":
            self._send(200, json.dumps(self.model.stats()).encode(),
                       "application/json")
        else:
            self._send(404, b"{}", "application/json")

    def do_POST(self) -> None:  # noqa: N802
        from urllib.parse import parse_qs, urlparse

        parsed = urlparse(self.path)
        if parsed.path not in ("/v1/generate", "/v1/generate-domain"):
            self._send(404, b"{}", "application/json")
            return
        domain_mode = parsed.path == "/v1/generate-domain"
        q = parse_qs(parsed.query)
        cap = (self.model.max_domain_request_bytes if domain_mode
               else self.model.max_request_bytes)
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length > cap:
                self._send(413, json.dumps({
                    "error": f"request body {length} bytes exceeds cap {cap}"
                }).encode(), "application/json")
                return
            coarse = _load_npy_checked(self.rfile.read(length))
        except (ValueError, OSError, EOFError) as exc:  # bad .npy body
            self._send(400, json.dumps({"error": str(exc)}).encode(), "application/json")
            return
        try:
            if domain_mode:
                fields = self.model.generate_domain(
                    np.asarray(coarse, np.float32),
                    tile_rows=int(q.get("tile_rows", ["16"])[0]),
                    overlap=int(q.get("overlap", ["8"])[0]),
                    tile_cols=int(q.get("tile_cols", ["0"])[0]),
                    tiles_per_dispatch=int(q.get("tiles_per_dispatch", ["8"])[0]),
                )
            else:
                fields = self.model.generate(np.asarray(coarse, np.float32))
        except RequestTooLarge as exc:  # output-allocation cap
            self._send(413, json.dumps({"error": str(exc)}).encode(), "application/json")
            return
        except ValueError as exc:  # shape rejection
            self._send(400, json.dumps({"error": str(exc)}).encode(), "application/json")
            return
        except Exception as exc:  # device/worker failure: answer, don't reset
            self._send(503, json.dumps({"error": str(exc)}).encode(), "application/json")
            return
        self._send(200, _npy_bytes(fields), "application/octet-stream")


def serve_model(model: SRModel, host: str = "0.0.0.0", port: int = 8080) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,), {"model": model})
    return ThreadingHTTPServer((host, port), handler)


def _post_npy(endpoint: str, arr: np.ndarray) -> np.ndarray:
    """POST a float32 array as .npy, return the decoded .npy response."""
    import urllib.request

    req = urllib.request.Request(
        endpoint,
        data=_npy_bytes(np.asarray(arr, np.float32)),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as resp:
        return np.load(io.BytesIO(resp.read()), allow_pickle=False)


def generate_remote(url: str, coarse: np.ndarray) -> np.ndarray:
    """Client helper: POST covariates, return generated fields."""
    return _post_npy(f"{url.rstrip('/')}/v1/generate", coarse)


def generate_domain_remote(url: str, coarse: np.ndarray, tile_rows: int = 16,
                           overlap: int = 8, tile_cols: int = 0,
                           tiles_per_dispatch: int = 8) -> np.ndarray:
    """Client helper for arbitrary-size fields: POST (B, H, W, C), get
    (B, H*r, W*r, P) via the server's overlap-tiled inference."""
    return _post_npy(
        f"{url.rstrip('/')}/v1/generate-domain"
        f"?tile_rows={tile_rows}&overlap={overlap}&tile_cols={tile_cols}"
        f"&tiles_per_dispatch={tiles_per_dispatch}",
        coarse,
    )
