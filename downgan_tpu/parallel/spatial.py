"""Spatial parallelism: halo-exchange convs + tiled full-domain inference.

SURVEY §2/§5: the reference's answer to large spatial extent is fixed
regional crops — it can never process a field bigger than one patch. The
TPU-native answer ("long-context analogue") has two parts:

* **Halo-exchange sharded convolution** — fields sharded along the lat
  (H) axis of a mesh axis; each 3x3 conv exchanges one-row halos with its
  mesh neighbours over ICI (``lax.ppermute``) and computes VALID locally.
  Exact: matches the unsharded conv bit-for-bit on the CPU test mesh.
  Building block for spatially-sharded model evaluation.

* **Overlap-tile inference** — run the full generator over row bands with
  an overlap margin and keep interior rows. Works on any domain size with
  any batch of weights, at the cost of approximation near band seams
  (the RRDB receptive field is unbounded in theory; in practice a
  16-coarse-row overlap makes seams numerically invisible — tested).
"""
from __future__ import annotations

import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from downgan_tpu.config.config import Config


def halo_exchange(x: jax.Array, axis_name: str, halo: int = 1) -> jax.Array:
    """Append ``halo`` rows from the up/down mesh neighbours along axis 1.

    x: local block (B, H_loc, W, C) inside a ``shard_map`` over
    ``axis_name``. Edge devices get zero rows (SAME-conv zero padding).
    Returns (B, H_loc + 2*halo, W, C).
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    top_rows = x[:, :halo]  # my top rows -> neighbour above wants them
    bot_rows = x[:, -halo:]

    # receive the block above's bottom rows / the block below's top rows
    from_above = lax.ppermute(bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = lax.ppermute(top_rows, axis_name, [(i + 1, i) for i in range(n - 1)])

    zeros = jnp.zeros_like(top_rows)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def sharded_conv3x3(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array], axis_name: str
) -> jax.Array:
    """3x3 SAME conv on an H-sharded NHWC block: one-row halo exchange over
    ICI, then VALID conv locally (W padded locally). Shape-preserving."""
    xh = halo_exchange(x, axis_name, halo=1)
    xh = jnp.pad(xh, ((0, 0), (0, 0), (1, 1), (0, 0)))
    dn = lax.conv_dimension_numbers(xh.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xh, kernel, window_strides=(1, 1), padding="VALID", dimension_numbers=dn
    )
    if bias is not None:
        out = out + bias
    return out


def make_sharded_conv(mesh: Mesh, axis_name: str = "spatial"):
    """shard_map-wrapped conv: (B, H, W, C) H-sharded over ``axis_name``."""
    spec = P(None, axis_name, None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=spec,
    )
    def conv(x, kernel, bias):
        return sharded_conv3x3(x, kernel, bias, axis_name)

    return conv


_TILED_FWD_CACHE: "collections.OrderedDict" = None  # lazy-initialized below
_TILED_FWD_CACHE_MAX = 8
_TILED_FWD_CACHE_LOCK = threading.Lock()


def _tiled_fwd_crop(config: Config, keep_h: int, keep_w: int,
                    mesh: Optional[Mesh] = None):
    """Jitted generator-forward + per-tile on-device crop, cached per
    (model config, crop size, mesh) so repeated :func:`tiled_sr_inference`
    calls (a server evaluating many domains) reuse one traced program
    instead of paying ~1 s of retracing per call. LRU-bounded: the crop
    size is client-controlled on the serving surface, so the cache must
    not grow without limit. The module lock makes lookup/insert/evict safe
    for direct library callers on multiple threads (SRModel._lock only
    accidentally serialized single-model use).

    With ``mesh`` the tile batch is sharded over the mesh's FIRST axis
    (params replicated, per-tile crop offsets sharded with their tiles) —
    data-parallel inference: every chip evaluates its share of the tiles
    of one domain.
    """
    import collections

    global _TILED_FWD_CACHE
    mesh_key = (None if mesh is None else
                (tuple(mesh.axis_names),
                 tuple(d.id for d in mesh.devices.flat)))
    key = (config.to_json(), keep_h, keep_w, mesh_key)
    with _TILED_FWD_CACHE_LOCK:
        if _TILED_FWD_CACHE is None:
            _TILED_FWD_CACHE = collections.OrderedDict()
        fn = _TILED_FWD_CACHE.get(key)
        if fn is not None:
            _TILED_FWD_CACHE.move_to_end(key)
            return fn

    # Build outside the lock (tracing-model construction is pure and cheap;
    # two racing threads at worst build the same jitted fn twice).
    from downgan_tpu.training.state import make_models

    gen, _ = make_models(config)

    def fwd_crop_fn(params, chunk, kr, kc):
        fine = gen.apply(params, chunk)  # (K, band_h*sf, band_w*sf, P)

        def crop(f, r, c):
            return lax.dynamic_slice(
                f, (r, c, 0), (keep_h, keep_w, f.shape[-1]))

        return jax.vmap(crop)(fine, kr, kc)

    if mesh is None:
        fwd_crop = jax.jit(fwd_crop_fn)
    else:
        from jax.sharding import NamedSharding

        ax = mesh.axis_names[0]
        rep = NamedSharding(mesh, P())
        tiles = NamedSharding(mesh, P(ax, None, None, None))
        offs = NamedSharding(mesh, P(ax))
        fwd_crop = jax.jit(
            fwd_crop_fn,
            in_shardings=(rep, tiles, offs, offs),
            out_shardings=tiles,
        )

    with _TILED_FWD_CACHE_LOCK:
        fn = _TILED_FWD_CACHE.setdefault(key, fwd_crop)
        _TILED_FWD_CACHE.move_to_end(key)
        while len(_TILED_FWD_CACHE) > _TILED_FWD_CACHE_MAX:
            _TILED_FWD_CACHE.popitem(last=False)
    return fn


def effective_fold(tiles_per_dispatch: int, mesh_size: int = 1) -> int:
    """Tiles actually folded per dispatch: on a mesh, the tiler rounds the
    fold up to a multiple of the mesh size so one compiled sharded program
    (static shapes) serves every dispatch. Single source of truth for
    :func:`tiled_sr_inference` and :func:`count_tiled_dispatches`."""
    k = max(1, tiles_per_dispatch)
    if mesh_size > 1:
        k = -(-k // mesh_size) * mesh_size
    return k


def count_tiled_dispatches(
    b: int, h: int, w: int, tile_rows: int, tile_cols: int = 0,
    tiles_per_dispatch: int = 8, mesh_size: int = 1,
) -> int:
    """Device dispatches :func:`tiled_sr_inference` issues for a (b, h, w)
    domain: total tiles (including the ragged edge tiles) folded
    :func:`effective_fold` at a time. Used by the serving layer so
    ``/metrics`` reports real device dispatches for domain traffic."""
    n_rows = -(-h // tile_rows)
    n_cols = -(-w // tile_cols) if tile_cols else 1
    n_tiles = b * n_rows * n_cols
    return -(-n_tiles // effective_fold(tiles_per_dispatch, mesh_size))


def tiled_sr_inference(
    config: Config,
    g_params,
    coarse: np.ndarray,
    tile_rows: int = 16,
    overlap: int = 8,
    tile_cols: int = 0,
    tiles_per_dispatch: int = 8,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Full-domain super-resolution by 2-D overlap tiling.

    ``coarse``: (B, H, W, C) with H (and, with ``tile_cols``, W) arbitrary
    — e.g. a whole 432-row ERA grid, vs the model's 16-row training
    patches. Each tile of ``tile_rows`` x ``tile_cols`` coarse cells is
    evaluated with ``overlap`` extra cells of context per side; only the
    interior fine cells are kept. Tiles slide fully inside the domain (no
    synthetic padding): at the edges the overlap grows inward, so tile
    boundaries coincide with true domain boundaries and edge cells see
    exactly the context whole-field evaluation sees.

    ``tile_cols=0`` (default) tiles the lat axis only, with each band
    spanning the full lon extent. Set it for domains too wide for HBM.

    Host round-trips are amortized two ways: up to ``tiles_per_dispatch``
    tiles are folded into the generator's batch axis per device dispatch
    (tiles are independent samples to a conv net), and each tile's overlap
    margin is cropped ON DEVICE (``lax.dynamic_slice`` with per-tile
    offsets) before the fetch — the host receives exactly the kept
    interior, cutting device->host bytes 2x for row bands and 4x for 2-D
    tiles (PERF.md measures the tunnel D2H at ~27 MB/s, so fetched bytes,
    not dispatches, dominate full-domain latency here).

    ``mesh``: data-parallel multi-chip inference — each dispatch's tiles
    are sharded over the mesh's first axis (tiles are independent, so this
    is embarrassingly parallel; ``tiles_per_dispatch`` is rounded up to a
    multiple of the mesh size). Bit-identical to the unsharded path
    (tested); pre-place ``g_params`` replicated on the mesh to skip a
    transfer per dispatch.
    """
    if tile_rows < 1 or overlap < 0 or tile_cols < 0:
        raise ValueError(
            f"invalid tiling: tile_rows={tile_rows} (>=1), overlap={overlap} "
            f"(>=0), tile_cols={tile_cols} (>=0)"
        )
    # The generator's true output scaling (2**num_upsample) — NOT
    # config.scale_factor, which is the data-pipeline crop factor and can
    # differ from the model ratio on non-florida configs.
    sf = 2 ** config.num_upsample
    b, h, w, c = coarse.shape
    if config.noise_channels and c == config.n_covariates:
        # Stochastic generator: draw ONE whole-domain latent (the fixed
        # eval realization — deterministic per call) and append it BEFORE
        # tiling, so overlapping tiles see identical noise in their shared
        # cells and stitch seamlessly. Callers may also pre-append their
        # own (b, h, w, noise_channels) latent for ensemble members.
        z_rng = np.random.default_rng((config.seed, 0x5E11))
        z = z_rng.standard_normal(
            (b, h, w, config.noise_channels)).astype(coarse.dtype)
        coarse = np.concatenate([coarse, z], axis=-1)
    band_h = tile_rows + 2 * overlap
    band_w = tile_cols + 2 * overlap if tile_cols else w
    keep_h = min(tile_rows, h) * sf
    keep_w = (min(tile_cols, w) if tile_cols else w) * sf
    fwd_crop = _tiled_fwd_crop(config, keep_h, keep_w, mesh=mesh)

    if h < band_h:
        raise ValueError(f"domain height {h} smaller than band {band_h}; "
                         "reduce tile_rows/overlap or run the field whole")
    if tile_cols and w < band_w:
        raise ValueError(f"domain width {w} smaller than band {band_w}; "
                         "reduce tile_cols/overlap or leave tile_cols=0")

    row_starts = list(range(0, h, tile_rows))
    col_starts = list(range(0, w, tile_cols)) if tile_cols else [0]

    # Tile METADATA only — (sample, row start, row window lo, col start,
    # col window lo) per tile; blocks are sliced per dispatch chunk below
    # so host memory stays O(tiles_per_dispatch * band), not O(domain * 2-4x).
    places = []
    for bi in range(b):
        for rs in row_starts:
            r_lo = min(max(rs - overlap, 0), h - band_h)
            for cs in col_starts:
                c_lo = min(max(cs - overlap, 0), w - band_w) if tile_cols else 0
                places.append((bi, rs, r_lo, cs, c_lo))

    out = np.zeros((b, h * sf, w * sf, config.n_predictands), np.float32)
    k = effective_fold(tiles_per_dispatch,
                       mesh.devices.size if mesh is not None else 1)
    for start in range(0, len(places), k):
        sel = places[start : start + k]
        chunk = np.stack(
            [coarse[bi, r_lo : r_lo + band_h, c_lo : c_lo + band_w]
             for bi, _, r_lo, _, c_lo in sel]
        ).astype(np.float32, copy=False)
        pad = k - chunk.shape[0]
        if pad:  # keep one compiled program for the ragged tail
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)])
        # Clamp the fetch window so it stays inside the band (a ragged
        # last tile wants fewer than keep_h/keep_w cells; lax.dynamic_slice
        # would otherwise clamp the start silently and fetch wrong cells),
        # and remember each tile's offset inside the fetched window.
        kr = [min((rs - r_lo) * sf, band_h * sf - keep_h)
              for _, rs, r_lo, _, _ in sel]
        kc = [min((cs - c_lo) * sf, band_w * sf - keep_w)
              for _, _, _, cs, c_lo in sel]
        kr_j = jnp.asarray(np.array(kr + [0] * pad, np.int32))
        kc_j = jnp.asarray(np.array(kc + [0] * pad, np.int32))
        fine = np.asarray(fwd_crop(g_params, jnp.asarray(chunk), kr_j, kc_j))
        for j, (bi, rs, r_lo, cs, c_lo) in enumerate(sel):
            n_rows = min(tile_rows, h - rs) * sf
            n_cols = min(tile_cols, w - cs) * sf if tile_cols else w * sf
            off_r = (rs - r_lo) * sf - kr[j]
            off_c = (cs - c_lo) * sf - kc[j]
            out[bi, rs * sf : rs * sf + n_rows, cs * sf : cs * sf + n_cols] = (
                fine[j, off_r : off_r + n_rows, off_c : off_c + n_cols]
            )
    return out


def sharded_generator_apply(config: Config, mesh: Mesh, axis_name: str = "spatial",
                            jit: bool = True):
    """Exact spatially-sharded generator evaluation.

    Returns ``apply(params, coarse)`` where the coarse field's H axis is
    sharded over ``axis_name`` and every conv in the generator exchanges
    halos with its neighbours — bit-identical to the unsharded forward
    (unlike :func:`tiled_sr_inference`, which approximates at seams), with
    weights replicated and activations never gathered. This is the model-
    parallel path for fields too large for one chip's HBM.
    """
    from downgan_tpu.models.generator import Generator

    gen = Generator(
        filters=config.filters,
        n_predictands=config.n_predictands,
        num_res_blocks=config.num_res_blocks,
        num_upsample=config.num_upsample,
        spatial_axis=axis_name,
    )
    spec = P(None, axis_name, None, None)

    # Manual only over the spatial axis: on a multi-axis mesh the other
    # axes (e.g. a "data" batch axis) stay auto/GSPMD-managed, which is
    # what lets build_dp_spatial_train_step compose DP with this sharding.
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
        axis_names=frozenset({axis_name}),
    )
    def apply(params, coarse):
        return gen.apply(params, coarse)

    return jax.jit(apply) if jit else apply


def sharded_critic_apply(config: Config, mesh: Mesh, axis_name: str = "spatial",
                         jit: bool = True):
    """Exact spatially-sharded critic evaluation.

    Returns ``apply(params, fine)`` with the fine field's H axis sharded
    over ``axis_name``: the eight convs halo-exchange (strided stages need
    the local H even), and the classifier runs as a row-parallel matmul
    completed by a psum (``RowShardedDense``) — same params as the plain
    critic, scores replicated on every shard. Differentiable: GP/critic
    gradients flow through ppermute/psum. Requires fine_size/16 divisible
    by the axis size.
    """
    from downgan_tpu.models.critic import Critic

    n = int(mesh.shape[axis_name])
    critic = Critic(
        base=config.filters,
        fine_size=config.fine_size,
        spatial_axis=axis_name,
        n_spatial_shards=n,
    )
    spec = P(None, axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), spec), out_specs=P(),
        axis_names=frozenset({axis_name}),
    )
    def apply(params, fine):
        return critic.apply(params, fine)

    return jax.jit(apply) if jit else apply


def _spatially_sharded_step(config: Config, mesh: Mesh, axis_name: str,
                            with_metrics: bool):
    """Shared core of the SP and DPxSP step builders: guard the
    conditional-critic gap once, wrap the halo-exchange-sharded applies
    as model shims, and build the unjitted train step over them."""
    import types

    from downgan_tpu.training.wgan import build_train_step

    if config.critic_conditional:
        raise NotImplementedError(
            "the spatially-sharded train step supports the reference's "
            "unconditional critic only (the conditional critic's "
            "upsampled-covariate concat is not halo-decomposed); train "
            "critic_conditional models with the DP path")
    gen_apply = sharded_generator_apply(config, mesh, axis_name, jit=False)
    critic_apply = sharded_critic_apply(config, mesh, axis_name, jit=False)
    return build_train_step(
        config, types.SimpleNamespace(apply=gen_apply),
        types.SimpleNamespace(apply=critic_apply), with_metrics=with_metrics)


def build_spatial_train_step(config: Config, mesh: Mesh, axis_name: str = "spatial",
                             with_metrics: bool = False):
    """WGAN-GP train step with the FIELDS sharded spatially over the mesh
    (model parallelism) instead of the batch: both network applies run
    halo-exchanged/row-parallel under shard_map, gradients flow through
    the collectives, and parameters stay replicated. The complement of
    the DP step (``parallel/dp.py``) for batches of very large fields.
    """
    step = _spatially_sharded_step(config, mesh, axis_name, with_metrics)
    return jax.jit(step, donate_argnums=(0,))


def build_dp_spatial_train_step(
    config: Config,
    mesh: Mesh,
    data_axis: str = "data",
    axis_name: str = "spatial",
    with_metrics: bool = False,
    donate_state: bool = True,
):
    """2-D parallel WGAN-GP train step over a ``(data, spatial)`` mesh:
    the batch is data-parallel over ``data_axis`` while every field's H
    axis is halo-exchange-sharded over ``axis_name`` — DP x SP composed
    in ONE compiled program.

    The composition is clean because the two axes use the two JAX
    sharding modes for what each does best: the network applies are
    ``shard_map``-manual over the spatial axis only
    (``axis_names={axis_name}`` — explicit ppermute halos + the
    row-parallel critic psum), and the batch axis stays AUTO, so GSPMD
    inserts the gradient all-reduce over ``data_axis`` exactly as in the
    plain DP step (``parallel/dp.py``). For pods: batch across hosts x
    field rows across the chips of each host, so fields too large for
    one chip's HBM still train data-parallel. The reference is
    hard-wired to one GPU (``DoWnGAN/config/config.py:25``).
    """
    from jax.sharding import NamedSharding

    step = _spatially_sharded_step(config, mesh, axis_name, with_metrics)
    rep = NamedSharding(mesh, P())
    bat = NamedSharding(mesh, P(data_axis, axis_name, None, None))
    return jax.jit(
        step,
        in_shardings=(rep, bat, bat, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
