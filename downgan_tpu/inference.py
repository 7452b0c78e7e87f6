"""Super-resolution field generation from a trained checkpoint.

Capability parity with the reference inference CLI
(``DoWnGAN/helpers/gen_fake_ds.py:35-186``): restore a trained generator,
run the coarse covariate stack through it in chunks, and write the
generated fine fields to a NetCDF file. TPU-native re-design: one jitted
generator forward reused across fixed-size chunks (static shapes — the
last partial chunk is padded and trimmed instead of recompiling), device
transfers batched per chunk, fp32 output.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from downgan_tpu.config.config import Config
from downgan_tpu.data.netcdf import write_netcdf
from downgan_tpu.training.state import make_models
from downgan_tpu.utils.checkpoint import CheckpointManager, load_params


class RestoreUsageError(ValueError):
    """A restore refusal caused by contradictory user flags (e.g. --epoch
    or --ema against a weights-only bundle) — the CLI surfaces these as
    usage errors; any other exception keeps its traceback."""


def resolve_run_checkpoint(
    tracking_root: str, run_id: str
) -> Tuple[object, str, Optional[Config]]:
    """Run-hash-driven restore (parity with ``gen_fake_ds.py:51,152-154``,
    which loads the generator out of the MLflow run's artifact dir by
    run-hash + epoch): resolve a tracked run id to ``(run, checkpoint_dir,
    logged_config)``.

    The checkpoint dir is the Trainer's artifact layout
    (``<run>/artifacts/checkpoints``); the config is the one the run logged
    at start (``<run>/artifacts/config.json``), so inference reconstructs
    the exact trained model without the caller re-specifying shapes.
    """
    from downgan_tpu.tracking.store import TrackingStore

    store = TrackingStore(tracking_root)
    run = store.get_run(run_id)
    ckpt_dir = os.path.join(run.artifact_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        raise FileNotFoundError(
            f"run {run_id} has no checkpoints under {ckpt_dir}; "
            "was it trained with a checkpoint manager?"
        )
    config = None
    cfg_path = os.path.join(run.artifact_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = Config.from_json(f.read())
    return run, ckpt_dir, config


def rebuild_coarse_covariates(
    config: Config, subset: str = "test"
) -> Tuple[np.ndarray, np.ndarray]:
    """Rebuild the standardized coarse covariate stack from RAW NetCDFs
    inside the inference flow (parity with the reference's
    ``mask_and_standardize_coarse``, ``gen_fake_ds.py:92-144``): select the
    subset's times (test = the complement of the train year-mask, exactly
    the reference's ``~filter_times``), drop the bad first WRF field
    (``time_mask[0] = False``, ``gen_fake_ds.py:101``), standardize each
    covariate over the SELECTED subset itself (the reference calls
    ``xr_standardize_field`` on the masked fields), pass the land-sea mask
    through unstandardized, and stack in registry order.

    Returns ``(coarse, times)``: NHWC float32 stack + the selected times.
    """
    from downgan_tpu.config.config import COVARIATE_NAMES_ORDERED
    from downgan_tpu.data.pipeline import standardize_all, to_nhwc
    from downgan_tpu.data.staging import (_check_same_grid, load_covariates,
                                          load_fine)
    from downgan_tpu.data.times import filter_times

    if subset not in ("train", "test"):
        raise ValueError(f"subset must be 'train' or 'test', got {subset!r}")
    times = None
    if config.fine_paths:
        _, times = load_fine(config)
    if times is None:
        times = np.asarray(config.range_datetimes)
    cov = load_covariates(config, len(times))
    n_times = min(len(times), next(iter(cov.values())).shape[0])
    times = times[:n_times]

    train_mask = filter_times(times, mask_years=config.mask_years)
    sel = train_mask.copy() if subset == "train" else ~train_mask
    sel[0] = False
    selected = {k: v[:n_times][sel] for k, v in cov.items()}
    standardized, _ = standardize_all(selected)
    _check_same_grid(standardized, "covariate")
    coarse = np.stack(
        [standardized[k] for k in COVARIATE_NAMES_ORDERED], axis=1
    )
    return to_nhwc(coarse).astype(np.float32), times[sel]


def restore_generator_params(
    config: Config,
    checkpoint_dir: str,
    step: Optional[int] = None,
    weights_only: bool = False,
    use_ema: bool = False,
):
    """Load generator params from an Orbax checkpoint.

    ``weights_only=True`` reads a bare params checkpoint (the analogue of
    the reference's per-epoch ``log_state_dict`` artifact,
    ``mlflow_tools/mlflow_epoch.py:65-69``); otherwise the full-train-state
    layout written by the Trainer is used (``gen_fake_ds.py:152-154``
    equivalent, but with optimizer state available too).
    """
    gen, _ = make_models(config)
    # Abstract template (same pattern as load_bundle): orbax only needs
    # tree structure + shapes/dtypes, and the explicit LOCAL sharding makes
    # the restore topology-independent — a concrete gen.init here would
    # pay a real trace/compile/execute per restore for nothing.
    dev = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    template = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=dev),
        jax.eval_shape(
            gen.init, jax.random.PRNGKey(0),
            jnp.zeros((1, config.coarse_size, config.coarse_size,
                       config.generator_in_channels))),
    )
    if weights_only:
        if step is not None:
            raise RestoreUsageError(
                "weights-only checkpoints (and exported bundles) hold a "
                "single set of params — an epoch/step cannot be selected. "
                "Use the full Trainer checkpoint directory to restore a "
                "specific epoch.")
        if use_ema:
            raise RestoreUsageError(
                "weights-only checkpoints (and exported bundles) hold one "
                "set of params — if the bundle was exported with --ema "
                "those already ARE the EMA weights; drop --ema (restore "
                "EMA from the full Trainer checkpoint directory instead)")
        return load_params(checkpoint_dir, template)
    from downgan_tpu.training.state import create_state

    # Same abstract-template pattern as above: a concrete create_state
    # would trace/compile/execute generator AND critic init plus optimizer
    # construction per restore — pure waste when orbax only needs the tree
    # structure, shapes and dtypes.
    state_template = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=dev),
        jax.eval_shape(lambda k: create_state(config, k),
                       jax.random.PRNGKey(0)),
    )
    mngr = CheckpointManager(checkpoint_dir)
    state = mngr.restore(state_template, step=step)
    mngr.close()
    if use_ema:
        if state.g_ema is None:
            raise RestoreUsageError("checkpoint has no EMA weights (hp.ema_decay was 0)")
        return state.g_ema
    return state.g_params


def write_generator_bundle(out_dir: str, config: Config, g_params,
                           c_params=None) -> str:
    """Write a self-contained servable generator bundle: weights-only
    ``<out>/params`` (Orbax) + ``<out>/config.json``.

    The layout ``serve``/``generate``/``evaluate`` auto-detect from
    ``--checkpoint`` alone (the TPU-native analogue of the reference's
    weights-only per-epoch artifacts, ``mlflow_tools/mlflow_epoch.py:65-69``).
    Used by the ``export`` CLI and the Trainer's best-checkpoint tracking.
    Idempotent: re-saving over an existing bundle replaces it.

    ``c_params`` additionally writes ``<out>/critic_params`` — serving
    ignores it, but ``train --warm-start`` picks it up so an imported
    reference run (``downgan import-torch --critic-weights``) continues
    training with its trained critic instead of a fresh one.
    """
    from downgan_tpu.utils.checkpoint import save_params

    out = os.path.abspath(out_dir)
    os.makedirs(out, exist_ok=True)
    # Save as host arrays: a bundle is a PORTABLE artifact, and orbax
    # records device-array shardings in the checkpoint, which would pin
    # the restore to the saving machine's topology.
    g_params = jax.tree.map(np.asarray, g_params)
    save_params(os.path.join(out, "params"), g_params)
    c_path = os.path.join(out, "critic_params")
    if c_params is not None:
        save_params(c_path, jax.tree.map(np.asarray, c_params))
    elif os.path.isdir(c_path):
        # Idempotent replace means FULLY replace: a generator-only re-save
        # over an imported bundle must not leave a stale critic behind for
        # --warm-start to silently pick up.
        import shutil

        shutil.rmtree(c_path)
    with open(os.path.join(out, "config.json"), "w") as f:
        f.write(config.to_json())
    return out


def load_bundle(bundle_dir: str):
    """Load an exported/imported bundle directory: returns
    ``(config, g_params, c_params_or_None)``. Params restore against
    templates built from the bundle's own config, so a corrupted or
    mismatched bundle fails loudly instead of mis-shaping the model."""
    bundle = os.path.abspath(bundle_dir)
    cfg_path = os.path.join(bundle, "config.json")
    params_path = os.path.join(bundle, "params")
    if not (os.path.exists(cfg_path) and os.path.isdir(params_path)):
        raise FileNotFoundError(
            f"{bundle_dir} is not a bundle directory (expected params/ + "
            "config.json, the `downgan export` / `import-torch` layout)")
    with open(cfg_path) as f:
        config = Config.from_json(f.read())
    gen, critic = make_models(config)

    # Abstract templates (eval_shape) — orbax only needs the tree
    # structure and shapes/dtypes; no concrete init compute. The explicit
    # LOCAL sharding makes restore topology-independent: without it orbax
    # falls back to the sharding recorded at save time, which breaks for
    # bundles written from device arrays on a different machine/mesh.
    # jax.local_devices(), not jax.devices(): under multihost
    # (train --multihost --warm-start) the global list's [0] is a
    # non-addressable remote device on every process but 0, and the
    # restore would fail there.
    dev = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    def abstract(tree):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=dev),
            tree)

    g_tmpl = abstract(jax.eval_shape(
        gen.init, jax.random.PRNGKey(0),
        jnp.zeros((1, config.coarse_size, config.coarse_size,
                   config.generator_in_channels))))
    g_params = load_params(params_path, g_tmpl)
    c_params = None
    c_path = os.path.join(bundle, "critic_params")
    if os.path.isdir(c_path):
        c_tmpl = abstract(jax.eval_shape(
            critic.init, jax.random.PRNGKey(0),
            jnp.zeros((1, config.fine_size, config.fine_size,
                       config.critic_in_channels))))
        c_params = load_params(c_path, c_tmpl)
    return config, g_params, c_params


def generate_fields(
    config: Config,
    g_params,
    coarse: np.ndarray,
    chunk_size: int = 0,
    member: int = 0,
) -> np.ndarray:
    """Run (N, h, w, C) coarse covariates -> (N, H, W, P) generated fields.

    Chunked like the reference (100 chunks, ``gen_fake_ds.py:156-159``) but
    with a fixed chunk size so one compiled program serves every chunk;
    the ragged tail is padded to the chunk size and trimmed after.
    ``chunk_size=0`` uses ``config.chunk_size``.

    Stochastic generators (``config.noise_channels > 0``) draw one latent
    per sample, deterministically from ``(config.seed, member, chunk)`` —
    the same call reproduces bit-identically, and distinct ``member``
    values give independent ensemble members (see
    :func:`generate_ensemble`). Deterministic configs ignore ``member``.
    """
    return np.concatenate(
        [blk for _, blk in
         generate_fields_iter(config, g_params, coarse,
                              chunk_size=chunk_size, member=member)],
        axis=0)


def generate_fields_iter(
    config: Config,
    g_params,
    coarse: np.ndarray,
    chunk_size: int = 0,
    member: int = 0,
):
    """Chunked generation as an iterator of ``(start, (k, H, W, P))``
    blocks — the streaming core of :func:`generate_fields` (identical
    semantics: same compiled forward, same per-chunk latent stream, the
    ragged tail padded and trimmed). Lets callers consume arbitrarily
    long series at one output block of host memory
    (:func:`generate_to_netcdf`)."""
    from downgan_tpu.training.wgan import eval_noise_rng, make_noise_injector

    gen, _ = make_models(config)
    inject = make_noise_injector(config)
    member_rng = jax.random.fold_in(eval_noise_rng(config), member)
    fwd = jax.jit(
        lambda params, x, rng: gen.apply(params, inject(rng, x)))
    chunk = chunk_size or config.chunk_size
    n = coarse.shape[0]
    for i, start in enumerate(range(0, n, chunk)):
        block = coarse[start : start + chunk]
        pad = chunk - block.shape[0]
        if pad:
            block = np.concatenate([block, np.zeros((pad, *block.shape[1:]), block.dtype)])
        fake = np.asarray(fwd(g_params, jnp.asarray(block, jnp.float32),
                              jax.random.fold_in(member_rng, i)))
        yield start, (fake[: chunk - pad] if pad else fake)


def generate_ensemble(
    config: Config,
    g_params,
    coarse: np.ndarray,
    n_members: int,
    chunk_size: int = 0,
) -> np.ndarray:
    """Probabilistic downscaling: (M, N, H, W, P) stack of ``n_members``
    independent ensemble members from one stochastic generator
    (``config.noise_channels > 0``) — each member is
    :func:`generate_fields` with its own latent stream. No reference
    equivalent (the reference generator is deterministic,
    ``networks/generator.py:83-90``)."""
    if config.noise_channels <= 0:
        raise ValueError(
            "ensemble generation needs a stochastic generator: train with "
            "Config.noise_channels > 0 (a deterministic generator returns "
            "identical members)")
    return np.stack(
        [generate_fields(config, g_params, coarse, chunk_size=chunk_size,
                         member=m)
         for m in range(n_members)],
        axis=0,
    )


def ensemble_metrics(
    config: Config,
    g_params,
    coarse: np.ndarray,
    fine: np.ndarray,
    n_members: int,
    chunk_size: int = 0,
) -> Dict[str, float]:
    """Probabilistic verification of a stochastic generator on a split:
    fair CRPS (ops.ensemble), mean ensemble spread, and the ensemble-mean
    MAE next to the single-member MAE (member 0 — the fixed realization a
    deterministic evaluation would score). CRPS < single-member MAE means
    the latent spread carries information."""
    from downgan_tpu.ops.ensemble import crps_ensemble, ensemble_spread

    members = generate_ensemble(config, g_params, coarse, n_members,
                                chunk_size=chunk_size)
    fine = np.asarray(fine, np.float32)
    return {
        "CRPS": float(crps_ensemble(members, fine)),
        "spread": float(ensemble_spread(members)),
        "ens_mean_MAE": float(np.mean(np.abs(members.mean(axis=0) - fine))),
        "member_MAE": float(np.mean(np.abs(members[0] - fine))),
        "n_members": n_members,
    }


def _generated_layout(
    n: int,
    fine_h: int,
    fine_w: int,
    p: int,
    var_names: Sequence[str],
    times: Optional[np.ndarray],
    lats: Optional[np.ndarray],
    lons: Optional[np.ndarray],
    time_chunk: int,
    n_members: int = 0,
):
    """Shared NetCDF layout (names/coords/dims/chunks/shapes) for generated
    fields — the single source both :func:`write_generated_netcdf` and the
    streamed :func:`generate_to_netcdf` build from, so their file contents
    cannot drift apart (the streamed-equals-in-memory contract is tested
    bit-for-bit)."""
    if len(var_names) < p:
        raise ValueError(
            f"{p} predictand channels but only {len(var_names)} variable "
            f"names {tuple(var_names)} — every generated channel must be "
            "named (silently truncating would drop data from the file)")
    names = list(var_names[:p])
    coords: Dict[str, np.ndarray] = {
        "time": np.arange(n) if times is None else np.asarray(times).astype("float64"),
        "lat": np.arange(fine_h, dtype=np.float64) if lats is None else np.asarray(lats),
        "lon": np.arange(fine_w, dtype=np.float64) if lons is None else np.asarray(lons),
    }
    shape = (n, fine_h, fine_w)
    base_dims = ("time", "lat", "lon")
    chunk = (min(time_chunk, n), fine_h, fine_w)
    if n_members:
        coords["member"] = np.arange(n_members, dtype=np.float64)
        shape = (n_members, *shape)
        base_dims = ("member", *base_dims)
        chunk = (1, *chunk)
    dims = {name: base_dims for name in names}
    chunks = {name: chunk for name in names}
    shapes = {name: shape for name in names}
    return names, coords, dims, chunks, shapes


def write_generated_netcdf(
    path: str,
    fields: np.ndarray,
    var_names: Sequence[str] = ("u10", "v10"),
    times: Optional[np.ndarray] = None,
    lats: Optional[np.ndarray] = None,
    lons: Optional[np.ndarray] = None,
    time_chunk: int = 5,
) -> None:
    """Write generated (N, H, W, P) fields as a NetCDF of per-variable
    (time, lat, lon) arrays (parity with ``gen_fake_ds.py:162``'s chunked
    ``to_netcdf``). An ensemble stack (M, N, H, W, P) from
    :func:`generate_ensemble` gains a leading ``member`` dimension."""
    if fields.ndim == 5:
        m, n, h, w, p = fields.shape
    else:
        m = 0
        n, h, w, p = fields.shape
    names, coords, dims, chunks, _ = _generated_layout(
        n, h, w, p, var_names, times, lats, lons, time_chunk, n_members=m)
    variables = {name: fields[..., i] for i, name in enumerate(names)}
    write_netcdf(path, variables, dims, coords=coords, chunks=chunks)


def generate_to_netcdf(
    path: str,
    config: Config,
    g_params,
    coarse: np.ndarray,
    var_names: Sequence[str] = ("u10", "v10"),
    times: Optional[np.ndarray] = None,
    lats: Optional[np.ndarray] = None,
    lons: Optional[np.ndarray] = None,
    chunk_size: int = 0,
    n_members: int = 0,
    time_chunk: int = 5,
    tile_rows: int = 0,
    overlap: int = 8,
    tile_cols: int = 0,
    tiles_per_dispatch: int = 8,
    mesh=None,
) -> None:
    """Generate straight INTO a NetCDF, one time-slab of output in host
    memory at a time — for series whose full (N, H*sf, W*sf, P) output
    would not fit host RAM (at sf=8 the output is ~64x(P/C) the input;
    the in-memory path and the reference, ``gen_fake_ds.py:156-162``,
    both materialize everything before writing).

    Identical file contents to ``generate_fields`` +
    :func:`write_generated_netcdf` (tested bit-for-bit), including
    stochastic members (the per-chunk latent stream depends only on the
    chunk index, not on what is done with the blocks). ``tile_rows > 0``
    runs the 2-D overlap tiler per time block (constant memory in domain
    size too); for a STOCHASTIC generator the tiled streaming path draws
    each sample's whole-domain latent from its absolute time index, so
    realizations are deterministic and block-size-independent (but differ
    from a single whole-series ``tiled_sr_inference`` call, whose latent
    batch is drawn in one draw). ``n_members > 0`` streams an ensemble
    (member dimension; mutually exclusive with tiling, like the CLI).
    """
    from downgan_tpu.data.netcdf import NetCDFStreamWriter

    if n_members and tile_rows:
        raise ValueError("ensemble streaming and tiled streaming are "
                         "mutually exclusive (tiled inference draws one "
                         "whole-domain latent per sample)")
    if n_members and config.noise_channels <= 0:
        # Validate BEFORE the writer opens (h5py "w" truncates an existing
        # file at `path`) — same contract as generate_ensemble.
        raise ValueError(
            "ensemble generation needs a stochastic generator: "
            "train with Config.noise_channels > 0")
    n, h, w, _ = coarse.shape
    sf = 2 ** config.num_upsample
    fine_h, fine_w = h * sf, w * sf
    p = config.n_predictands
    ensemble = n_members > 0
    names, coords, dims, chunks, shapes = _generated_layout(
        n, fine_h, fine_w, p, var_names, times, lats, lons, time_chunk,
        n_members=n_members)

    def write_block(wtr, start, block, member=None):
        sel = slice(start, start + block.shape[0])
        for i, name in enumerate(names):
            wtr.write(name, sel if member is None else (member, sel),
                      block[..., i])

    with NetCDFStreamWriter(path, shapes, dims, coords=coords,
                            chunks=chunks) as wtr:
        if ensemble:
            for m in range(n_members):
                for start, block in generate_fields_iter(
                        config, g_params, coarse, chunk_size=chunk_size,
                        member=m):
                    write_block(wtr, start, block, member=m)
        elif tile_rows:
            from downgan_tpu.parallel.spatial import tiled_sr_inference

            chunk = chunk_size or config.chunk_size
            # Same guard as tiled_sr_inference: append a latent only when
            # the caller has not pre-appended one (extra channels beyond
            # n_covariates mean a caller-supplied latent is already there).
            append_z = (config.noise_channels
                        and coarse.shape[-1] == config.n_covariates)
            for start in range(0, n, chunk):
                block_in = coarse[start : start + chunk]
                if append_z:
                    # Whole-domain latent per sample from its ABSOLUTE
                    # index: deterministic and independent of chunking.
                    z = np.stack([
                        np.random.default_rng(
                            (config.seed, 0x5E11, start + j)).standard_normal(
                            (h, w, config.noise_channels))
                        for j in range(block_in.shape[0])
                    ]).astype(block_in.dtype)
                    block_in = np.concatenate([block_in, z], axis=-1)
                block = tiled_sr_inference(
                    config, g_params, block_in, tile_rows=tile_rows,
                    overlap=overlap, tile_cols=tile_cols,
                    tiles_per_dispatch=tiles_per_dispatch, mesh=mesh)
                write_block(wtr, start, block)
        else:
            for start, block in generate_fields_iter(
                    config, g_params, coarse, chunk_size=chunk_size):
                write_block(wtr, start, block)
