"""``python -m downgan_tpu.cli`` — the unified CLI.

The reference drives training by editing two config modules and running
``python DoWnGAN/GAN/train.py`` (``README.md``), with separate click CLIs
for prep (``helpers/covariates.py:31-41``) and inference
(``helpers/gen_fake_ds.py:24-35``). Here everything hangs off one group
with a config-file + flag-override model (configs are values, not
editable modules).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import click

from downgan_tpu.config.config import Config, REGIONS


def _load_config(config_path: Optional[str], region: Optional[str], **hp_overrides) -> Config:
    if config_path:
        with open(config_path) as f:
            config = Config.from_json(f.read())
    else:
        config = Config()
    if region:
        config = config.replace(region=region)
    hp_overrides = {k: v for k, v in hp_overrides.items() if v is not None}
    if hp_overrides:
        import dataclasses

        config = config.replace(hp=dataclasses.replace(config.hp, **hp_overrides))
    return config


def _bundle_parts(checkpoint):
    """Exported-bundle detection: ``downgan export`` writes
    ``<dir>/params`` (weights-only Orbax) + ``<dir>/config.json``. Returns
    ``(params_path, config)`` for such a directory, else ``None``."""
    if checkpoint is None:
        return None
    params = os.path.join(checkpoint, "params")
    cfg = os.path.join(checkpoint, "config.json")
    if not (os.path.isdir(params) and os.path.exists(cfg)):
        return None
    with open(cfg) as f:
        return params, Config.from_json(f.read())


def _resolve_source_config(config_path, region, checkpoint, run_id,
                           tracking_root):
    """Shared --checkpoint/--run resolution for generate/serve/evaluate:
    exactly one source; --run resolves checkpoints AND the logged config
    through the tracking store; an explicit --config wins. Returns
    ``(config, checkpoint, run, bundle)`` — ``bundle=True`` means
    ``checkpoint`` now points at a weights-only exported bundle's params
    (``downgan export``) and the caller must restore weights-only."""
    if (checkpoint is None) == (run_id is None):
        raise click.UsageError("pass exactly one of --checkpoint or --run")
    run = run_config = None
    bundle = _bundle_parts(checkpoint)
    if bundle is not None:
        checkpoint, run_config = bundle
    elif run_id is not None:
        from downgan_tpu.inference import resolve_run_checkpoint

        run, checkpoint, run_config = resolve_run_checkpoint(tracking_root, run_id)
    if config_path:
        config = _load_config(config_path, region)
    elif run_config is not None:
        config = run_config.replace(region=region) if region else run_config
    else:
        # A Trainer checkpoint dir lives inside the run's artifact layout
        # (<artifacts>/checkpoints next to the logged <artifacts>/config.json)
        # — pick the logged config up so --checkpoint alone reconstructs the
        # trained model, like --run does through the store.
        sibling = (os.path.join(os.path.dirname(os.path.abspath(checkpoint)),
                                "config.json") if checkpoint else None)
        if sibling and os.path.exists(sibling):
            with open(sibling) as f:
                config = Config.from_json(f.read())
            if region:
                config = config.replace(region=region)
        else:
            config = _load_config(None, region)
    return config, checkpoint, run, bundle is not None


def _restore_params_cli(config, checkpoint, **kw):
    """restore_generator_params with CLI-grade errors: flag-contradiction
    refusals (--epoch/--ema against a weights-only bundle) surface as
    usage errors; anything else (corrupt checkpoint, shape mismatch deep
    in orbax) keeps its traceback for diagnosis."""
    from downgan_tpu.inference import (
        RestoreUsageError,
        restore_generator_params,
    )

    try:
        return restore_generator_params(config, checkpoint, **kw)
    except RestoreUsageError as e:
        raise click.UsageError(str(e))


@click.group()
def cli() -> None:
    """downgan-tpu: TPU-native WGAN-GP super-resolution downscaling."""
    from downgan_tpu.runtime import setup_cache

    setup_cache()


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None,
              help="JSON config file (Config.to_json format).")
@click.option("--region", type=click.Choice(list(REGIONS)), default=None)
@click.option("--epochs", type=int, default=None)
@click.option("--batch-size", type=int, default=None)
@click.option("--lr", type=float, default=None)
@click.option("--lr-schedule", type=click.Choice(["constant", "cosine", "linear"]),
              default=None,
              help="LR decay shape (default constant = reference parity). "
              "Steps count each network's own optimizer updates.")
@click.option("--lr-warmup-steps", type=int, default=None,
              help="Linear warmup from 0 over this many updates.")
@click.option("--lr-decay-steps", type=int, default=None,
              help="Total updates over which cosine/linear decay runs.")
@click.option("--lr-final-factor", type=float, default=None,
              help="End LR as a fraction of --lr (default 0).")
@click.option("--compute-dtype", type=click.Choice(["float32", "bfloat16"]), default=None)
@click.option("--augment-flips/--no-augment-flips", default=None,
              help="Physics-aware on-device augmentation: random per-sample "
              "lon/lat mirror flips of the (coarse, fine) pair, negating "
              "the u/v wind component the mirror reverses (training only).")
@click.option("--grad-accum", type=int, default=None,
              help="Split each update's batch into this many microbatches "
              "and accumulate gradients on device (one optimizer update, "
              "same math, peak activation memory / N — train effective "
              "batches bigger than HBM allows).")
@click.option("--schedule", type=click.Choice(["reference", "fused"]), default=None,
              help="Generator-update schedule: reference parity (step %% n_critic) "
              "or fused n_critic-round fast path.")
@click.option("--synthetic", is_flag=True, help="Train on the synthetic dataset "
              "(no NetCDF data needed; test/benchmark mode).")
@click.option("--samples", type=int, default=512, help="Synthetic sample count.")
@click.option("--experiment", default="downgan-tpu", help="Experiment name.")
@click.option("--run-name", default=None)
@click.option("--tracking-root", default="experiments")
@click.option("--checkpoint-dir", default=None, help="Orbax checkpoint directory "
              "(default: <run artifact dir>/checkpoints).")
@click.option("--resume", is_flag=True, help="Resume from the latest checkpoint.")
@click.option("--warm-start", type=click.Path(exists=True), default=None,
              help="Initialize the generator (and critic, if present) "
              "from a bundle directory — `downgan export` output or an "
              "`import-torch`ed reference checkpoint — and train from "
              "there with fresh optimizer state. The bundle's model-shape "
              "fields override the config. A successful --resume "
              "supersedes this, but the bundle directory (its config.json "
              "sizes the model) must outlive the run for `--resume "
              "--warm-start` restart loops.")
@click.option("--interactive", is_flag=True,
              help="Interactive experiment picker + run description (reference parity).")
@click.option("--mesh/--no-mesh", default=True, help="Data-parallel over all devices.")
@click.option("--multihost", is_flag=True,
              help="Multi-process (pod / multi-slice) training: initialize "
              "jax.distributed, build the GLOBAL mesh over every host's "
              "devices, write tracking/plots from process 0 only, "
              "checkpoint collectively. Run the SAME command on every "
              "host. Requires --checkpoint-dir (a path shared or mirrored "
              "across hosts).")
@click.option("--coordinator", default=None,
              help="Coordinator address host:port for --multihost (omit on "
              "Cloud TPU pods: auto-detected from the TPU environment).")
@click.option("--num-processes", type=int, default=None,
              help="Total process count for --multihost (omit to auto-detect).")
@click.option("--process-id", type=int, default=None,
              help="This process's id for --multihost (omit to auto-detect).")
@click.option("--host-feed", is_flag=True,
              help="Keep the dataset in host RAM and stream batches through "
              "the double-buffered feed (for regions too big for HBM). "
              "Implies the per-step loop (hp.fused_epoch=False, "
              "schedule='reference'); the trajectory matches device-resident "
              "training bit-for-bit.")
@click.option("--stream", is_flag=True,
              help="Leave the dataset ON DISK and stream batches lazily "
              "from the preprocessed NetCDFs (for sets too big for host "
              "RAM; run `prepare-data` first). Implies the per-step loop "
              "like --host-feed; in a pod each host reads only its own "
              "batch rows. Trajectory matches device-resident training "
              "bit-for-bit.")
@click.option("--save-every", type=int, default=None,
              help="Checkpoint cadence in epochs (default: hp.save_every).")
@click.option("--max-checkpoints", type=int, default=None,
              help="Checkpoints retained (0 = keep every epoch, the "
              "reference's behavior — mlflow_epoch.py:65-69 — enabling "
              "`generate --epoch N` for any epoch; default: "
              "config.max_checkpoints).")
@click.option("--keep-every", type=int, default=None,
              help="Additionally pin every k-th epoch's checkpoint outside "
              "the retention window (default: config.keep_checkpoint_every).")
@click.option("--print-every", type=int, default=None,
              help="Progress-line cadence in epochs (default: hp.print_every).")
@click.option("--plot-every", type=int, default=1)
@click.option("--eof-lambda", type=float, default=None,
              help="EOF-projection regularization weight on the generator "
              "objective (hp.ncomp EOFs fit from the training fine fields).")
@click.option("--tensorboard", is_flag=True,
              help="Also log metrics/figures to TensorBoard under the run's "
              "artifact dir (tracking/tensorboard.py).")
@click.option("--mlflow-dir", type=click.Path(), default=None,
              help="Also mirror the run LIVE into an MLflow FileStore at "
              "this root (conventionally mlruns/): point `mlflow ui "
              "--backend-store-uri` at it while training, exactly the "
              "reference's watch-it-live workflow (mlflow_epoch.py). "
              "export-mlflow of the finished run is then a no-op.")
@click.option("--track-best", default=None, metavar="METRIC",
              help="Model selection: after each epoch's test pass, if this "
              "test metric (e.g. MSSSIM, MAE) improved, write the serving "
              "weights (EMA when trained with hp.ema_decay, else live) as "
              "a servable bundle under <artifacts>/best — loadable by "
              "serve/generate/evaluate via --checkpoint alone.")
@click.option("--best-mode", type=click.Choice(["max", "min"]), default=None,
              help="Improvement direction for --track-best (default: max "
              "for MSSSIM, min for error metrics).")
@click.option("--critic-conditional/--no-critic-conditional", default=None,
              help="Condition the critic on the covariates: every critic "
              "input is the channel-concat of the fine field with the "
              "nearest-upsampled coarse stack (cGAN-SR; the reference "
              "critic is unconditional and this default preserves that).")
@click.option("--freq-sep/--no-freq-sep", default=None,
              help="Frequency-separation training (the reference's "
              "wasserstein_fs.py variant): the critic scores high-pass "
              "residuals and the content loss constrains the low-pass "
              "band. Default off (reference parity).")
@click.option("--generator-arch", type=click.Choice(["rrdb", "srresnet"]),
              default=None,
              help="Generator family: rrdb (the reference's shipped "
              "ESRGAN model, default) or srresnet (its SRGAN-style "
              "variant made real).")
@click.option("--noise-channels", type=int, default=None,
              help="Latent noise channels appended to the generator input "
              "(> 0 = stochastic generator for probabilistic "
              "downscaling; default 0 = the reference's deterministic "
              "model).")
def train(config_path, region, epochs, batch_size, lr, lr_schedule,
          lr_warmup_steps, lr_decay_steps, lr_final_factor, compute_dtype,
          augment_flips, grad_accum, schedule, synthetic, samples,
          experiment, run_name,
          tracking_root, checkpoint_dir, resume, warm_start, interactive,
          mesh, multihost,
          coordinator, num_processes, process_id, host_feed, stream,
          save_every, max_checkpoints, keep_every, print_every, plot_every,
          eof_lambda, tensorboard, mlflow_dir, track_best, best_mode,
          critic_conditional, freq_sep, generator_arch, noise_channels) -> None:
    """Train the WGAN-GP super-resolution model."""
    import dataclasses

    if multihost:
        # Must run before anything initializes a JAX backend.
        from downgan_tpu.parallel.multihost import initialize

        if checkpoint_dir is None:
            raise click.UsageError(
                "--multihost requires --checkpoint-dir (only process 0 "
                "creates a tracked run, but every process checkpoints "
                "collectively into the same directory)")
        initialize(coordinator, num_processes, process_id)

    import jax

    if multihost and jax.process_count() == 1 and num_processes != 1:
        # Auto-detection can fail silently (initialize swallows the
        # ValueError when no explicit args were given). Without this
        # guard every host in the job would then train independently as
        # process 0 and race on the shared --checkpoint-dir. A true
        # single-process run is still available via --num-processes 1.
        raise click.UsageError(
            "--multihost was requested but jax.distributed did not "
            "initialize a multi-process job (process_count is 1). Pass "
            "--coordinator/--num-processes/--process-id explicitly, or "
            "--num-processes 1 to force a single-process run.")

    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.data.staging import load_preprocessed, stage_datasets
    from downgan_tpu.tracking import TrackingStore, define_experiment, log_hyperparams, write_tags
    from downgan_tpu.training.trainer import Trainer
    from downgan_tpu.utils.checkpoint import CheckpointManager

    primary = jax.process_index() == 0

    config = _load_config(
        config_path, region, epochs=epochs, batch_size=batch_size, lr=lr,
        lr_schedule=lr_schedule, lr_warmup_steps=lr_warmup_steps,
        lr_decay_steps=lr_decay_steps, lr_final_factor=lr_final_factor,
        compute_dtype=compute_dtype, augment_flips=augment_flips,
        grad_accum=grad_accum, schedule=schedule, eof_lambda=eof_lambda,
        freq_sep=freq_sep,
    )
    if critic_conditional is not None:
        config = config.replace(critic_conditional=critic_conditional)
    if generator_arch is not None:
        config = config.replace(generator_arch=generator_arch)
    if noise_channels is not None:
        if noise_channels < 0:
            raise click.UsageError("--noise-channels must be >= 0")
        config = config.replace(noise_channels=noise_channels)
    if warm_start:
        # Validate the bundle layout and adopt its model-shape fields up
        # front (cheap: config.json parse + directory checks, no orbax
        # IO) so datasets and models are built for the network being
        # warmed from — `train --synthetic --warm-start <bundle>` just
        # works. The params themselves load lazily AFTER the resume
        # decision, so a restart loop running `--resume --warm-start`
        # never pays a bundle restore it discards. The bundle DIRECTORY
        # must still outlive the run: its config.json is re-read every
        # restart to size the model (and click's exists=True checks it
        # before anything else runs).
        wcfg_path = os.path.join(warm_start, "config.json")
        if not (os.path.exists(wcfg_path)
                and os.path.isdir(os.path.join(warm_start, "params"))):
            raise click.UsageError(
                f"{warm_start} is not a bundle directory (expected "
                "params/ + config.json, the `downgan export` / "
                "`import-torch` layout)")
        with open(wcfg_path) as f:
            wcfg = Config.from_json(f.read())
        if generator_arch is not None and generator_arch != wcfg.generator_arch:
            raise click.UsageError(
                f"--generator-arch {generator_arch} conflicts with the "
                f"bundle's generator_arch={wcfg.generator_arch!r} (the "
                "warm-start weights fix the architecture)")
        if noise_channels is not None and noise_channels != wcfg.noise_channels:
            raise click.UsageError(
                f"--noise-channels {noise_channels} conflicts with the "
                f"bundle's noise_channels={wcfg.noise_channels} (the "
                "warm-start weights fix the generator input width)")
        config = config.replace(
            filters=wcfg.filters, num_res_blocks=wcfg.num_res_blocks,
            n_covariates=wcfg.n_covariates,
            n_predictands=wcfg.n_predictands,
            coarse_size=wcfg.coarse_size, fine_size=wcfg.fine_size,
            generator_arch=wcfg.generator_arch,
            noise_channels=wcfg.noise_channels)
        has_critic = os.path.isdir(os.path.join(warm_start, "critic_params"))
        if has_critic and config.critic_conditional != wcfg.critic_conditional:
            raise click.UsageError(
                "the bundle's critic was trained with "
                f"critic_conditional={wcfg.critic_conditional}; pass a "
                "matching --critic-conditional (or drop the bundle's "
                "critic_params to warm-start the generator only)")
    if host_feed and stream:
        raise click.UsageError(
            "--host-feed and --stream are different residency tiers "
            "(host RAM vs disk); pick one")
    if stream and synthetic:
        raise click.UsageError(
            "--stream reads the preprocessed NetCDF layout; --synthetic "
            "has no files to stream (run `prepare-data` on real data, or "
            "use --host-feed to exercise the streaming loop in RAM)")
    if host_feed or stream:
        if config.hp.fused_epoch or config.hp.schedule == "fused":
            click.echo("host feed: using the per-step loop "
                       "(hp.fused_epoch=False, schedule='reference')")
        config = config.replace(hp=dataclasses.replace(
            config.hp, fused_epoch=False, schedule="reference"))

    mesh_obj = None
    if multihost:
        from downgan_tpu.parallel.multihost import global_mesh

        mesh_obj = global_mesh()
    elif mesh and len(jax.devices()) > 1:
        from downgan_tpu.parallel.mesh import make_mesh

        mesh_obj = make_mesh()

    def _to_dataset(coarse, fine):
        if host_feed:
            from downgan_tpu.data.feed import HostDataset

            return HostDataset(coarse, fine)
        if multihost:
            return DeviceDataset.from_numpy_global(mesh_obj, coarse, fine)
        return DeviceDataset.from_numpy(coarse, fine)

    if synthetic:
        coarse, fine = synthetic_dataset(
            n_samples=samples, coarse_size=config.coarse_size,
            fine_size=config.fine_size, n_covariates=config.n_covariates,
            n_predictands=config.n_predictands, seed=config.seed,
        )
        split = int(0.9 * samples)
        train_ds = _to_dataset(coarse[:split], fine[:split])
        test_ds = _to_dataset(coarse[split:], fine[split:])
    elif stream:
        from downgan_tpu.data.stream import StreamDataset

        train_ds = StreamDataset.from_preprocessed(config, "train")
        test_ds = StreamDataset.from_preprocessed(config, "test")
    elif host_feed or multihost:
        from downgan_tpu.data.staging import generate_train_test_coarse_fine

        if config.already_preprocessed:
            ct, ft, cv, fv = load_preprocessed(config)
        else:
            ct, ft, cv, fv = generate_train_test_coarse_fine(config)
        train_ds, test_ds = _to_dataset(ct, ft), _to_dataset(cv, fv)
    else:
        train_ds, test_ds = stage_datasets(config)

    # Tracking writes come from process 0 only; the training computation
    # itself is identical on every process (SPMD).
    run = None
    if primary:
        store = TrackingStore(tracking_root)
        exp_id = define_experiment(store, name=experiment, interactive=interactive,
                                   tag=config.experiment_tag)
        run = store.create_run(exp_id, run_name=run_name).start()
        log_hyperparams(run, config)
        write_tags(run, interactive=interactive)
        with open(run.artifact_path("config.json"), "w") as f:
            f.write(config.to_json())
        if mlflow_dir is not None:
            # Attach AFTER params/tags/config.json so the seeding export
            # carries them; every epoch's metrics then mirror live.
            from downgan_tpu.tracking.mlflow_export import MlflowLiveRun

            run.attach_sink(MlflowLiveRun(run, mlflow_dir))
            click.echo(f"mirroring live to MLflow FileStore {mlflow_dir} "
                       f"(view: mlflow ui --backend-store-uri "
                       f"{os.path.abspath(mlflow_dir)})")

    ckpt_dir = checkpoint_dir or os.path.join(run.artifact_dir, "checkpoints")
    if max_checkpoints is None:
        max_checkpoints = config.max_checkpoints
    keep = config.keep_checkpoint_every if keep_every is None else keep_every
    ckpt = CheckpointManager(
        ckpt_dir,
        max_to_keep=(None if max_checkpoints == 0 else max_checkpoints),
        keep_period=keep,
    )

    trainer = Trainer(
        config, train_ds, test_ds, run=run, checkpoint_manager=ckpt,
        mesh=mesh_obj, save_every=save_every, print_every=print_every,
        plot_every=plot_every,
        tensorboard_dir=(os.path.join(run.artifact_dir, "tensorboard")
                         if tensorboard and run is not None else None),
        track_best=track_best, best_mode=best_mode,
    )
    resumed = trainer.maybe_resume() if resume else False
    if warm_start and not resumed:
        from downgan_tpu.inference import load_bundle

        try:
            _, w_g, w_c = load_bundle(warm_start)
        except FileNotFoundError as e:
            raise click.UsageError(str(e))
        trainer.warm_start(w_g, w_c)
    try:
        trainer.train()
        if run is not None:
            # KILLED is the mlflow status vocabulary for an externally
            # stopped run; the full state is checkpointed either way.
            run.end("KILLED" if trainer.preempted else "FINISHED")
    except BaseException:
        if run is not None:
            run.end("FAILED")
        raise
    finally:
        ckpt.close()
        if stream:
            train_ds.close()
            test_ds.close()
    if trainer.preempted:
        click.echo(
            f"preempted after epoch {trainer.epoch - 1}: checkpoint saved; "
            "re-run with --resume to continue the exact trajectory")
    if run is not None:
        click.echo(f"run {run.run_id} finished; artifacts in {run.artifact_dir}")


@cli.command("prepare-data")
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--region", "-r", type=click.Choice(list(REGIONS)), default=None)
def prepare_data(config_path, region) -> None:
    """Run the preprocessing pipeline and write the 4 train/test NetCDFs
    (parity with helpers/gen_train_test_netcdfs.py)."""
    from downgan_tpu.data.staging import (
        generate_train_test_coarse_fine,
        load_fine_coords,
        write_preprocessed,
    )

    config = _load_config(config_path, region)
    arrays = generate_train_test_coarse_fine(config)
    lats, lons = load_fine_coords(config)
    paths = write_preprocessed(config, *arrays, fine_lats=lats, fine_lons=lons)
    for p in paths:
        click.echo(p)


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--region", "-r", type=click.Choice(list(REGIONS)), default=None)
@click.option("--checkpoint", "-c", default=None, help="Checkpoint directory.")
@click.option("--run", "run_id", default=None,
              help="Tracked run id to restore from (parity with the "
              "reference's run-hash restore, gen_fake_ds.py -h): resolves "
              "the run's checkpoints and logged config through the store.")
@click.option("--tracking-root", default="experiments",
              help="Tracking store root for --run resolution.")
@click.option("--epoch", "-e", type=int, default=None, help="Checkpoint step (default latest).")
@click.option("--weights-only", is_flag=True, help="Checkpoint holds bare generator params.")
@click.option("--ema", is_flag=True,
              help="Generate with the EMA generator weights (what "
              "EMA-trained runs actually serve; requires hp.ema_decay > 0 "
              "at train time).")
@click.option("--out", "-o", default=None,
              help="Output NetCDF (default: generated.nc, or the run's "
              "artifact dir under --run, like gen_fake_ds.py:52).")
@click.option("--synthetic", is_flag=True, help="Generate from synthetic covariates.")
@click.option("--raw-covariates", is_flag=True,
              help="Rebuild the standardized coarse covariate stack from "
              "RAW NetCDFs in this command (parity with "
              "gen_fake_ds.py:92-144) instead of reading preprocessed files.")
@click.option("--subset", type=click.Choice(["train", "test"]), default="test",
              help="Which year-mask subset to generate for — raw "
              "(--raw-covariates) or preprocessed covariates alike (the "
              "reference generates the test years, gen_fake_ds.py:92).")
@click.option("--samples", type=int, default=100)
@click.option("--tile-rows", type=int, default=0,
              help="Overlap-tile the lat axis for domains taller than the "
              "training patch (0 = whole-field forward).")
@click.option("--overlap", type=int, default=8, help="Tile context rows per side.")
@click.option("--tile-cols", type=int, default=0,
              help="Also overlap-tile the lon axis (0 = whole-width bands).")
@click.option("--tiles-per-dispatch", type=int, default=8,
              help="Tiles folded into one device dispatch (amortizes the "
              "host fetch round-trip).")
@click.option("--ensemble", type=int, default=0,
              help="Probabilistic downscaling: generate this many ensemble "
              "members from a stochastic generator (trained with "
              "Config.noise_channels > 0); the output NetCDF gains a "
              "leading `member` dimension. Incompatible with tiling.")
@click.option("--streamed", is_flag=True,
              help="Write each generated chunk straight into the NetCDF "
              "(constant host memory in series length — the full output "
              "is ~sf^2x the input and may not fit RAM; identical file "
              "contents to the in-memory path). Composes with --tile-rows "
              "and --ensemble.")
def generate(config_path, region, checkpoint, run_id, tracking_root, epoch,
             weights_only, ema, out, synthetic, raw_covariates, subset, samples,
             tile_rows, overlap, tile_cols, tiles_per_dispatch,
             ensemble, streamed) -> None:
    """Generate super-resolved fields from a trained checkpoint and write
    them to NetCDF (parity with helpers/gen_fake_ds.py)."""
    from downgan_tpu.data.staging import load_preprocessed
    from downgan_tpu.inference import (
        generate_ensemble,
        generate_fields,
        rebuild_coarse_covariates,
        write_generated_netcdf,
    )

    if ensemble and tile_rows:
        raise click.UsageError(
            "--ensemble and --tile-rows are mutually exclusive (tiled "
            "domains generate one member per call; loop members with "
            "different runs if needed)")

    config, checkpoint, run, bundle = _resolve_source_config(
        config_path, region, checkpoint, run_id, tracking_root)
    weights_only = weights_only or bundle
    if out is None:
        out = (os.path.join(run.artifact_dir, "generated_ds.nc")
               if run is not None else "generated.nc")

    times = lats = lons = None
    if synthetic:
        from downgan_tpu.data.dataset import synthetic_dataset

        coarse, _ = synthetic_dataset(
            n_samples=samples, coarse_size=config.coarse_size,
            fine_size=config.fine_size, n_covariates=config.n_covariates,
            n_predictands=config.n_predictands, seed=config.seed,
        )
    elif raw_covariates:
        from downgan_tpu.data.staging import load_fine_coords

        coarse, times = rebuild_coarse_covariates(config, subset=subset)
        # True geospatial coords of the generated fields: the fine grid's
        # cropped lat/lon, like the reference writes (gen_fake_ds.py:86-90,
        # 162 — its generated ds carries the fine crop's coords).
        lats, lons = load_fine_coords(config)
    else:
        from downgan_tpu.data.staging import load_preprocessed_coords

        # Honor --subset like the raw path: the reference generates the
        # TEST years (gen_fake_ds.py:92-144); load_preprocessed returns
        # (coarse_train, fine_train, coarse_test, fine_test).
        ct, _, cv, _ = load_preprocessed(config)
        coarse = ct if subset == "train" else cv
        lats, lons = load_preprocessed_coords(config)

    if ema and weights_only:
        raise click.UsageError(
            "--ema needs the full-train-state checkpoint layout; "
            "weights-only checkpoints hold one set of params")
    g_params = _restore_params_cli(config, checkpoint, step=epoch,
                                   weights_only=weights_only, use_ema=ema)
    import numpy as np

    if times is not None:
        times = np.asarray(times)
        if times.dtype.kind == "M":  # datetime64 -> epoch seconds
            times = times.astype("datetime64[s]").astype("float64")
    # Attach true coords only when their lengths match the generated grid
    # (a model whose upsample ratio differs from the data scale_factor
    # produces a different fine size; fall back to index coords then).
    sf = 2 ** config.num_upsample
    if lats is not None and len(lats) != coarse.shape[1] * sf:
        lats = None
    if lons is not None and len(lons) != coarse.shape[2] * sf:
        lons = None

    mesh = None
    if tile_rows:
        import jax

        if len(jax.devices()) > 1:
            # Multi-chip host: shard the tiles data-parallel over all
            # devices (bit-identical to single-device, tested) — the
            # streamed path dispatches tiles the same way per time block.
            from jax.sharding import NamedSharding, PartitionSpec

            from downgan_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            # Replicate params once up front; otherwise every one of the
            # ceil(n_tiles / tiles_per_dispatch) dispatches re-transfers
            # the whole param tree onto the mesh.
            g_params = jax.device_put(
                g_params, NamedSharding(mesh, PartitionSpec()))

    if streamed:
        from downgan_tpu.inference import generate_to_netcdf

        generate_to_netcdf(
            out, config, g_params, coarse, var_names=("u10", "v10"),
            times=times, lats=lats, lons=lons, n_members=ensemble,
            tile_rows=tile_rows, overlap=overlap, tile_cols=tile_cols,
            tiles_per_dispatch=tiles_per_dispatch, mesh=mesh)
        what = (f"{coarse.shape[0]} generated fields x {ensemble} members"
                if ensemble else f"{coarse.shape[0]} generated fields")
        click.echo(f"wrote {what} to {out} (streamed)")
        return

    if tile_rows:
        from downgan_tpu.parallel.spatial import tiled_sr_inference

        fields = tiled_sr_inference(config, g_params, coarse,
                                    tile_rows=tile_rows, overlap=overlap,
                                    tile_cols=tile_cols,
                                    tiles_per_dispatch=tiles_per_dispatch,
                                    mesh=mesh)
    elif ensemble:
        fields = generate_ensemble(config, g_params, coarse, ensemble)
    else:
        fields = generate_fields(config, g_params, coarse)
    write_generated_netcdf(out, fields, var_names=("u10", "v10"), times=times,
                           lats=lats, lons=lons)
    what = (f"{fields.shape[1]} generated fields x {fields.shape[0]} members"
            if fields.ndim == 5 else f"{fields.shape[0]} generated fields")
    click.echo(f"wrote {what} to {out}")


@cli.command("export")
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--checkpoint", "-c", default=None,
              help="Full-train-state checkpoint directory to export from.")
@click.option("--run", "run_id", default=None,
              help="Tracked run id to export from (resolved like generate --run).")
@click.option("--tracking-root", default="experiments")
@click.option("--epoch", "-e", type=int, default=None,
              help="Checkpoint step to export (default: latest).")
@click.option("--ema", is_flag=True,
              help="Bake the EMA generator weights into the bundle (the "
              "standard GAN serving weights; requires hp.ema_decay > 0 at "
              "train time).")
@click.option("--out", "-o", required=True, type=click.Path(),
              help="Output bundle directory (created).")
def export_bundle(config_path, checkpoint, run_id, tracking_root, epoch,
                  ema, out) -> None:
    """Export a self-contained servable generator bundle: weights-only
    params + the model config, dropping critic and optimizer state (~3x
    smaller than a train checkpoint).

    The TPU-native analogue of the reference's per-epoch weights-only
    artifacts (``mlflow_tools/mlflow_epoch.py:65-69``), as an explicit
    deploy step: ``serve`` / ``generate`` / ``evaluate`` load the bundle
    with just ``--checkpoint <out>`` (weights-only is auto-detected).
    """
    from downgan_tpu.inference import write_generator_bundle

    config, checkpoint, _, bundle = _resolve_source_config(
        config_path, None, checkpoint, run_id, tracking_root)
    if bundle:
        raise click.UsageError(f"{checkpoint} is already an exported bundle")
    g_params = _restore_params_cli(config, checkpoint, step=epoch,
                                   use_ema=ema)
    out = write_generator_bundle(out, config, g_params)
    click.echo(f"exported {'EMA ' if ema else ''}generator bundle to {out}")


@cli.command("export-mlflow")
@click.option("--run", "run_id", default=None,
              help="Tracked run id to export (default: every run of "
              "--experiment, or of ALL experiments).")
@click.option("--experiment", default=None,
              help="Experiment name to export when --run is not given.")
@click.option("--tracking-root", default="experiments")
@click.option("--out", "-o", default="mlruns", type=click.Path(),
              help="MLflow FileStore root to write (point `mlflow ui "
              "--backend-store-uri` at this directory).")
@click.option("--checkpoints/--no-checkpoints", "include_checkpoints",
              default=False, show_default=True,
              help="Also copy the run's Orbax checkpoints/ subtree into "
              "the FileStore artifacts (multi-GB for retained full train "
              "states; weight migration is export-torch's job).")
def export_mlflow(run_id, experiment, tracking_root, out,
                  include_checkpoints) -> None:
    """Export tracked runs as an MLflow FileStore tree.

    The reference's run history lives in an MLflow FileStore
    (``GAN/stage.py:66-70``, ``mlflow_tools/mlflow_server_cmd.py:4``);
    this writes downgan_tpu runs in that exact on-disk format —
    meta.yaml + params/ + metrics/ + tags/ + artifacts/ — so a reference
    user's existing MLflow UI and MlflowClient tooling open TPU runs
    unchanged (run-history migration, the counterpart of export-torch's
    model migration).
    """
    from downgan_tpu.tracking.mlflow_export import export_experiment, export_run
    from downgan_tpu.tracking.store import TrackingStore

    store = TrackingStore(tracking_root)
    written = []
    if run_id is not None:
        try:
            run = store.get_run(run_id)
        except KeyError as e:
            raise click.UsageError(str(e))
        if experiment is not None:
            # --experiment is a filter, not decoration: exporting a --run
            # from a different experiment than the one named would
            # silently violate "only runs of experiment X".
            exp_id = store.experiment_by_name(experiment)
            if exp_id is None or run.experiment_id != exp_id:
                raise click.UsageError(
                    f"run {run_id} does not belong to experiment "
                    f"{experiment!r} (it is in experiment id "
                    f"{run.experiment_id}); drop --experiment or pick a "
                    "run from that experiment")
        written.append(export_run(run, out, include_checkpoints=include_checkpoints))
    else:
        experiments = store.experiments()
        if experiment is not None:
            exp_id = store.experiment_by_name(experiment)
            if exp_id is None:
                raise click.UsageError(
                    f"experiment {experiment!r} not found in {tracking_root} "
                    f"(have: {[i.get('name') for i in experiments.values()]})")
            exp_ids = [exp_id]
        else:
            exp_ids = list(experiments)
        for exp_id in exp_ids:
            written.extend(export_experiment(
                store, exp_id, out,
                include_checkpoints=include_checkpoints))
    if not written:
        raise click.UsageError(f"no runs to export under {tracking_root}")
    click.echo(f"exported {len(written)} run(s) to MLflow FileStore {out}")
    click.echo(f"view: mlflow ui --backend-store-uri {os.path.abspath(out)}")


@cli.command("export-torch")
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--checkpoint", "-c", default=None,
              help="Checkpoint directory or exported bundle.")
@click.option("--run", "run_id", default=None,
              help="Tracked run id (resolved like generate --run).")
@click.option("--tracking-root", default="experiments")
@click.option("--epoch", "-e", type=int, default=None,
              help="Checkpoint step (default: latest).")
@click.option("--ema", is_flag=True,
              help="Export the EMA generator weights.")
@click.option("--out", "-o", required=True, type=click.Path(),
              help="Output torch state_dict file (.pt).")
def export_torch(config_path, checkpoint, run_id, tracking_root, epoch,
                 ema, out) -> None:
    """Export a trained generator as a reference-layout torch state_dict
    — the inverse of ``import-torch`` (round-trip pinned in
    tests/test_parity_reference.py): load it upstream with
    ``Generator(filters, fine, channels, preds, num_res_blocks=N)
    .load_state_dict(torch.load(out))`` — for stochastic models
    (``noise_channels > 0``) pass ``channels = covariates + noise``."""
    import numpy as np

    try:
        import torch
    except ImportError:
        raise click.UsageError(
            "export-torch needs the `torch` package to write the "
            "state_dict (CPU build is enough)")

    from downgan_tpu.utils.port_weights import export_generator

    config, checkpoint, _, bundle = _resolve_source_config(
        config_path, None, checkpoint, run_id, tracking_root)
    if config.generator_arch != "rrdb":
        raise click.UsageError(
            "export-torch maps the reference RRDB layout only; "
            f"this model is generator_arch={config.generator_arch!r}")
    if ema and bundle:
        raise click.UsageError(
            "an exported bundle holds ONE set of params (EMA already "
            "baked in if it was exported with --ema); drop --ema, or "
            "export-torch from the full Trainer checkpoint directory")
    if config.noise_channels > 0:
        # The torch layout has no latent concept: conv1 is written with
        # covariates+noise input channels. Re-importing that file infers
        # n_covariates = cov+noise and noise_channels=0 — a deterministic
        # bundle whose covariate count no longer matches the training
        # data. Warn so the round-trip asymmetry is never silent.
        click.echo(
            f"warning: stochastic generator (noise_channels="
            f"{config.noise_channels}) — the torch layout bakes the "
            f"latent into conv1 ({config.n_covariates} covariates + "
            f"{config.noise_channels} noise input channels). Upstream, "
            "pass channels = covariates + noise and feed latents "
            "explicitly; re-importing via import-torch yields a "
            "DETERMINISTIC model expecting that widened input, not a "
            "drop-in --warm-start/--ensemble bundle.", err=True)
    g_params = _restore_params_cli(config, checkpoint, step=epoch,
                                   weights_only=bundle, use_ema=ema)
    sd = export_generator(g_params, num_res_blocks=config.num_res_blocks,
                          num_upsample=config.num_upsample)
    # np.array: a writable contiguous copy (from_numpy warns on the
    # read-only views orbax restores hand back).
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               out)
    click.echo(f"exported {'EMA ' if ema else ''}generator "
               f"({len(sd)} tensors, reference torch layout) to {out}")


@cli.command("import-torch")
@click.option("--weights", required=True, type=click.Path(exists=True),
              help="Reference (PyTorch DoWnGAN) generator checkpoint: a "
              "state_dict .pt/.pth, or a pickled Generator module (what "
              "mlflow.pytorch logged per epoch — mlflow_epoch.py:65-69).")
@click.option("--critic-weights", type=click.Path(exists=True), default=None,
              help="Optionally also import the Critic (state_dict or "
              "pickled module) so `train --warm-start` continues the "
              "adversarial game with the trained critic.")
@click.option("--config", "config_path", type=click.Path(exists=True), default=None,
              help="Base config for data paths/region; the model-shape "
              "fields are inferred from the torch weights and override it.")
@click.option("--region", "-r", type=click.Choice(list(REGIONS)), default=None)
@click.option("--out", "-o", required=True, type=click.Path(),
              help="Output bundle directory (created).")
def import_torch(weights, critic_weights, config_path, region, out) -> None:
    """Import a reference (PyTorch DoWnGAN) checkpoint as a servable
    bundle: the migration path for models trained on the upstream code.

    Maps the torch state_dict onto the NHWC flax parameter tree
    (``utils/port_weights.py`` — OIHW→HWIO kernels, the critic's
    NCHW→NHWC classifier permutation), infers the architecture from the
    weights themselves, and writes the ``downgan export`` bundle layout,
    so ``serve`` / ``generate`` / ``evaluate`` load it with just
    ``--checkpoint <out>`` and ``train --warm-start <out>`` continues
    training it on TPU. Forward parity of ported weights is pinned to
    2e-5 against the reference nets (tests/test_parity_reference.py).
    """
    import numpy as np

    try:
        import torch
    except ImportError:
        raise click.UsageError(
            "import-torch needs the `torch` package to read the "
            "checkpoint (CPU build is enough)")

    from downgan_tpu.utils.port_weights import (
        infer_critic_arch,
        infer_generator_arch,
        port_critic,
        port_generator,
    )

    def load_state_dict(path):
        try:
            obj = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # A pickled module (mlflow.pytorch's model.pth) rather than a
            # bare state_dict.
            try:
                obj = torch.load(path, map_location="cpu",
                                 weights_only=False)
            except ModuleNotFoundError as e:
                raise click.UsageError(
                    f"{path} is a pickled torch module and unpickling "
                    f"needs its defining package ({e.name}) importable — "
                    "put the reference DoWnGAN checkout on PYTHONPATH, or "
                    "re-save the checkpoint as a bare state_dict "
                    "(torch.save(model.state_dict(), ...))")
        if hasattr(obj, "state_dict") and not isinstance(obj, dict):
            obj = obj.state_dict()
        if not isinstance(obj, dict):
            raise click.UsageError(
                f"{path} is neither a state_dict nor a torch module")
        return {k: np.asarray(v.detach().cpu().numpy()
                              if hasattr(v, "detach") else v)
                for k, v in obj.items()}

    sd = load_state_dict(weights)
    try:
        arch = infer_generator_arch(sd)
    except ValueError as e:
        raise click.UsageError(str(e))
    config = _load_config(config_path, region).replace(
        filters=arch["filters"], n_covariates=arch["n_covariates"],
        n_predictands=arch["n_predictands"],
        num_res_blocks=arch["num_res_blocks"],
        generator_arch="rrdb", noise_channels=0,
    )
    sf = 2 ** arch["num_upsample"]
    g_params = port_generator(sd, num_res_blocks=arch["num_res_blocks"],
                              num_upsample=arch["num_upsample"])

    c_params = None
    if critic_weights:
        csd = load_state_dict(critic_weights)
        try:
            carch = infer_critic_arch(csd)
        except ValueError as e:
            raise click.UsageError(str(e))
        if carch["n_predictands"] != arch["n_predictands"]:
            raise click.UsageError(
                f"critic takes {carch['n_predictands']} channels but the "
                f"generator predicts {arch['n_predictands']} — not a "
                "matching (unconditional) pair")
        config = config.replace(fine_size=carch["fine_size"],
                                coarse_size=carch["fine_size"] // sf,
                                critic_conditional=False)
        c_params = port_critic(csd, base=carch["filters"],
                               fine_size=carch["fine_size"])
    else:
        config = config.replace(coarse_size=config.fine_size // sf)

    # Validate the ported tree against the flax model definition (a
    # mis-mapped key fails here, not at serve time) with a real forward.
    import jax
    import jax.numpy as jnp

    from downgan_tpu.training.state import make_models

    gen, critic = make_models(config)
    probe = jnp.zeros((1, config.coarse_size, config.coarse_size,
                       config.n_covariates), jnp.float32)
    fields = jax.eval_shape(gen.apply, g_params, probe)
    if fields.shape != (1, config.fine_size, config.fine_size,
                        config.n_predictands):
        raise click.UsageError(
            f"ported generator produces {fields.shape}, expected "
            f"(1, {config.fine_size}, {config.fine_size}, "
            f"{config.n_predictands})")
    if c_params is not None:
        jax.eval_shape(critic.apply, c_params,
                       jnp.zeros((1, config.fine_size, config.fine_size,
                                  config.n_predictands), jnp.float32))

    from downgan_tpu.inference import write_generator_bundle

    out = write_generator_bundle(out, config, g_params, c_params=c_params)
    n_g = sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(g_params))
    click.echo(
        f"imported generator ({arch['filters']} filters, "
        f"{arch['num_res_blocks']} RRDBs, {sf}x upsample, {n_g:,} params"
        + (", + critic" if c_params is not None else "")
        + f") to {out}")
    click.echo(
        f"note: inferred n_covariates={arch['n_covariates']} is conv1's "
        "input width — for a checkpoint exported from a stochastic "
        "(noise_channels>0) model that width includes the baked-in noise "
        "channels, and the imported bundle is deterministic.")


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--checkpoint", "-c", default=None, help="Checkpoint directory.")
@click.option("--run", "run_id", default=None,
              help="Serve a tracked run's checkpoints (resolved through the "
              "tracking store, like `generate --run`).")
@click.option("--tracking-root", default="experiments")
@click.option("--epoch", "-e", type=int, default=None)
@click.option("--weights-only", is_flag=True)
@click.option("--ema", is_flag=True,
              help="Serve the EMA generator weights (the standard GAN "
              "serving trick, config.hp.ema_decay; requires an EMA-trained "
              "full-state checkpoint).")
@click.option("--host", default="0.0.0.0")
@click.option("-p", "--port", type=int, default=8080)
@click.option("--serving-batch", type=int, default=0,
              help="Compiled batch size (0 = config.chunk_size).")
@click.option("--coalesce/--no-coalesce", default=True,
              help="Batch concurrent requests into one device dispatch "
              "(BatchingSRModel) instead of serializing them.")
@click.option("--max-wait-ms", type=float, default=5.0,
              help="How long the coalescer lingers for stragglers once the "
              "first request of a batch arrives.")
@click.option("--mesh/--no-mesh", "use_mesh", default=True,
              help="Shard domain-request tiles data-parallel over all "
              "devices (multi-chip hosts; bit-identical to single-device).")
@click.option("--max-domain-output-mb", type=click.IntRange(min=0),
              default=1024,
              help="413 cap on a domain request's estimated OUTPUT "
              "allocation (the response is ~sf^2*(P/C) times the input, so "
              "a body cap alone would not protect host RAM); 0 = uncapped.")
def serve(config_path, checkpoint, run_id, tracking_root, epoch, weights_only,
          ema, host, port, serving_batch, coalesce, max_wait_ms,
          use_mesh, max_domain_output_mb) -> None:
    """Serve super-resolution inference over HTTP (POST .npy covariates to
    /v1/generate; GET /healthz, /metrics). No reference equivalent — the
    serving layer for production deployment."""
    from downgan_tpu.serving import BatchingSRModel, SRModel, serve_model

    config, checkpoint, _, bundle = _resolve_source_config(
        config_path, None, checkpoint, run_id, tracking_root)
    weights_only = weights_only or bundle
    if ema and weights_only:
        raise click.UsageError(
            "--ema needs the full-train-state checkpoint layout; "
            "weights-only checkpoints (incl. exported bundles) hold one "
            "set of params — export with --ema instead")
    g_params = _restore_params_cli(config, checkpoint, step=epoch,
                                   weights_only=weights_only, use_ema=ema)
    import jax

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        from downgan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    # 0 = uncapped (the CLI's usual "0 = off" convention); a literal 0
    # cap would 413 every domain request.
    out_cap = (max_domain_output_mb << 20) if max_domain_output_mb else (1 << 62)
    if coalesce:
        model = BatchingSRModel(config, g_params, batch_size=serving_batch,
                                max_wait_ms=max_wait_ms, mesh=mesh,
                                max_domain_output_bytes=out_cap)
    else:
        model = SRModel(config, g_params, batch_size=serving_batch, mesh=mesh,
                        max_domain_output_bytes=out_cap)
    server = serve_model(model, host, port)
    click.echo(f"SR inference on http://{host}:{port} (batch {model.batch}, "
               f"coalesce={coalesce})")
    try:
        server.serve_forever()
    finally:
        # Drain the coalescer on shutdown so queued requests get answers
        # (the worker processes its queue before exiting) instead of dying
        # silently with the daemon thread.
        if coalesce:
            model.close()


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--region", type=click.Choice(list(REGIONS)), default=None)
@click.option("--checkpoint", "-c", default=None, help="Checkpoint directory.")
@click.option("--run", "run_id", default=None,
              help="Evaluate a tracked run's checkpoints (like generate --run).")
@click.option("--tracking-root", default="experiments")
@click.option("--epoch", "-e", type=int, default=None,
              help="Checkpoint step to evaluate (default: latest).")
@click.option("--synthetic", is_flag=True, help="Evaluate on the synthetic dataset.")
@click.option("--samples", type=int, default=128, help="Synthetic sample count.")
@click.option("--split", type=click.Choice(["train", "test"]), default="test",
              help="Which preprocessed split to evaluate (parity with the "
              "reference's per-epoch test pass, wasserstein.py:157-169).")
@click.option("--out", type=click.Path(), default=None,
              help="Also write the metric means to this JSON file.")
@click.option("--ema", is_flag=True,
              help="Evaluate the EMA generator weights (what EMA-trained "
              "runs actually serve) instead of the live weights.")
@click.option("--weights-only", is_flag=True,
              help="Checkpoint holds bare generator params (like generate/"
              "serve). The Wass metric needs the critic and is dropped "
              "with a warning in this mode.")
@click.option("--ensemble", type=int, default=0,
              help="Probabilistic verification for stochastic generators "
              "(Config.noise_channels > 0): also score a K-member ensemble "
              "— fair CRPS, spread, ensemble-mean MAE (ops.ensemble).")
def evaluate(config_path, region, checkpoint, run_id, tracking_root, epoch,
             synthetic, samples, split, out, ema, weights_only,
             ensemble) -> None:
    """Standalone test-set metric pass from a checkpoint: the metric
    registry (hp.metrics_to_calculate) over a whole split — full batches
    as one compiled scan plus the ragged tail as its own batch, so every
    held-out sample counts (parity with the reference's drop_last=False
    test loader, stage.py:78-81 + wasserstein.py:157-169)."""
    import dataclasses

    import jax
    import numpy as np

    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.training.state import create_state, make_models
    from downgan_tpu.training.wgan import build_eval_metrics, build_eval_scan
    from downgan_tpu.utils.checkpoint import CheckpointManager

    config, checkpoint, _, bundle = _resolve_source_config(
        config_path, region, checkpoint, run_id, tracking_root)
    weights_only = weights_only or bundle
    if weights_only and "Wass" in config.hp.metrics_to_calculate:
        click.echo("warning: --weights-only checkpoints carry no critic; "
                   "dropping the Wass metric", err=True)
        config = config.replace(hp=dataclasses.replace(
            config.hp,
            metrics_to_calculate=tuple(
                m for m in config.hp.metrics_to_calculate if m != "Wass"),
        ))

    if synthetic:
        coarse, fine = synthetic_dataset(
            n_samples=samples, coarse_size=config.coarse_size,
            fine_size=config.fine_size, n_covariates=config.n_covariates,
            n_predictands=config.n_predictands, seed=config.seed,
        )
        ds = DeviceDataset.from_numpy(coarse, fine)
    else:
        from downgan_tpu.data.staging import load_preprocessed

        ct, ft, cv, fv = load_preprocessed(config)
        ds = (DeviceDataset.from_numpy(ct, ft) if split == "train"
              else DeviceDataset.from_numpy(cv, fv))

    gen, critic = make_models(config)
    state = create_state(config, jax.random.PRNGKey(config.seed))
    if weights_only:
        if ema:
            raise click.UsageError(
                "--ema needs the full-train-state checkpoint layout; "
                "weights-only checkpoints hold one set of params")
        state = state.replace(g_params=_restore_params_cli(
            config, checkpoint, step=epoch, weights_only=True))
    else:
        state = CheckpointManager(checkpoint).restore(state, step=epoch)
        if ema:
            if state.g_ema is None:
                raise click.UsageError(
                    "--ema requires an EMA-trained run (hp.ema_decay > 0)")
            state = state.replace(g_params=state.g_ema)

    from downgan_tpu.training.trainer import full_split_metric_pass

    means = {k: round(v, 6) for k, v in full_split_metric_pass(
        state, ds, config.hp.batch_size, np.random.default_rng(config.seed),
        jax.jit(build_eval_metrics(config, gen, critic)),
        eval_scan=jax.jit(build_eval_scan(config, gen, critic)),
    ).items()}
    result = {"split": "synthetic" if synthetic else split,
              "n_samples": len(ds), "step": int(state.step), **means}
    if ensemble:
        if config.noise_channels <= 0:
            raise click.UsageError(
                "--ensemble needs a stochastic generator (trained with "
                "Config.noise_channels > 0); this model is deterministic")
        from downgan_tpu.inference import ensemble_metrics

        host_coarse = np.asarray(ds.host_coarse if ds.host_coarse is not None
                                 else ds.coarse)
        host_fine = np.asarray(ds.host_fine if ds.host_fine is not None
                               else ds.fine)
        ens = ensemble_metrics(config, state.g_params, host_coarse, host_fine,
                               ensemble)
        result.update({k: (round(v, 6) if isinstance(v, float) else v)
                       for k, v in ens.items()})
    line = json.dumps(result)
    if out:
        with open(out, "w") as f:
            f.write(line)
    click.echo(line)


@cli.command("serve-tracking")
@click.option("--root", default="experiments")
@click.option("--host", default="0.0.0.0")
@click.option("-p", "--port", type=int, default=5555)
def serve_tracking(root, host, port) -> None:
    """Serve the tracking UI (parity with mlflow_tools/mlflow_server_cmd.py)."""
    from downgan_tpu.tracking.server import serve

    server = serve(root, host, port)
    click.echo(f"tracking UI on http://{host}:{port} (store: {root})")
    server.serve_forever()


@cli.command("prepare-covariates")
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--region", "-r", type=click.Choice(list(REGIONS)), default=None)
@click.option("--set", "-s", "which_set", type=click.Choice(["train", "validation"]),
              default="train", help="Which split to write (validation is "
              "standardized with TRAIN statistics).")
def prepare_covariates(config_path, region, which_set) -> None:
    """Write one standardized NetCDF per covariate for a region/split
    (parity with the legacy helpers/covariates.py CLI, including its
    train-statistics standardization of the validation set)."""
    import numpy as np

    from downgan_tpu.config.config import COVARIATE_NAMES_ORDERED
    from downgan_tpu.data.netcdf import write_netcdf
    from downgan_tpu.data.pipeline import standardize_all
    from downgan_tpu.data.staging import load_covariates, load_fine
    from downgan_tpu.data.times import filter_times

    config = _load_config(config_path, region)
    _, times = load_fine(config)
    if times is None:
        times = np.asarray(config.range_datetimes)
    n_times = len(times)
    cov = load_covariates(config, n_times)

    train_mask = filter_times(times[:n_times], mask_years=config.mask_years)
    sel_mask = train_mask.copy() if which_set == "train" else ~train_mask
    sel_mask[0] = False  # legacy quirk: first WRF field dropped (covariates.py)

    # Statistics masks follow the reference exactly (covariates.py:60-64,
    # 115-147): the train split standardizes over ITSELF (first field
    # already dropped); the validation split uses ~time_mask computed
    # AFTER time_mask[0]=False — i.e. the train times PLUS the dropped
    # first field (a reference quirk, kept for numerical parity).
    stats_mask = sel_mask if which_set == "train" else ~sel_mask
    stats_sub = {k: v[stats_mask] for k, v in cov.items()}
    _, stats = standardize_all(stats_sub)
    selected = {k: v[sel_mask] for k, v in cov.items()}
    standardized, _ = standardize_all(selected, stats=stats)

    os.makedirs(config.proc_data_dir, exist_ok=True)
    stats_path = os.path.join(
        config.proc_data_dir, f"cov_stats_{config.region}.json"
    )
    with open(stats_path, "w") as f:
        json.dump({k: list(v) for k, v in stats.items()}, f, indent=2)
    click.echo(stats_path)
    for name in COVARIATE_NAMES_ORDERED:
        arr = np.asarray(standardized[name], dtype=np.float32)
        path = os.path.join(
            config.proc_data_dir, f"cov_{name}_{which_set}_{config.region}.nc"
        )
        write_netcdf(
            path,
            variables={name: arr},
            dims={name: ("time", "lat", "lon")},
            coords={"time": np.arange(arr.shape[0], dtype=np.float64)},
        )
        click.echo(path)


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
def show_config(config_path) -> None:
    """Print the resolved configuration as JSON."""
    click.echo(_load_config(config_path, None).to_json())


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--region", type=click.Choice(list(REGIONS)), default=None)
@click.option("--batch-size", type=int, default=None)
@click.option("--compute-dtype", type=click.Choice(["float32", "bfloat16"]), default=None)
@click.option("--steps", type=int, default=10, help="Profiled steps (after a warm-up compile+step outside the trace).")
@click.option("--mode", type=click.Choice(["train", "infer"]), default="train",
              help="Profile the full WGAN-GP train step or the generator forward.")
@click.option("--out", type=click.Path(), default="profiles",
              help="Trace directory; view with `tensorboard --logdir <out>`.")
@click.option("--anomaly", is_flag=True,
              help="Scoped jax_debug_nans over the profiled window (the "
              "reference's always-on torch anomaly hook, wasserstein.py:13, "
              "made opt-in and scoped).")
def profile(config_path, region, batch_size, compute_dtype, steps, mode,
            out, anomaly) -> None:
    """Write a TensorBoard/XPlane device profile of the hot loop.

    Runs ``--steps`` jitted steps on synthetic data under a
    ``jax.profiler`` trace (compile + one warm-up step happen OUTSIDE the
    trace so the profile shows steady state), then prints wall steps/s and
    per-device HBM stats. SURVEY §5 "tracing/profiling" — the reference
    has no profiler integration at all."""
    import contextlib
    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from downgan_tpu.training.state import create_state, make_models
    from downgan_tpu.utils import profiling

    if steps < 1:
        raise click.UsageError("--steps must be >= 1")
    config = _load_config(config_path, region, batch_size=batch_size,
                          compute_dtype=compute_dtype)
    gen, critic = make_models(config)
    rng_np = np.random.default_rng(0)
    bs = config.hp.batch_size
    coarse = jnp.asarray(rng_np.standard_normal(
        (bs, config.coarse_size, config.coarse_size, config.n_covariates)
    ).astype(np.float32))

    if mode == "infer":
        # Profile the generator exactly as served: stochastic configs
        # (noise_channels > 0) get the fixed eval realization appended,
        # the same input the serving/eval forward sees.
        from downgan_tpu.training.wgan import eval_noise_rng, make_noise_injector

        g_in = make_noise_injector(config)(eval_noise_rng(config), coarse)
        params = gen.init(jax.random.PRNGKey(0), g_in[:1])
        fwd = jax.jit(gen.apply)
        run_once = lambda: fwd(params, g_in)
        sync = lambda r: jax.device_get(r[0, 0, 0, 0])
    else:
        from downgan_tpu.training.wgan import (
            build_fused_round,
            build_train_step,
        )

        fused = config.hp.schedule == "fused"
        # Under the fused schedule one profiled "step" is a whole round:
        # critic_iterations critic updates on distinct minibatches + one
        # generator update, fed as a (n_critic, B, ...) stack.
        n_lead = config.hp.critic_iterations if fused else 1
        fine = jnp.asarray(rng_np.standard_normal(
            (n_lead * bs, config.fine_size, config.fine_size,
             config.n_predictands)
        ).astype(np.float32))
        if fused:
            coarse = jnp.concatenate(
                [coarse] + [jnp.asarray(rng_np.standard_normal(
                    coarse.shape).astype(np.float32))
                    for _ in range(n_lead - 1)]
            ).reshape(n_lead, bs, *coarse.shape[1:])
            fine = fine.reshape(n_lead, bs, *fine.shape[1:])
        state = create_state(config, jax.random.PRNGKey(0))
        builder = build_fused_round if fused else build_train_step
        step = jax.jit(builder(config, gen, critic, with_metrics=True))
        rng = jax.random.PRNGKey(1)

        def run_once():
            nonlocal state
            state, metrics = step(state, coarse, fine, rng)
            return metrics

        sync = lambda r: jax.device_get(r["critic_loss"])

    click.echo("compiling + warm-up step ...")
    sync(run_once())

    guard = profiling.detect_anomalies() if anomaly else contextlib.nullcontext()
    t0 = time.perf_counter()
    with profiling.trace(out), guard:
        with profiling.annotate(f"profiled_{mode}_window"):
            for _ in range(steps):
                r = run_once()
            sync(r)  # one scalar fetch; block_until_ready lies on the tunnel
    dt = time.perf_counter() - t0
    patches_per_step = bs * (config.hp.critic_iterations
                             if mode == "train"
                             and config.hp.schedule == "fused" else 1)
    click.echo(json.dumps({
        "mode": mode, "steps": steps, "batch": bs,
        "schedule": config.hp.schedule if mode == "train" else None,
        "steps_per_s": round(steps / dt, 2),
        "patches_per_s": round(steps * patches_per_step / dt, 1),
        "trace_dir": out,
        "hbm": profiling.device_memory_stats(),
    }))
    click.echo(f"view: tensorboard --logdir {out}")


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None,
              help="Base config the recommendation is merged into.")
@click.option("--batches", default="64,128,256",
              help="Comma-separated candidate batch sizes.")
@click.option("--dtypes", default="bfloat16",
              help="Comma-separated candidate compute dtypes.")
@click.option("--schedules", default="reference,fused",
              help="Comma-separated update schedules to sweep (reference = "
              "the parity num_steps%%5 step; fused = one compiled round of "
              "critic_iterations critic updates + 1 G update).")
@click.option("--grad-accums", default="1",
              help="Comma-separated hp.grad_accum candidates, crossed with "
              "the batch axis (each batch is split into that many scanned "
              "microbatches, one optimizer update — PERF.md: effective "
              "batch 1024 as 8x128 microbatches beat the monolithic b1024 "
              "by 6%% while peak activation memory stays at the microbatch "
              "footprint). Batches not divisible by a candidate are "
              "skipped for it.")
@click.option("--fast-paths/--no-fast-paths", default=True,
              help="After the (batch, dtype) sweep, also measure the "
              "metrics_reuse_fake and fused_critic_pass fast paths at the "
              "winning point (PERF.md: regime-dependent — reuse_fake +10-20% "
              "when compute-bound, fused_critic +9% when latency-bound).")
@click.option("--scan-steps", type=int, default=30)
@click.option("--reps", type=int, default=3)
@click.option("--timeout", "timeout_s", type=int, default=1500,
              help="Per-candidate wall timeout. A candidate whose HLO is "
              "not in the persistent compile cache can take ~10 min to "
              "compile on small hosts before any measurement happens.")
@click.option("--out", type=click.Path(), default=None,
              help="Write the recommended production config JSON here.")
@click.option("--sweep-out", type=click.Path(), default=None,
              help="Write the FULL sweep (every candidate's complete bench "
              "record incl. rep times and FLOP census) as JSON — the "
              "session-variance artifact to keep next to BENCH results.")
@click.option("--smoke", is_flag=True,
              help="Harness check on the CPU backend (tiny model/shapes).")
def tune(config_path, batches, dtypes, schedules, grad_accums, fast_paths,
         scan_steps, reps, timeout_s, out, sweep_out, smoke) -> None:
    """Find the production throughput point on THIS hardware.

    Sweeps candidate (batch, dtype) configurations through the benchmark
    harness (``downgan_tpu/bench.py`` — the exact code behind the
    headline number), one subprocess per candidate so each compiled
    variant measures in a clean process (the PERF.md measurement rule),
    then recommends the best and optionally writes it as a production
    config. Automates the by-hand knee search of PERF.md round 2; no
    reference equivalent (the reference has no benchmark at all,
    SURVEY §6).
    """
    import dataclasses
    import subprocess
    import sys

    import downgan_tpu

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(downgan_tpu.__file__)))
    base = _load_config(config_path, None)

    def measure(batch: int, dtype: str, schedule: str = "reference",
                grad_accum: int = 1, **toggles: bool) -> Optional[dict]:
        # Start from a BENCH_*-clean environment: a stray exported knob
        # (BENCH_MODE=infer, BENCH_FORCE_CPU=1, BENCH_MULTIHOST=1, ...)
        # would otherwise silently corrupt or crash the whole sweep.
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("BENCH_")}
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        env.update(
            BENCH_BATCH=str(batch), BENCH_DTYPE=dtype,
            BENCH_SCAN_STEPS=str(scan_steps), BENCH_REPS=str(reps),
            BENCH_SCHEDULE=schedule,
            BENCH_GRAD_ACCUM=str(grad_accum),
            BENCH_REUSE_FAKE="1" if toggles.get("reuse_fake") else "0",
            BENCH_FUSED_CRITIC="1" if toggles.get("fused_critic") else "0",
        )
        if config_path:
            # Measure the USER'S model (shape + remat/accum/augment flags),
            # not the default benchmark workload — the recommendation is
            # written into this config, so it must be measured on it.
            env["BENCH_CONFIG"] = os.path.abspath(config_path)
        if smoke:
            env.update(BENCH_SMOKE="1", BENCH_FORCE_CPU="1")
        label = (f"b{batch} {dtype} {schedule}"
                 + (f" accum{grad_accum}" if grad_accum > 1 else "")
                 + "".join(f" +{k}" for k, v in toggles.items() if v))
        click.echo(f"measuring {label} ...", err=True)
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "downgan_tpu.bench"], env=env,
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            click.echo(f"  {label}: TIMEOUT after {timeout_s}s", err=True)
            return None
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            click.echo(f"  {label}: FAILED\n{proc.stderr[-2000:]}", err=True)
            return None
        rec = json.loads(lines[-1])
        rec.update(batch=batch, dtype=dtype, schedule=schedule,
                   grad_accum=grad_accum, **toggles)
        click.echo(f"  {label}: {rec['value']} {rec['unit']}", err=True)
        return rec

    sched_list = [s.strip() for s in schedules.split(",") if s.strip()]
    accum_list = [int(x) for x in grad_accums.split(",") if x.strip()]
    batch_list = [int(x) for x in batches.split(",") if x.strip()]
    # Validate the (batch, grad_accum) grid once up front so a fully
    # skipped sweep reports the divisibility constraint, not phantom
    # bench failures (and the skip line prints once, not per
    # schedule x dtype).
    combos = []
    for b in batch_list:
        for ga in accum_list:
            if ga < 1 or b % ga:
                click.echo(f"  b{b} accum{ga}: skipped (batch must "
                           "divide into microbatches)", err=True)
            else:
                combos.append((b, ga))
    if not combos:
        raise click.ClickException(
            "no runnable (batch, grad-accum) combination: every batch in "
            f"--batches {batches!r} fails to divide by every value in "
            f"--grad-accums {grad_accums!r}")
    candidates = []
    for schedule in sched_list:
        for dtype in [d.strip() for d in dtypes.split(",") if d.strip()]:
            for b, ga in combos:
                rec = measure(b, dtype, schedule, grad_accum=ga)
                if rec is not None:
                    candidates.append(rec)
    if not candidates:
        raise click.ClickException("every candidate failed or timed out")

    best = max(candidates, key=lambda r: r["value"])
    if fast_paths:
        base_val = best["value"]
        singles = {}
        for toggle in ("reuse_fake", "fused_critic"):
            rec = measure(best["batch"], best["dtype"], best["schedule"],
                          grad_accum=best["grad_accum"], **{toggle: True})
            if rec is not None:
                candidates.append(rec)
                singles[toggle] = rec["value"]
        # Measure the COMBINATION when each toggle wins on its own —
        # otherwise the recommendation could never carry both even on
        # hardware where the wins compose.
        if all(singles.get(t, 0) > base_val
               for t in ("reuse_fake", "fused_critic")):
            rec = measure(best["batch"], best["dtype"], best["schedule"],
                          grad_accum=best["grad_accum"],
                          reuse_fake=True, fused_critic=True)
            if rec is not None:
                candidates.append(rec)
        best = max(candidates, key=lambda r: r["value"])

    recommended = base.replace(hp=dataclasses.replace(
        base.hp,
        batch_size=best["batch"],
        compute_dtype=best["dtype"],
        schedule=best["schedule"],
        grad_accum=best["grad_accum"],
        metrics_reuse_fake=bool(best.get("reuse_fake")),
        fused_critic_pass=bool(best.get("fused_critic")),
    ))
    report = {
        "best": {k: best[k] for k in
                 ("metric", "value", "unit", "batch", "dtype", "schedule",
                  "grad_accum", "aggregate_patches_per_sec", "n_chips")},
        "recommended_hp": {
            "batch_size": best["batch"],
            "compute_dtype": best["dtype"],
            "schedule": best["schedule"],
            "grad_accum": best["grad_accum"],
            "metrics_reuse_fake": bool(best.get("reuse_fake")),
            "fused_critic_pass": bool(best.get("fused_critic")),
        },
        "candidates": [
            {k: r[k] for k in ("metric", "value")} for r in
            sorted(candidates, key=lambda r: -r["value"])
        ],
    }
    click.echo(json.dumps(report))
    if sweep_out:
        # The session-variance artifact (PERF.md measurement rules): every
        # candidate's complete bench record — rep times, FLOP census, MFU —
        # so knee drift across sessions is visible in artifacts.
        with open(sweep_out, "w") as f:
            json.dump({"sweep": sorted(candidates, key=lambda r: -r["value"]),
                       "best": best["metric"]}, f, indent=1)
        click.echo(f"full sweep written to {sweep_out}", err=True)
    if out:
        with open(out, "w") as f:
            f.write(recommended.to_json())
        click.echo(f"recommended production config written to {out}", err=True)


if __name__ == "__main__":
    cli()
