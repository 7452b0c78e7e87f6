"""Training orchestration: the imperative shell around the jitted core.

Capability parity with the reference's epoch loop
(``DoWnGAN/GAN/wasserstein.py:120-189``) plus its observability tails
(``mlflow_tools/mlflow_epoch.py``, ``gen_grid_plots.py``), re-designed so
that Python owns only I/O and scheduling:

  * the whole epoch of critic/generator updates + per-batch metrics runs
    as ONE compiled program (``build_epoch_scan`` / ``build_dp_epoch_scan``),
    or as a per-step jitted loop when ``hp.fused_epoch`` is off;
  * per-epoch: train metric means -> tracker + CSV (parity with
    ``post_epoch_metric_mean``/``log_to_file``), grid images for train and
    test (``gen_grid_images``), a full test-set metric pass
    (``wasserstein.py:157-169``), and a FULL-train-state Orbax checkpoint
    (upgrade over the reference's weights-only ``log_network_models``);
  * resume restores params, both Adam states and the step counter.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from downgan_tpu.config.config import Config
from downgan_tpu.data.dataset import DeviceDataset
from downgan_tpu.data.feed import HostDataset, prefetch_batches
from downgan_tpu.training.state import GANTrainState, create_state, make_models
from downgan_tpu.training.wgan import (
    build_epoch_scan,
    build_eval_metrics,
    build_eval_scan,
    build_train_step,
    g_updates_in_window,
)
from downgan_tpu.utils.plots import gen_grid_images, grid_sample_indices


class NonFiniteLossError(RuntimeError):
    """Training diverged: an epoch's mean metrics contain NaN/Inf."""


def full_split_metric_pass(
    state: GANTrainState,
    ds,
    batch_size: int,
    rng: np.random.Generator,
    eval_fn,
    eval_scan=None,
    gather=None,
) -> Dict[str, float]:
    """Whole-split metric pass covering EVERY sample (single source of
    truth for the Trainer's per-epoch test pass AND the ``evaluate`` CLI).

    The reference's test DataLoader keeps the final partial batch
    (``GAN/stage.py:78-81``, torch default drop_last=False) and the epoch
    tail iterates it (``wasserstein.py:157-169``), averaging per-batch
    metric values over the number of batches. Parity: full batches run
    through the compiled ``eval_scan`` when given (else per-batch
    ``eval_fn``); a ragged tail is evaluated as its own (smaller,
    separately-compiled) batch — its own static shape, so MS-SSIM's
    batch-global normalization matches the reference's partial-batch
    semantics — and the mean weights each batch equally, exactly like
    ``post_epoch_metric_mean``.
    """
    if gather is None:
        gather = lambda d, idx: (
            jnp.take(d.coarse, jnp.asarray(idx), axis=0),
            jnp.take(d.fine, jnp.asarray(idx), axis=0))
    n = len(ds)
    perm = ds.epoch_perm(rng, batch_size, shuffle=False)
    sums: Dict[str, float] = {}
    n_batches = 0
    if len(perm) and eval_scan is not None:
        stacked = eval_scan(state, ds.coarse, ds.fine, perm)
        for k, v in stacked.items():
            sums[k] = float(jnp.sum(v))
        n_batches += len(perm)
    elif len(perm):
        for idx in perm:
            coarse, fine = gather(ds, idx)
            for k, v in eval_fn(state, coarse, fine).items():
                sums[k] = sums.get(k, 0.0) + float(v)
        n_batches += len(perm)
    tail = np.arange(len(perm) * batch_size, n)
    if tail.size:
        coarse, fine = gather(ds, tail)
        for k, v in eval_fn(state, coarse, fine).items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n_batches += 1
    return {k: v / max(n_batches, 1) for k, v in sums.items()}


class Trainer:
    """WGAN-GP trainer over device-resident or host-resident datasets.

    ``train``/``test`` are :class:`DeviceDataset` (HBM-resident, the fast
    path — the reference's whole-set-on-GPU residency, stage.py:28-31) or
    :class:`HostDataset` (host RAM, batches streamed through the
    double-buffered ``data.feed`` pipeline for regions that don't fit
    HBM — SURVEY §7 step 4; its subclass
    :class:`~downgan_tpu.data.stream.StreamDataset` reads batches lazily
    from disk for sets that don't fit host RAM either). The fused-epoch scan is device-resident-only
    (one compiled program gathers batches in HBM); host-fed training
    requires ``hp.fused_epoch=False`` and trains through the per-step
    jitted loop, bit-identical to the device-resident trajectory (tested).

    ``run`` is an optional :class:`downgan_tpu.tracking.Run`;
    ``checkpoint_manager`` an optional
    :class:`downgan_tpu.utils.checkpoint.CheckpointManager`; ``mesh`` an
    optional device mesh for data-parallel training.
    """

    def __init__(
        self,
        config: Config,
        train: DeviceDataset,
        test: Optional[DeviceDataset] = None,
        run=None,
        checkpoint_manager=None,
        mesh=None,
        save_every: Optional[int] = None,
        plot_every: int = 1,
        print_every: Optional[int] = None,
        tensorboard_dir: Optional[str] = None,
        verbose: bool = True,
        eof_components=None,
        halt_on_nonfinite: bool = True,
        multihost: Optional[bool] = None,
        track_best: Optional[str] = None,
        best_mode: Optional[str] = None,
        best_dir: Optional[str] = None,
        handle_preemption: bool = True,
    ):
        self.config = config
        # Preemption tolerance (SIGTERM -> checkpoint + clean stop at the
        # next epoch boundary); see _install_preemption_handler.
        self.handle_preemption = handle_preemption
        self.preempted = False
        self.train_ds = train
        self.test_ds = test
        self._host_fed = isinstance(train, HostDataset)
        # Multihost (pod) mode: one JAX process per host, coordinated via
        # jax.distributed (parallel.multihost.initialize); auto-detected
        # from the process count. The mesh must be the GLOBAL mesh
        # (multihost.global_mesh), datasets are either HostDataset (each
        # host feeds only its batch rows: process_batch_slice +
        # make_global_batch) or DeviceDataset.from_numpy_global (replicated
        # global arrays feeding the compiled DP epoch scan). Tracking/plots
        # write from process 0 only; Orbax checkpointing is collective
        # (every process calls save/restore).
        self.multihost = (jax.process_count() > 1) if multihost is None else multihost
        self._primary = jax.process_index() == 0
        if self.multihost:
            if mesh is None:
                raise ValueError(
                    "multihost training requires the global mesh: pass "
                    "mesh=parallel.multihost.global_mesh()"
                )
            if not self._host_fed and not config.hp.fused_epoch:
                raise ValueError(
                    "multihost per-step training feeds per-host batch rows "
                    "and needs a HostDataset (train --host-feed); "
                    "DeviceDataset multihost training runs the fused epoch "
                    "scan (hp.fused_epoch=True)"
                )
        if self._host_fed and config.hp.fused_epoch:
            raise ValueError(
                "HostDataset training needs hp.fused_epoch=False: the "
                "fused-epoch lax.scan gathers batches from HBM-resident "
                "arrays (device-resident-only by design); the per-step "
                "loop streams host batches through data.feed instead"
            )
        if self._host_fed and config.hp.schedule == "fused":
            raise ValueError(
                "HostDataset training supports schedule='reference' only "
                "(the fused n-critic round consumes stacked multi-batch "
                "inputs, which the host feed does not assemble)"
            )
        self.run = run
        self.ckpt = checkpoint_manager
        self.mesh = mesh
        # Cadence knobs default to the hyperparameters (hp.save_every /
        # hp.print_every, epoch units) so the config fully drives the run.
        self.save_every = config.hp.save_every if save_every is None else save_every
        self.print_every = config.hp.print_every if print_every is None else print_every
        if self.save_every < 1 or self.print_every < 1 or plot_every < 1:
            raise ValueError(
                "save_every/print_every/plot_every are epoch cadences and "
                "must be >= 1 (use a huge value to effectively disable)"
            )
        self.plot_every = plot_every
        self.verbose = verbose
        # Production guard (no reference equivalent — the reference trains
        # on through NaNs): halt with a clear error on the first epoch
        # whose mean metrics go non-finite, BEFORE checkpointing, so the
        # latest checkpoint on disk stays a good restore point.
        self.halt_on_nonfinite = halt_on_nonfinite

        # Best-checkpoint tracking (model selection — no reference
        # equivalent; the reference keeps every epoch and the user picks
        # one by eye): after each test pass, if the tracked test metric
        # improved, write the serving weights (EMA when hp.ema_decay > 0,
        # else live) as a servable bundle at ``best_dir`` plus a
        # ``best.json`` record. serve/generate/evaluate load it with just
        # ``--checkpoint <best_dir>``.
        self.track_best = track_best
        self.best_value: Optional[float] = None
        self.best_epoch: Optional[int] = None
        if track_best:
            if test is None:
                raise ValueError(
                    "track_best selects on a TEST metric and needs a test "
                    "dataset")
            # The test pass emits exactly the configured metric registry
            # (build_eval_metrics: registry keys + Wass only when listed),
            # so anything else would silently never match (_update_best
            # would see None every epoch and no bundle would be written).
            known = set(config.hp.metrics_to_calculate)
            if track_best not in known:
                raise ValueError(
                    f"track_best metric {track_best!r} is not produced by "
                    f"this run's test pass; available: {sorted(known)}")
            if best_mode is None:
                # MS-SSIM is a similarity (higher = better); every other
                # registry metric is an error/distance (lower = better).
                best_mode = "max" if track_best.upper().startswith("MSSSIM") else "min"
            if best_mode not in ("max", "min"):
                raise ValueError(f"best_mode must be 'max' or 'min', got {best_mode!r}")
            if best_dir is None and run is not None:
                best_dir = os.path.join(run.artifact_dir, "best")
            if best_dir is None and self._primary:
                # Non-primary pod processes track the value only (they
                # never write); the writing process must have a target.
                raise ValueError(
                    "track_best needs best_dir (or a tracked run whose "
                    "artifact dir provides the default <artifacts>/best)")
        self.best_mode = best_mode
        self.best_dir = best_dir

        if config.hp.eof_lambda and eof_components is None:
            # Fit the EOF basis from the training fine fields at staging
            # (the analogue of the reference's sklearn-PCA prep feeding
            # eof_loss, prep_gan.py:226-255 + losses.py:72-116).
            from downgan_tpu.data.eof import fit_eofs_per_channel

            eof_components = fit_eofs_per_channel(
                np.asarray(train.fine), config.hp.ncomp
            )
        self.eof_components = eof_components

        self.tb = None
        if tensorboard_dir is not None:
            from downgan_tpu.tracking.tensorboard import TensorBoardSink

            self.tb = TensorBoardSink(tensorboard_dir)

        self.gen, self.critic = make_models(config)
        self.epoch = 0
        # Host-side mirror of state.step (kept in sync per epoch, re-read
        # on resume): lets _run_train_epoch rescale the logged gen_loss
        # without a per-epoch device fetch.
        self._steps_done = 0

        if mesh is not None:
            from downgan_tpu.parallel.dp import build_dp_epoch_scan, build_dp_train_step
            from downgan_tpu.parallel.mesh import replicated

            # Build the replicated state ON the mesh (jit with replicated
            # out_shardings): a host-local state cannot be device_put onto
            # another process's devices, and the same seed yields the same
            # params in every process — the standard multihost recipe.
            self.state: GANTrainState = jax.jit(
                lambda: create_state(config, jax.random.PRNGKey(config.seed)),
                out_shardings=replicated(mesh),
            )()
            self._epoch_fn = build_dp_epoch_scan(
                config, self.gen, self.critic, mesh,
                eof_components=self.eof_components)
            self._step_fn = build_dp_train_step(
                config, self.gen, self.critic, mesh,
                eof_components=self.eof_components)
        else:
            from downgan_tpu.training.wgan import build_fused_round

            self.state = create_state(config, jax.random.PRNGKey(config.seed))
            step_builder = (
                build_fused_round if config.hp.schedule == "fused" else build_train_step
            )
            self._epoch_fn = jax.jit(
                build_epoch_scan(config, self.gen, self.critic,
                                 eof_components=self.eof_components),
                donate_argnums=(0,),
            )
            self._step_fn = jax.jit(
                step_builder(config, self.gen, self.critic,
                             eof_components=self.eof_components),
                donate_argnums=(0,),
            )
        self._eval_fn = jax.jit(build_eval_metrics(config, self.gen, self.critic))
        self._eval_scan = jax.jit(build_eval_scan(config, self.gen, self.critic))
        # Pair variants score live + EMA params in one program (used by
        # best-tracking under hp.ema_decay; jit is lazy, so these cost
        # nothing unless that path actually runs).
        from downgan_tpu.training.wgan import build_eval_metrics_pair

        self._eval_fn_pair = jax.jit(
            build_eval_metrics_pair(config, self.gen, self.critic))
        self._eval_scan_pair = jax.jit(
            build_eval_scan(config, self.gen, self.critic, pair=True))
        # Plot/grid forward; stochastic generators use the same fixed
        # noise realization as the eval pass (wgan.eval_noise_rng).
        from downgan_tpu.training.wgan import eval_noise_rng, make_noise_injector

        _inject = make_noise_injector(config)
        _fixed = eval_noise_rng(config)
        self._gen_fwd = jax.jit(
            lambda params, x: self.gen.apply(params, _inject(_fixed, x)))

    # -- resume --------------------------------------------------------
    def maybe_resume(self) -> bool:
        """Restore the latest checkpoint if one exists. Returns True if
        training resumed (an upgrade over the reference — SURVEY §5)."""
        if self.ckpt is None or self.ckpt.latest_step() is None:
            return False
        self.state = self.ckpt.restore(self.state)
        # Checkpoints are written AFTER an epoch completes, so training
        # continues at the next one.
        self.epoch = int(self.ckpt.latest_step()) + 1
        self._steps_done = int(self.state.step)
        # Best-checkpoint tracking state lives in best.json, not the train
        # state — restore it too, or the first post-resume test pass would
        # always count as an "improvement" and overwrite the best bundle
        # with possibly worse weights.
        if self.track_best and self.best_dir:
            best_json = os.path.join(self.best_dir, "best.json")
            if os.path.exists(best_json):
                with open(best_json) as f:
                    rec = json.load(f)
                # Ignore a record tracking a different metric/direction
                # (the user changed --track-best between runs).
                if (rec.get("metric") == self.track_best
                        and rec.get("mode") == self.best_mode):
                    self.best_value = float(rec["value"])
                    self.best_epoch = int(rec.get("epoch", -1))
        if self.verbose and self._primary:
            print(f"resumed from checkpoint of epoch {self.epoch - 1}; "
                  f"continuing at epoch {self.epoch}")
        return True

    def warm_start(self, g_params, c_params=None) -> None:
        """Start training from pretrained weights — e.g. a servable bundle
        or a ported reference torch checkpoint (``downgan import-torch``):
        replaces the fresh state's generator (and optionally critic)
        params and resets the EMA trace to the loaded weights. Optimizer
        states and the step counter stay at zero (Adam moments from a
        different framework/run are not transferable), so schedules and
        the n_critic cadence begin fresh. Call before training (and after
        ``maybe_resume`` — a successful resume supersedes warm start)."""

        def _place(new_tree, old_tree):
            # Match each loaded leaf to the fresh state's dtype and
            # placement; tree.map fails loudly on a structure mismatch.
            def leaf(n, o):
                x = jnp.asarray(n, o.dtype)
                if x.shape != o.shape:
                    raise ValueError(
                        f"warm-start param shape {x.shape} != model "
                        f"{o.shape} — the bundle was built for a "
                        "different architecture")
                if self.multihost:
                    from jax.experimental import multihost_utils
                    from jax.sharding import PartitionSpec

                    return multihost_utils.host_local_array_to_global_array(
                        np.asarray(x), self.mesh, PartitionSpec())
                if self.mesh is not None:
                    return jax.device_put(x, o.sharding)
                return x

            return jax.tree.map(leaf, new_tree, old_tree)

        g = _place(g_params, self.state.g_params)
        updates = dict(g_params=g)
        if self.state.g_ema is not None:
            # Distinct buffers, not an alias: the step fns donate the
            # state (donate_argnums), and donating the same buffer as
            # both g_params and g_ema is an XLA error. create_state
            # copies for the same reason (state.py).
            updates["g_ema"] = jax.tree.map(jnp.copy, g)
        if c_params is not None:
            updates["c_params"] = _place(c_params, self.state.c_params)
        self.state = self.state.replace(**updates)
        if self.verbose and self._primary:
            what = "generator+critic" if c_params is not None else "generator"
            print(f"warm start: {what} params loaded; optimizer state and "
                  "step counter start fresh", flush=True)

    # -- epoch internals ----------------------------------------------
    def _epoch_rng(self) -> np.random.Generator:
        """Permutations are a pure function of (seed, epoch): training is
        bit-deterministic, and resume reproduces the exact trajectory the
        uninterrupted run would have taken (tested)."""
        return np.random.default_rng((self.config.seed, self.epoch))

    def _gather(self, ds, idx: np.ndarray):
        """Fetch one batch from either residency: numpy fancy-indexing for
        HostDataset (only the batch moves to device, via the jitted
        consumer), on-device gather for DeviceDataset. In multihost mode a
        DeviceDataset is a replicated GLOBAL array — eager ops on it are
        not process-local, so index the host copy retained at staging
        (``host_coarse``/``host_fine``); the jitted consumers treat the
        numpy batch as replicated.
        """
        sel = np.asarray(idx)
        if isinstance(ds, HostDataset):
            return ds.coarse[sel], ds.fine[sel]
        if self.multihost:
            if ds.host_coarse is not None:
                return ds.host_coarse[sel], ds.host_fine[sel]
            # Fallback for a caller-built global dataset without host
            # copies: one full fetch, cached — never per-gather.
            if not hasattr(ds, "_host_cache"):
                object.__setattr__(
                    ds, "_host_cache",
                    (np.asarray(ds.coarse), np.asarray(ds.fine)))
            hc, hf = ds._host_cache
            return hc[sel], hf[sel]
        s = jnp.asarray(sel)
        return jnp.take(ds.coarse, s, axis=0), jnp.take(ds.fine, s, axis=0)

    def _step_loop(self, batches, rng: jax.Array):
        """Per-step jitted loop over ``(coarse, fine)`` batches — the one
        accumulation path shared by the host-fed, pod host-fed, and
        per-step device branches. Returns ``(n_steps, epoch-mean dict)``."""
        sums: Dict[str, float] = {}
        n = 0
        for coarse, fine in batches:
            self.state, metrics = self._step_fn(self.state, coarse, fine, rng)
            n += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return n, {k: v / max(n, 1) for k, v in sums.items()}

    def _finish_epoch_means(self, n_iters: int,
                            means: Dict[str, float]) -> Dict[str, float]:
        """``gen_loss`` is our own addition to the reference's logged
        registry (the reference logs only the metric pass,
        ``wasserstein.py:137-146``); on the reference schedule the
        compiled step emits an exact 0.0 on the steps that skip the G
        update (``wgan.py g_skip``), so the raw per-step mean is diluted
        ~1/critic_iterations and not comparable with the fused schedule's
        per-round values. The zeros add nothing to the sum, so rescaling
        by n_iters / n_updates yields exactly the mean over the G updates
        actually performed. Also advances the host-side step mirror
        (``n_iters`` is steps on the reference schedule, rounds on the
        fused one — which moves state.step by critic_iterations each)."""
        hp = self.config.hp
        if hp.schedule != "reference":
            self._steps_done += n_iters * hp.critic_iterations
            return means
        if "gen_loss" in means and n_iters:
            n_upd = g_updates_in_window(
                self._steps_done, n_iters, hp.critic_iterations)
            if n_upd > 0:
                means = dict(means)
                means["gen_loss"] = means["gen_loss"] * (n_iters / n_upd)
        self._steps_done += n_iters
        return means

    def _run_train_epoch(self, rng: jax.Array) -> Dict[str, float]:
        hp = self.config.hp
        bs = hp.batch_size
        perm_np = self.train_ds.epoch_perm(self._epoch_rng(), bs)
        if self._host_fed and self.multihost:
            # Pod data path: the permutation is a pure function of
            # (seed, epoch) so every process draws the SAME global batch
            # order; each host materializes only its rows
            # (process_batch_slice) and the global batch is assembled
            # device-side (make_global_batch) — per-host data loading,
            # same double-buffered feed as the single-host branch (each
            # host reads only perm[:, lo:hi] on the reader thread).
            from downgan_tpu.parallel.multihost import (
                make_global_batch,
                process_batch_slice,
            )

            lo, hi = process_batch_slice(bs)
            n, means = self._step_loop(prefetch_batches(
                self.train_ds, perm_np[:, lo:hi],
                put_fn=lambda c, f: (make_global_batch(self.mesh, c),
                                     make_global_batch(self.mesh, f))), rng)
            return self._finish_epoch_means(n, means)
        if self._host_fed:
            # SURVEY §7 step 4: double-buffered host->HBM feed; the next
            # batch's transfer overlaps the current step's compute.
            sharding = None
            if self.mesh is not None:
                from downgan_tpu.parallel.mesh import batch_sharding

                sharding = batch_sharding(self.mesh)
            n, means = self._step_loop(
                prefetch_batches(self.train_ds, perm_np, sharding=sharding),
                rng)
            return self._finish_epoch_means(n, means)
        if hp.schedule == "fused":
            n = hp.critic_iterations
            rounds = perm_np.shape[0] // n
            if rounds == 0:
                raise ValueError(
                    f"dataset too small: {perm_np.shape[0]} steps/epoch < "
                    f"critic_iterations={n} needed per fused round"
                )
            perm_np = perm_np[: rounds * n].reshape(rounds, n, bs)
        # numpy perm: uncommitted inputs are valid replicated args in both
        # single- and multi-process jit (a committed local-device array
        # could not be respread over a global mesh).
        if self.config.hp.fused_epoch:
            self.state, stacked = self._epoch_fn(
                self.state, self.train_ds.coarse, self.train_ds.fine, perm_np, rng
            )
            means = {k: float(jnp.mean(v)) for k, v in stacked.items()}
            return self._finish_epoch_means(len(perm_np), means)
        n, means = self._step_loop(
            (self._gather(self.train_ds, idx) for idx in perm_np), rng)
        return self._finish_epoch_means(n, means)

    def _run_test_pass(self, state: Optional[GANTrainState] = None,
                       pair: bool = False) -> Dict[str, float]:
        """Full test-set metric pass covering EVERY held-out sample
        (:func:`full_split_metric_pass` — shared with the evaluate CLI).

        ``pair=True`` scores live AND EMA generator params in the same
        compiled pass (``<name>__ema`` keys) — one set of batch gathers and
        one dispatch instead of two full passes when best-tracking under
        ``hp.ema_decay``."""
        assert self.test_ds is not None
        scan_ok = (self.config.hp.fused_epoch
                   and not isinstance(self.test_ds, HostDataset))
        eval_fn = self._eval_fn_pair if pair else self._eval_fn
        eval_scan = self._eval_scan_pair if pair else self._eval_scan
        return full_split_metric_pass(
            self.state if state is None else state,
            self.test_ds, self.config.hp.batch_size,
            self._epoch_rng(), eval_fn,
            eval_scan=eval_scan if scan_ok else None,
            gather=self._gather)

    def _update_best(self, test_means: Dict[str, float],
                     ema_means: Optional[Dict[str, float]] = None) -> None:
        """Best-checkpoint tracking: on improvement of the tracked test
        metric, write the serving weights as a bundle + best.json.

        The bundle holds the SERVING weights (EMA when ``hp.ema_decay`` is
        on), so the selection metric must be measured on those same
        weights — with EMA on, selection uses the EMA generator's metrics
        (``ema_means`` when the caller already scored both param sets in
        one pair pass, else a dedicated EMA test pass here; the logged
        test metrics stay the live-params parity pass), and best.json's
        value refers to the weights it sits next to. Early in training the
        EMA trails the live params, so selecting on live metrics would
        routinely save an EMA bundle that was never the best."""
        use_ema = self.state.g_ema is not None
        if use_ema:
            test_means = (ema_means if ema_means is not None
                          else self._run_test_pass(
                              self.state.replace(g_params=self.state.g_ema)))
            if (self.run is not None and self._primary
                    and self.track_best in test_means):
                self.run.log_metrics(
                    {f"{self.track_best}_ema_test":
                     float(test_means[self.track_best])}, step=self.epoch)
        val = test_means.get(self.track_best)
        if val is None or not np.isfinite(val):
            return
        better = self.best_value is None or (
            val > self.best_value if self.best_mode == "max" else val < self.best_value
        )
        if not better:
            return
        self.best_value = float(val)
        self.best_epoch = self.epoch
        if not self._primary:
            return
        from downgan_tpu.inference import write_generator_bundle

        use_ema = self.state.g_ema is not None
        params = self.state.g_ema if use_ema else self.state.g_params
        # Host copy first: replicated arrays are fully addressable on
        # every process, so process 0 can save alone without a collective.
        host_params = jax.tree.map(np.asarray, params)
        write_generator_bundle(self.best_dir, self.config, host_params)
        with open(os.path.join(self.best_dir, "best.json"), "w") as f:
            json.dump({
                "metric": self.track_best,
                "mode": self.best_mode,
                "value": self.best_value,
                "epoch": self.epoch,
                "ema": use_ema,
            }, f, indent=2)
        if self.run is not None:
            self.run.log_metrics(
                {f"best_{self.track_best}_test": self.best_value}, step=self.epoch)

    def _log_epoch(self, split: str, means: Dict[str, float]) -> None:
        tagged = {f"{k}_{split}": v for k, v in means.items()}
        if self.tb is not None:
            self.tb.log_metrics(tagged, step=self.epoch)
        if self.run is None:
            return
        self.run.log_metrics(tagged, step=self.epoch)
        self.run.append_csv_row(
            f"{split}_metrics.csv", {"epoch": self.epoch, **means}
        )

    def _plot_split(self, split: str, ds) -> None:
        if self.run is None:
            return
        # Fixed-seed random-20 selection with replacement + fake regenerated
        # only for the chosen samples (parity with gen_grid_plots.py:17-19).
        idx = grid_sample_indices(len(ds), n_samples=20)
        coarse_sel, fine_sel = self._gather(ds, idx)
        real = np.asarray(fine_sel)
        fake = np.asarray(self._gen_fwd(self.state.g_params, coarse_sel))
        gen_grid_images(
            self.run.artifact_dir, np.asarray(coarse_sel), fake, real,
            self.epoch, split, select=False,
        )

    def _install_preemption_handler(self):
        """SIGTERM -> graceful stop at the next epoch boundary.

        TPU pods are preempted with SIGTERM (maintenance events, spot
        reclaims, k8s evictions); the default action would kill the
        process mid-epoch and lose everything since the last checkpoint
        cadence. The handler only sets a flag (async-signal-safe); the
        epoch loop finishes the in-flight compiled epoch — a dispatched
        scan cannot be interrupted anyway — then checkpoints the FULL
        train state and returns cleanly, so ``--resume`` continues the
        exact trajectory (tested bit-identical). Returns
        ``(installed, previous_handler)`` — ``installed`` is False when
        no handler could be set (non-main thread, or handling disabled);
        ``previous_handler`` may be None even when installed (a handler
        set by non-Python code is unretrievable). The reference has no
        preemption story at all (a kill loses the run: SURVEY §5,
        no-resume)."""
        import signal
        import threading

        if not self.handle_preemption:
            return False, None
        if threading.current_thread() is not threading.main_thread():
            return False, None

        def _on_term(signum, frame):
            self.preempted = True

        try:
            return True, signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # embedded interpreter corner
            return False, None

    def _should_stop(self) -> bool:
        """Epoch-boundary stop check. In multihost mode the decision is
        collective (any process preempted -> all stop at the SAME epoch),
        so the final checkpoint save — itself a collective over the
        global arrays — cannot desync when SIGTERM lands at slightly
        different times on different hosts. With ``handle_preemption``
        off no handler can ever set the flag, so the per-epoch
        cross-host collective is skipped entirely."""
        if not self.handle_preemption:
            return False
        flag = bool(self.preempted)
        if self.multihost:
            from jax.experimental import multihost_utils

            flag = bool(np.any(multihost_utils.process_allgather(
                np.asarray([flag]))))
            self.preempted = flag
        return flag

    # -- main loop -----------------------------------------------------
    def train(self, epochs: Optional[int] = None) -> GANTrainState:
        epochs = self.config.hp.epochs if epochs is None else epochs
        base_rng = jax.random.PRNGKey(self.config.seed + 1)
        installed, prev_handler = self._install_preemption_handler()
        try:
            self._train_loop(epochs, base_rng)
            # Save while our SIGTERM handler is still installed: a
            # repeated preemption signal during the (possibly long)
            # final save must keep setting the flag, not take the
            # default action and kill the process mid-checkpoint.
            # self.epoch > 0 guards the degenerate epochs=0 run (no
            # epoch ran — saving would write a bogus step-(-1)
            # checkpoint of the untrained state that a later resume
            # would pick up).
            if self.ckpt is not None and self.epoch > 0:
                self.ckpt.save(self.epoch - 1, self.state)
                self.ckpt.wait()
        finally:
            if installed:
                import signal

                # signal.signal returned None if the previous handler
                # was installed by non-Python code — unrestorable from
                # here; fall back to SIG_DFL so SIGTERM terminates the
                # process again instead of silently setting a finished
                # Trainer's flag forever.
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
        return self.state

    def _train_loop(self, epochs: int, base_rng: jax.Array) -> None:
        while self.epoch < epochs:
            t0 = time.perf_counter()
            rng = jax.random.fold_in(base_rng, self.epoch)
            if self.multihost:
                # uncommitted (numpy) key: valid as a replicated arg over
                # the global mesh; identical on every process by seed.
                rng = np.asarray(rng)
            train_means = self._run_train_epoch(rng)
            self._log_epoch("train", train_means)
            if self.halt_on_nonfinite:
                bad = {k: v for k, v in train_means.items() if not np.isfinite(v)}
                if bad:
                    raise NonFiniteLossError(
                        f"non-finite training metrics at epoch {self.epoch}: "
                        f"{sorted(bad)} — state not checkpointed; restore the "
                        f"last checkpoint and lower lr / inspect data "
                        f"(set halt_on_nonfinite=False to train through)"
                    )

            # Preemption check directly after the compiled train epoch
            # (collective in multihost mode, so every process skips or
            # runs the SAME collective test pass below): under a ~30 s
            # preemption grace window, the test-set metric pass, plots,
            # and best-bundle export would eat the time the final
            # checkpoint needs.
            stopping = self._should_stop()

            if not stopping:
                if self.epoch % self.plot_every == 0:
                    self._plot_split("train", self.train_ds)

                if self.test_ds is not None and len(self.test_ds) > 0:
                    score_ema = bool(self.track_best) and self.state.g_ema is not None
                    means = self._run_test_pass(pair=score_ema)
                    test_means = {k: v for k, v in means.items()
                                  if not k.endswith("__ema")}
                    self._log_epoch("test", test_means)
                    if self.track_best:
                        ema_means = ({k[: -len("__ema")]: v
                                      for k, v in means.items()
                                      if k.endswith("__ema")}
                                     if score_ema else None)
                        self._update_best(test_means, ema_means=ema_means)
                    if self.epoch % self.plot_every == 0:
                        self._plot_split("test", self.test_ds)

            if self.ckpt is not None and self.epoch % self.save_every == 0:
                self.ckpt.save(self.epoch, self.state)

            if self.verbose and self._primary and self.epoch % self.print_every == 0:
                dt = time.perf_counter() - t0
                msg = ", ".join(f"{k}={v:.4g}" for k, v in sorted(train_means.items()))
                print(f"epoch {self.epoch} [{dt:.1f}s] {msg}", flush=True)
            self.epoch += 1
            # Re-check at the loop bottom so a SIGTERM that lands DURING
            # the test pass / plots / save stops now rather than after one
            # more full compiled train epoch. Collective-consistent: when
            # `stopping` is already True it is True on every process (the
            # first check was collective) and the short-circuit skips the
            # second collective everywhere; when False everywhere, every
            # process runs the second collective check at this same point.
            if stopping or self._should_stop():
                if self.verbose and self._primary:
                    tail = ("full state checkpointed — resume continues "
                            "the exact trajectory" if self.ckpt is not None
                            else "no checkpoint manager configured — "
                            "state NOT saved")
                    print(f"preempted (SIGTERM): stopping after epoch "
                          f"{self.epoch - 1}; {tail}", flush=True)
                break
