"""FLOP census (utils/flops.py) — the self-auditing perf accounting.

XLA's compiled cost analysis counts scan bodies once, so the bench
derives totals from lowered loop-free pieces x schedule multiplicities.
These tests pin the properties that make that receipt trustworthy:
piece costs are real (positive, batch-scaling), the schedule
multiplicities are exact, and the fused round costs what its
decomposition says.
"""
from __future__ import annotations

import jax
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.training.state import create_state, make_models
from downgan_tpu.utils.flops import train_flop_census


def _census(schedule: str, batch: int = 8, scan_steps: int = 10, **hp_kw):
    config = Config(
        coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
        hp=HyperParams(batch_size=batch, schedule=schedule,
                       metrics_to_calculate=("MAE", "MSE", "Wass"), **hp_kw),
    )
    gen, critic = make_models(config)
    state = jax.eval_shape(lambda: create_state(config, jax.random.PRNGKey(0)))
    return train_flop_census(config, gen, critic, state, scan_steps)


def test_census_pieces_positive_and_batch_scaling():
    c8 = _census("reference", batch=8)
    c16 = _census("reference", batch=16)
    for name, v in c8["pieces"].items():
        assert v > 0, name
    # doubling the batch ~doubles every conv/linear pass
    assert c16["flops_per_step"] == pytest.approx(
        2 * c8["flops_per_step"], rel=0.10)


def test_census_reference_schedule_multiplicity():
    """Over K steps from step 0: K critic updates + K metric passes +
    ceil(K/n_critic) generator updates (wasserstein.py:136 semantics)."""
    c = _census("reference", scan_steps=10)  # n_critic=5 -> 2 G updates
    p = c["pieces"]
    expected = 10 * (p["fake_gen"] + p["critic_vag_microbatch"]) + \
        10 * (p["fake_gen"] + p["metrics"]) + 2 * p["gen_vag_microbatch"]
    assert c["total_flops"] == pytest.approx(expected, rel=1e-6)

    # metrics_reuse_fake drops the extra per-step G forward
    c2 = _census("reference", scan_steps=10, metrics_reuse_fake=True)
    assert c2["total_flops"] == pytest.approx(
        c["total_flops"] - 10 * p["fake_gen"], rel=1e-6)


def test_census_fused_round_is_n_critic_steps_of_critic_work():
    ref = _census("reference", scan_steps=10)
    fused = _census("fused", scan_steps=10)
    p = fused["pieces"]
    per_round = 5 * (p["fake_gen"] + p["critic_vag_microbatch"]) + \
        p["gen_vag_microbatch"] + p["fake_gen"] + p["metrics"]
    assert fused["flops_per_step"] == pytest.approx(per_round, rel=1e-6)
    # a round does ~n_critic times the critic work of one reference step
    assert fused["flops_per_step"] > 2 * ref["flops_per_step"]


def test_census_grad_accum_splits_microbatches():
    """grad_accum=k lowers value_and_grad at B/k and multiplies by k —
    the census total stays ~equal to the single-shot batch (same math,
    different peak memory)."""
    c1 = _census("reference", batch=8)
    c2 = _census("reference", batch=8, grad_accum=2)
    assert c2["flops_per_step"] == pytest.approx(
        c1["flops_per_step"], rel=0.10)
