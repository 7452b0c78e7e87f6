"""Measure the ACTUAL reference (nannau/DoWnGAN) train step with CPU torch.

This is the measured anchor behind BASELINE.md's derived A100 baseline
(see BASELINE.md "Derived A100 reference throughput"). It imports the
reference networks read-only from /root/reference and executes the exact
per-batch work of the reference hot loop:

  * one critic update per step — G fwd, C fwd on real+fake, gradient
    penalty with ``create_graph=True`` double backward, Adam step
    (``DoWnGAN/GAN/wasserstein.py:27-55,87-117``). Reference quirks kept
    exactly: the critic-update fake is NOT detached, so
    ``critic_loss.backward`` also backprops through G (~2 extra G-fwd
    equivalents of executed work per step, wasserstein.py:35-52); the GP
    interpolation uses ``fine.data``/``fake.data`` (detached,
    wasserstein.py:92), so the GP path does NOT reach G.
  * the scheduled generator update on every ``critic_iterations``-th step
    (``wasserstein.py:135-136``) — EXECUTED on that schedule: the timed
    unit is a full 5-step cycle (1 G update) divided by 5, so the
    measured time and the analytic census describe the same loop.
  * the per-batch metric pass — fresh detached G fwd, 2 C fwds, MAE/MSE/
    Wass (``mlflow_tools/mlflow_epoch.py:53-63``). MS-SSIM is skipped
    (pytorch_msssim is not installed here), which UNDERSTATES reference
    cost — the measured number is a lower bound on reference step time.

It also measures this CPU's sustained dense-matmul GFLOP/s and counts the
step's analytic conv/linear FLOPs via module hooks, so the achieved
utilization of the reference implementation is measured, not assumed.

Outputs one JSON line. Knobs: REF_BATCH (default 16; FLOPs and the
reported per-patch cost scale linearly, verified), REF_REPS (default 3),
REF_ANOMALY (default 0; the reference ships with
``torch.autograd.set_detect_anomaly(True)`` at module scope,
``wasserstein.py:13`` — set 1 to measure as-shipped).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def count_fwd_flops(module: torch.nn.Module, *inputs: torch.Tensor) -> int:
    """Analytic multiply-add*2 FLOPs of one forward pass, via hooks."""
    flops = [0]
    hooks = []

    def conv_hook(mod, inp, out):
        k = mod.kernel_size[0] * mod.kernel_size[1]
        flops[0] += 2 * k * mod.in_channels * mod.out_channels * out.shape[-1] * out.shape[-2] * out.shape[0] // mod.groups

    def linear_hook(mod, inp, out):
        flops[0] += 2 * mod.in_features * mod.out_features * out.shape[0]

    for m in module.modules():
        if isinstance(m, torch.nn.Conv2d):
            hooks.append(m.register_forward_hook(conv_hook))
        elif isinstance(m, torch.nn.Linear):
            hooks.append(m.register_forward_hook(linear_hook))
    with torch.no_grad():
        module(*inputs)
    for h in hooks:
        h.remove()
    return flops[0]


def cpu_matmul_gflops(n: int = 1024, reps: int = 5) -> float:
    """Sustained single-core fp32 dense matmul GFLOP/s on this host."""
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    torch.mm(a, b)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        torch.mm(a, b)
        best = min(best, time.perf_counter() - t0)
    return 2 * n**3 / best / 1e9


def reference_step(G, C, g_opt, c_opt, coarse, fine, step_index,
                   gp_lambda=10.0, gamma=0.01, content_lambda=5.0,
                   critic_iterations=5):
    """One reference train step at ``step_index`` (semantics of
    wasserstein.py:27-117, 131-146 + mlflow_epoch.py:53-63, written fresh
    from the spec): critic update + metric pass every step, G update only
    when ``step_index % critic_iterations == 0`` (incl. step 0)."""
    batch = fine.shape[0]

    # --- critic update (wasserstein.py:27-55) ---
    c_opt.zero_grad()
    # Reference quirk kept: fake is NOT detached, so the critic backward
    # below also backprops through G (wasted work the reference executes;
    # G's grads are zeroed before its own update uses them).
    fake = G(coarse)
    c_real = C(fine)
    c_fake = C(fake)
    # gradient penalty (wasserstein.py:87-117): note the reference applies
    # gp_lambda both inside _gp and at the call site -> lambda_eff = 100.
    # The interpolation uses .data (detached) like the reference, so the
    # GP double backward does NOT reach G.
    alpha = torch.rand(batch, 1, 1, 1)
    interp = (alpha * fine.data + (1 - alpha) * fake.data).requires_grad_(True)
    c_interp = C(interp)
    grads = torch.autograd.grad(
        outputs=c_interp, inputs=interp,
        grad_outputs=torch.ones_like(c_interp),
        create_graph=True, retain_graph=True,
    )[0].view(batch, -1)
    gp = gp_lambda * ((grads.norm(2, dim=1) - 1) ** 2).mean()
    c_loss = c_fake.mean() - c_real.mean() + gp_lambda * gp
    c_loss.backward(retain_graph=True)
    c_opt.step()

    # --- scheduled generator update (wasserstein.py:58-83,135-136) ---
    g_loss = 0.0
    if step_index % critic_iterations == 0:
        g_opt.zero_grad()
        fake = G(coarse)
        g_loss = -C(fake).mean() * gamma + content_lambda * torch.nn.functional.l1_loss(fake, fine)
        g_loss.backward()
        g_opt.step()

    # --- per-batch metric pass (mlflow_epoch.py:53-63), detached ---
    with torch.no_grad():
        mfake = G(coarse)
        m_real = C(fine).mean()
        m_fake = C(mfake).mean()
        mae = (mfake - fine).abs().mean()
        mse = ((mfake - fine) ** 2).mean()
        wass = m_real - m_fake
    return float(c_loss), float(g_loss), float(mae), float(mse), float(wass)


def reference_cycle(G, C, g_opt, c_opt, coarse, fine,
                    critic_iterations=5) -> None:
    """One full n_critic cycle (5 steps, exactly 1 scheduled G update) —
    the timed unit; per-step cost = cycle time / critic_iterations."""
    for i in range(critic_iterations):
        reference_step(G, C, g_opt, c_opt, coarse, fine, i,
                       critic_iterations=critic_iterations)


def main() -> None:
    from DoWnGAN.networks.critic import Critic
    from DoWnGAN.networks.generator import Generator

    batch = int(os.environ.get("REF_BATCH", "16"))
    reps = int(os.environ.get("REF_REPS", "3"))
    # The reference's n-critic schedule (stage.py hyperparams); every
    # cycle->per-step conversion below derives from this one constant.
    critic_iterations = int(os.environ.get("REF_CRITIC_ITERATIONS", "5"))
    if os.environ.get("REF_ANOMALY", "0") == "1":
        torch.autograd.set_detect_anomaly(True)  # as shipped: wasserstein.py:13

    torch.manual_seed(0)
    G = Generator(16, 128, 7, 2)          # stage.py:60 florida config
    C = Critic(16, 128, 2)                # stage.py:59
    g_opt = torch.optim.Adam(G.parameters(), lr=2.5e-4, betas=(0.9, 0.99))
    c_opt = torch.optim.Adam(C.parameters(), lr=2.5e-4, betas=(0.9, 0.99))

    rng = np.random.default_rng(0)
    coarse = torch.from_numpy(rng.standard_normal((batch, 7, 16, 16)).astype(np.float32))
    fine = torch.from_numpy(rng.standard_normal((batch, 2, 128, 128)).astype(np.float32))

    g_fwd_flops = count_fwd_flops(G, coarse)
    c_fwd_flops = count_fwd_flops(C, fine)
    # Per-step analytic FLOPs of the EXECUTED loop (fwd:bwd = 1:2 for
    # weight+input grads; the GP double backward adds ~2x a critic
    # backward on top of its forward):
    #   critic update: G fwd + 2 C fwd + C fwd(interp) + GP double bwd
    #                  (~2x C bwd = 4x C fwd) + C bwd (2x C fwd)
    #                  + G bwd (2x G fwd) — the reference does not detach
    #                  the critic-update fake, so critic_loss.backward
    #                  backprops through G every step (wasserstein.py:35-52)
    #   G update (executed 1-in-critic_iterations): G fwd + C fwd + G bwd (2x)
    #                  + C bwd-through (2x)
    #   metric pass: G fwd + 2 C fwd
    step_flops = (
        3 * g_fwd_flops + 9 * c_fwd_flops                 # critic upd
        + (3 * g_fwd_flops + 3 * c_fwd_flops) / critic_iterations  # sched G upd
        + g_fwd_flops + 2 * c_fwd_flops                   # metric pass
    )

    # Dispatched-op count per step (batch-independent): every aten op
    # in eager mode is >=1 CUDA kernel launch on a GPU, so this measures
    # the step's kernel-granularity floor for the A100 derivation.
    # Counted over one full critic_iterations-step cycle, matching the timed unit.
    n_ops = 0
    if os.environ.get("REF_COUNT_OPS", "0") == "1":
        from torch.profiler import ProfilerActivity, profile

        with profile(activities=[ProfilerActivity.CPU]) as prof:
            reference_cycle(G, C, g_opt, c_opt, coarse, fine,
                            critic_iterations=critic_iterations)
        # top-level aten dispatches only (nested expansions like
        # convolution -> _convolution -> mkldnn_convolution collapse to
        # one GPU kernel launch each)
        n_ops = round(sum(1 for e in prof.events()
                          if e.name.startswith("aten::")
                          and e.cpu_parent is None) / critic_iterations)

    reference_cycle(G, C, g_opt, c_opt, coarse, fine,
                    critic_iterations=critic_iterations)  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        reference_cycle(G, C, g_opt, c_opt, coarse, fine,
                        critic_iterations=critic_iterations)
        times.append(time.perf_counter() - t0)
    median = sorted(times)[len(times) // 2] / critic_iterations  # cycle -> per-step

    peak = cpu_matmul_gflops()
    achieved = step_flops / median / 1e9
    print(json.dumps({
        "metric": f"reference_cpu_step_seconds_b{batch}",
        "value": round(median, 3),
        "unit": "s/step",
        "batch": batch,
        "steps_per_sec": round(1.0 / median, 4),
        "patches_per_sec": round(batch / median, 2),
        "g_fwd_gflops": round(g_fwd_flops / 1e9, 3),
        "c_fwd_gflops": round(c_fwd_flops / 1e9, 3),
        "step_gflops": round(step_flops / 1e9, 2),
        "cpu_peak_matmul_gflops": round(peak, 1),
        "achieved_gflops": round(achieved, 1),
        "utilization_vs_matmul_peak": round(achieved / peak, 3),
        "anomaly_mode": os.environ.get("REF_ANOMALY", "0") == "1",
        "msssim_included": False,
        "dispatched_ops_per_step": n_ops,
    }))


if __name__ == "__main__":
    main()
