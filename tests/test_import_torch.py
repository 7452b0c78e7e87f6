"""The torch-checkpoint migration path: `downgan import-torch` (reference
PyTorch DoWnGAN weights -> servable bundle) and `train --warm-start`.

Architecture inference is tested torch-free on synthetic state dicts; the
round-trip legs build the ACTUAL reference networks (/root/reference,
read-only) and are skipped when torch or the checkout is unavailable,
like tests/test_parity_reference.py.
"""
import os
import sys

import numpy as np
import pytest

from downgan_tpu.utils.port_weights import (
    infer_critic_arch,
    infer_generator_arch,
)

REFERENCE = "/root/reference"


def fake_gen_sd(filters=8, n_cov=7, n_pred=2, blocks=2, ups=3):
    sd = {
        "conv1.weight": np.zeros((filters, n_cov, 3, 3), np.float32),
        "conv1.bias": np.zeros((filters,), np.float32),
        "conv3.0.weight": np.zeros((filters, filters, 3, 3), np.float32),
        "conv3.2.weight": np.zeros((n_pred, filters, 3, 3), np.float32),
    }
    for i in range(blocks):
        sd[f"res_blocks.{i}.dense_blocks.0.b1.0.weight"] = np.zeros(
            (filters, filters, 3, 3), np.float32)
    for u in range(ups):
        sd[f"upsampling.{3 * u}.weight"] = np.zeros(
            (4 * filters, filters, 3, 3), np.float32)
        sd[f"upsampling.{3 * u}.bias"] = np.zeros((4 * filters,), np.float32)
    return sd


def test_infer_generator_arch():
    arch = infer_generator_arch(fake_gen_sd())
    assert arch == {"filters": 8, "n_covariates": 7, "n_predictands": 2,
                    "num_res_blocks": 2, "num_upsample": 3}

    with pytest.raises(ValueError, match="missing key"):
        infer_generator_arch({"nope": np.zeros(1)})
    bad = fake_gen_sd()
    bad["upsampling.1.weight"] = bad.pop("upsampling.3.weight")
    with pytest.raises(ValueError, match="upsampling"):
        infer_generator_arch(bad)


def test_infer_critic_arch():
    base, fine = 8, 64
    sd = {
        "features.0.weight": np.zeros((base, 2, 3, 3), np.float32),
        "classifier.0.weight": np.zeros(
            (100, 8 * base * (fine // 16) ** 2), np.float32),
    }
    assert infer_critic_arch(sd) == {
        "filters": base, "n_predictands": 2, "fine_size": fine}
    sd["classifier.0.weight"] = np.zeros((100, 8 * base * 5), np.float32)
    with pytest.raises(ValueError, match="not 8"):
        infer_critic_arch(sd)


needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "DoWnGAN")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def torch_nets():
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from DoWnGAN.networks.critic import Critic as TorchCritic
    from DoWnGAN.networks.generator import Generator as TorchGen

    torch.manual_seed(0)
    # filters=8, fine=64, 7 covariates, 2 predictands, 2 RRDBs (the
    # parity-harness workload: every layer type, CPU-fast).
    tg = TorchGen(8, 64, 7, 2, num_res_blocks=2).eval()
    tc = TorchCritic(8, 64, 2).eval()
    return torch, tg, tc


@needs_reference
def test_import_torch_cli_roundtrip(tmp_path, torch_nets):
    """Save the reference nets (generator as a PICKLED MODULE — the
    mlflow.pytorch artifact form — critic as a bare state_dict), import
    through the CLI, and pin forward parity of the bundle against the
    torch forward."""
    torch, tg, tc = torch_nets
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli

    g_pt = str(tmp_path / "generator.pth")
    c_pt = str(tmp_path / "critic.pt")
    torch.save(tg, g_pt)  # full module pickle
    torch.save(tc.state_dict(), c_pt)  # bare state_dict
    out = str(tmp_path / "bundle")

    res = CliRunner().invoke(cli, [
        "import-torch", "--weights", g_pt, "--critic-weights", c_pt,
        "--out", out])
    assert res.exit_code == 0, res.output
    assert "8 filters, 2 RRDBs, 8x upsample" in res.output

    import jax
    import jax.numpy as jnp

    from downgan_tpu.inference import load_bundle
    from downgan_tpu.training.state import make_models

    config, g_params, c_params = load_bundle(out)
    assert (config.filters, config.num_res_blocks) == (8, 2)
    assert (config.coarse_size, config.fine_size) == (8, 64)
    assert c_params is not None

    gen, critic = make_models(config)
    x = np.random.default_rng(0).standard_normal((2, 7, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_f = tg(torch.from_numpy(x)).numpy()
    ours_f = np.asarray(jax.jit(gen.apply)(
        g_params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours_f.transpose(0, 3, 1, 2), ref_f,
                               atol=2e-5, rtol=1e-5)

    with torch.no_grad():
        ref_c = tc(torch.from_numpy(ref_f)).numpy()
    ours_c = np.asarray(jax.jit(critic.apply)(
        c_params, jnp.asarray(ref_f.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours_c, ref_c, atol=3e-4, rtol=1e-4)


@needs_reference
def test_train_warm_start_from_imported_bundle(tmp_path, torch_nets):
    """`train --synthetic --warm-start <imported bundle>` adopts the
    bundle's architecture, starts from the ported weights (generator AND
    critic), and trains."""
    torch, tg, tc = torch_nets
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli

    g_pt = str(tmp_path / "g.pt")
    c_pt = str(tmp_path / "c.pt")
    torch.save(tg.state_dict(), g_pt)
    torch.save(tc.state_dict(), c_pt)
    out = str(tmp_path / "bundle")
    res = CliRunner().invoke(cli, [
        "import-torch", "--weights", g_pt, "--critic-weights", c_pt,
        "--out", out])
    assert res.exit_code == 0, res.output

    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.inference import load_bundle
    from downgan_tpu.training.trainer import Trainer

    config, g_params, c_params = load_bundle(out)
    config = config.replace(hp=HyperParams(
        batch_size=4, epochs=1, metrics_to_calculate=("MAE", "MSE", "Wass")))
    coarse, fine = synthetic_dataset(
        n_samples=8, coarse_size=config.coarse_size,
        fine_size=config.fine_size, n_covariates=config.n_covariates,
        n_predictands=config.n_predictands)
    trainer = Trainer(config, DeviceDataset.from_numpy(coarse, fine),
                      verbose=False, handle_preemption=False)
    trainer.warm_start(g_params, c_params)
    for a, b in zip(jax.tree.leaves(trainer.state.g_params),
                    jax.tree.leaves(g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(trainer.state.c_params),
                    jax.tree.leaves(c_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state = trainer.train()
    assert int(state.step) == 2  # 8 samples / batch 4 = 2 steps

    # The CLI path end-to-end (mesh + tracking + checkpoints). MS-SSIM
    # needs >=128px fields; this import is 64px, so shrink the registry.
    cfg_path = str(tmp_path / "train.json")
    with open(cfg_path, "w") as f:
        f.write(config.to_json())
    res = CliRunner().invoke(cli, [
        "train", "--config", cfg_path, "--synthetic", "--warm-start", out,
        "--epochs", "1", "--samples", "8", "--batch-size", "4",
        "--tracking-root", str(tmp_path / "track")])
    assert res.exit_code == 0, res.output
    assert "warm start: generator+critic params loaded" in res.output


@needs_reference
def test_export_torch_cli_loads_into_reference_net(tmp_path, torch_nets):
    """The inverse direction: export a (flax-initialized) bundle as a
    torch state_dict, load it into the ACTUAL reference Generator with
    strict=True, and pin forward parity."""
    torch, tg, _ = torch_nets
    from click.testing import CliRunner

    import jax
    import jax.numpy as jnp

    from downgan_tpu.cli.__main__ import cli
    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.inference import write_generator_bundle
    from downgan_tpu.training.state import create_state, make_models

    config = Config(coarse_size=8, fine_size=64, filters=8,
                    num_res_blocks=2, scale_factor=8,
                    hp=HyperParams(metrics_to_calculate=("MAE",)))
    state = create_state(config, jax.random.PRNGKey(3))
    bundle = str(tmp_path / "bundle")
    write_generator_bundle(bundle, config, state.g_params)

    out = str(tmp_path / "generator.pt")
    res = CliRunner().invoke(cli, [
        "export-torch", "-c", bundle, "-o", out])
    assert res.exit_code == 0, res.output

    sys.path.insert(0, REFERENCE) if REFERENCE not in sys.path else None
    from DoWnGAN.networks.generator import Generator as TorchGen

    tg2 = TorchGen(8, 64, 7, 2, num_res_blocks=2).eval()
    tg2.load_state_dict(torch.load(out, weights_only=True), strict=True)

    gen, _ = make_models(config)
    x = np.random.default_rng(4).standard_normal((2, 7, 8, 8)).astype(np.float32)
    ours = np.asarray(jax.jit(gen.apply)(
        state.g_params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    with torch.no_grad():
        ref = tg2(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=1e-5)


def test_warm_start_with_ema_trains_under_donation(tmp_path):
    """EMA on: warm_start must give g_ema its OWN buffers — the step fns
    donate the state, and aliasing g_params/g_ema makes XLA reject the
    donation ('same buffer twice') on the first step."""
    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.training.state import create_state
    from downgan_tpu.training.trainer import Trainer

    hp = HyperParams(batch_size=4, epochs=1, ema_decay=0.99,
                     metrics_to_calculate=("MAE", "MSE", "Wass"))
    config = Config(coarse_size=8, fine_size=64, filters=8,
                    num_res_blocks=1, hp=hp)
    donor = create_state(config, jax.random.PRNGKey(7))
    coarse, fine = synthetic_dataset(n_samples=8, coarse_size=8, fine_size=64)
    trainer = Trainer(config, DeviceDataset.from_numpy(coarse, fine),
                      verbose=False, handle_preemption=False)
    trainer.warm_start(donor.g_params, donor.c_params)
    for a, b in zip(jax.tree.leaves(trainer.state.g_ema),
                    jax.tree.leaves(donor.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state = trainer.train()  # donation would raise here if aliased
    assert int(state.step) == 2


def test_generator_only_resave_drops_stale_critic(tmp_path):
    """Re-saving a generator-only bundle over one that carried critic
    params must remove them: a later --warm-start would otherwise pick up
    a critic unrelated to the new generator."""
    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.inference import load_bundle, write_generator_bundle
    from downgan_tpu.training.state import create_state

    config = Config(coarse_size=8, fine_size=64, filters=8,
                    num_res_blocks=1,
                    hp=HyperParams(metrics_to_calculate=("MAE",)))
    state = create_state(config, jax.random.PRNGKey(0))
    out = str(tmp_path / "bundle")
    write_generator_bundle(out, config, state.g_params,
                           c_params=state.c_params)
    assert load_bundle(out)[2] is not None
    write_generator_bundle(out, config, state.g_params)  # generator-only
    assert load_bundle(out)[2] is None


def test_bundle_restores_on_a_different_device_topology(tmp_path):
    """Bundles are PORTABLE artifacts: one written from params living on
    device 5 of this 8-device mesh must restore in a fresh 1-device
    process (orbax records device-array shardings at save time; the
    writer converts to host arrays and the loader restores onto the
    local device, so neither side pins the topology)."""
    import subprocess
    import sys

    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.inference import write_generator_bundle
    from downgan_tpu.training.state import create_state

    config = Config(coarse_size=8, fine_size=64, filters=8,
                    num_res_blocks=1,
                    hp=HyperParams(metrics_to_calculate=("MAE",)))
    state = create_state(config, jax.random.PRNGKey(1))
    shifted = jax.device_put(state.g_params, jax.devices()[-1])
    out = str(tmp_path / "bundle")
    write_generator_bundle(out, config, shifted,
                           c_params=jax.device_put(state.c_params,
                                                   jax.devices()[-1]))

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)),
         env.get("PYTHONPATH", "")])
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from downgan_tpu.inference import load_bundle\n"
        f"config, g, c = load_bundle({out!r})\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "assert c is not None\n"
        "print('restored', sum(x.size for x in jax.tree.leaves(g)))\n")
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, timeout=300)
    assert res.returncode == 0, res.stderr.decode()[-3000:]
    assert b"restored" in res.stdout


def test_export_torch_ema_on_bundle_rejected(tmp_path):
    """--ema on a bundle source must error, not silently export the
    bundle's (possibly non-EMA) weights under an 'EMA' label."""
    import jax
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli
    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.inference import write_generator_bundle
    from downgan_tpu.training.state import create_state

    config = Config(coarse_size=8, fine_size=64, filters=8,
                    num_res_blocks=1,
                    hp=HyperParams(metrics_to_calculate=("MAE",)))
    state = create_state(config, jax.random.PRNGKey(0))
    bundle = str(tmp_path / "bundle")
    write_generator_bundle(bundle, config, state.g_params)
    res = CliRunner().invoke(cli, [
        "export-torch", "-c", bundle, "--ema",
        "-o", str(tmp_path / "g.pt")])
    assert res.exit_code != 0
    assert "ONE set of params" in res.output


def test_warm_start_shape_mismatch_fails_loudly(tmp_path):
    """A bundle built for a different architecture must be rejected at
    warm-start time, not train garbage."""
    import jax

    from downgan_tpu.config.config import Config, HyperParams
    from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
    from downgan_tpu.training.state import create_state
    from downgan_tpu.training.trainer import Trainer

    hp = HyperParams(batch_size=4, epochs=1,
                     metrics_to_calculate=("MAE", "MSE", "Wass"))
    config = Config(coarse_size=8, fine_size=64, filters=8,
                    num_res_blocks=1, hp=hp)
    other = create_state(
        Config(coarse_size=8, fine_size=64, filters=16, num_res_blocks=1,
               hp=hp),
        jax.random.PRNGKey(0))
    coarse, fine = synthetic_dataset(n_samples=8, coarse_size=8,
                                     fine_size=64)
    trainer = Trainer(config, DeviceDataset.from_numpy(coarse, fine),
                      verbose=False, handle_preemption=False)
    with pytest.raises(ValueError):
        trainer.warm_start(other.g_params)
