"""Disk-streaming dataset tier (data/stream.py): lazy NetCDF-backed
batches, bit-identical training, and the `train --stream` CLI."""
import os

import jax
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.data.dataset import DeviceDataset, synthetic_dataset
from downgan_tpu.data.staging import load_preprocessed, write_preprocessed
from downgan_tpu.data.stream import LazyField, StreamDataset
from downgan_tpu.training.trainer import Trainer


def tiny_config(tmp_path, **hp_kw) -> Config:
    hp = HyperParams(
        batch_size=4,
        metrics_to_calculate=("MAE", "MSE", "Wass"),
        **hp_kw,
    )
    return Config(
        coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
        proc_data_dir=str(tmp_path), already_preprocessed=True, hp=hp,
    )


@pytest.fixture
def preprocessed(tmp_path):
    """Synthetic set written through the real preprocessed-NetCDF layout."""
    config = tiny_config(tmp_path / "proc")
    coarse, fine = synthetic_dataset(n_samples=24, coarse_size=8,
                                     fine_size=32, seed=0)
    write_preprocessed(config, coarse[:16], fine[:16], coarse[16:], fine[16:])
    return config, coarse, fine


def test_lazy_field_random_access(preprocessed):
    """Unsorted/duplicate index arrays, scalar indexing, and full
    materialization all match the eager load exactly."""
    config, coarse, fine = preprocessed
    ct, ft, cv, fv = load_preprocessed(config)
    with StreamDataset.from_preprocessed(config, "train") as ds:
        assert len(ds) == 16
        assert ds.coarse.shape == (16, 8, 8, 7)
        assert ds.fine.shape == (16, 32, 32, 2)
        sel = np.array([3, 1, 1, 11, 0])  # unsorted, with a duplicate
        np.testing.assert_array_equal(ds.coarse[sel], ct[sel])
        np.testing.assert_array_equal(ds.fine[sel], ft[sel])
        one = ds.fine[7]
        assert one.shape == (32, 32, 2)
        np.testing.assert_array_equal(one, ft[7])
        np.testing.assert_array_equal(np.asarray(ds.fine), ft)
        with pytest.raises(TypeError, match="integers"):
            ds.coarse[np.array([0.5])]


def test_stream_dataset_validation(tmp_path, preprocessed):
    config, _, _ = preprocessed
    missing = tiny_config(tmp_path / "nowhere")
    with pytest.raises(FileNotFoundError, match="prepare-data"):
        StreamDataset.from_preprocessed(missing, "train")
    # mismatched sample counts across the pair are rejected
    from downgan_tpu.data.staging import preprocessed_path

    with pytest.raises(ValueError, match="differ"):
        StreamDataset(preprocessed_path(config, "coarse", "train"),
                      preprocessed_path(config, "fine", "test"))


def test_stream_matches_device_trajectory(preprocessed):
    """Training straight off disk is bit-identical to device-resident
    training: same perms, same step fn, only the residency differs."""
    config, coarse, fine = preprocessed
    config = tiny_config(config.proc_data_dir, fused_epoch=False)

    t_dev = Trainer(config, DeviceDataset.from_numpy(coarse[:16], fine[:16]),
                    DeviceDataset.from_numpy(coarse[16:], fine[16:]),
                    verbose=False)
    t_dev.train(epochs=2)

    with StreamDataset.from_preprocessed(config, "train") as train_ds, \
            StreamDataset.from_preprocessed(config, "test") as test_ds:
        t_str = Trainer(config, train_ds, test_ds, verbose=False)
        t_str.train(epochs=2)
        assert int(t_dev.state.step) == int(t_str.state.step)
        for a, b in zip(jax.tree.leaves(t_dev.state.g_params),
                        jax.tree.leaves(t_str.state.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(t_dev.state.c_params),
                        jax.tree.leaves(t_str.state.c_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # eval agrees too, including the ragged test tail (8 samples, bs 4)
        m_dev, m_str = t_dev._run_test_pass(), t_str._run_test_pass()
        for k in m_dev:
            assert m_dev[k] == pytest.approx(m_str[k], rel=1e-6), k


def test_lazy_field_cf_packed(tmp_path):
    """Streaming reads go through CF decoding: an int16-packed variable
    (the ERA on-disk packing) decodes identically to the eager reader."""
    from downgan_tpu.data.netcdf import read_variable, write_netcdf

    rng = np.random.default_rng(3)
    packed = rng.integers(-1000, 1000, size=(6, 2, 4, 4)).astype(np.int16)
    path = str(tmp_path / "packed.nc")
    write_netcdf(
        path, variables={"data": packed},
        dims={"data": ("time", "var", "lat", "lon")},
        coords={"time": np.arange(6, dtype=np.float64)},
        attrs={"data": {"scale_factor": np.float64(0.01),
                        "add_offset": np.float64(5.0)}},
    )
    eager = read_variable(path, "data").data
    field = LazyField(path)
    sel = np.array([4, 0, 4])
    np.testing.assert_allclose(
        field[sel], np.transpose(eager[sel], (0, 2, 3, 1)).astype(np.float32))
    field.close()


def test_train_stream_cli(tmp_path, preprocessed):
    """`train --stream` trains end-to-end off the preprocessed files."""
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli

    config, _, _ = preprocessed
    # batch 8: the test mesh has 8 virtual devices and the CLI trains
    # data-parallel over all of them by default
    import dataclasses

    config = config.replace(hp=dataclasses.replace(config.hp, batch_size=8))
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(config.to_json())
    tracking_root = str(tmp_path / "exps")
    result = CliRunner().invoke(
        cli,
        ["train", "--config", str(cfg_path), "--epochs", "1",
         "--tracking-root", tracking_root, "--experiment", "stream",
         "--stream"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "per-step loop" in result.output
    assert "finished" in result.output

    # guards: --stream has no synthetic files; --host-feed is a different tier
    result = CliRunner().invoke(
        cli, ["train", "--config", str(cfg_path), "--stream", "--synthetic"])
    assert result.exit_code != 0
    assert "no files to stream" in result.output
    result = CliRunner().invoke(
        cli, ["train", "--config", str(cfg_path), "--stream", "--host-feed"])
    assert result.exit_code != 0
    assert "residency tiers" in result.output
