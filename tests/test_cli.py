"""CLI surface tests (click runner): train --synthetic, generate, show-config."""
import glob
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from downgan_tpu.cli.__main__ import cli
from downgan_tpu.config.config import Config, HyperParams


@pytest.fixture()
def tiny_config_file(tmp_path):
    config = Config(
        coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
        hp=HyperParams(
            batch_size=8, epochs=1,
            metrics_to_calculate=("MAE", "MSE", "Wass"),
        ),
    )
    path = tmp_path / "config.json"
    path.write_text(config.to_json())
    return str(path)


def test_show_config_roundtrip(tiny_config_file):
    result = CliRunner().invoke(cli, ["show-config", "--config", tiny_config_file])
    assert result.exit_code == 0, result.output
    parsed = json.loads(result.output)
    assert parsed["coarse_size"] == 8
    assert parsed["hp"]["batch_size"] == 8


def test_train_and_generate_synthetic(tmp_path, tiny_config_file):
    tracking_root = str(tmp_path / "exps")
    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["train", "--config", tiny_config_file, "--synthetic", "--samples", "32",
         "--tracking-root", tracking_root, "--experiment", "cli-test"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "finished" in result.output

    # the run wrote config, metrics CSV, images, and a checkpoint
    run_dirs = glob.glob(os.path.join(tracking_root, "*", "*", "artifacts"))
    assert len(run_dirs) == 1
    art = run_dirs[0]
    assert os.path.exists(os.path.join(art, "config.json"))
    assert os.path.exists(os.path.join(art, "train_metrics.csv"))
    assert os.path.exists(os.path.join(art, "train_images.png"))
    ckpt_dir = os.path.join(art, "checkpoints")
    assert os.path.isdir(ckpt_dir)

    out_nc = str(tmp_path / "gen.nc")
    result = runner.invoke(
        cli,
        ["generate", "--config", tiny_config_file, "--checkpoint", ckpt_dir,
         "--synthetic", "--samples", "10", "--out", out_nc],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    from downgan_tpu.data.netcdf import NetCDFFile

    with NetCDFFile(out_nc) as f:
        u10 = f.variable("u10")
        assert u10.data.shape == (10, 32, 32)
        assert np.all(np.isfinite(u10.data))
