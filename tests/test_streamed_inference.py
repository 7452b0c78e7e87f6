"""Streamed NetCDF generation (constant host memory in series length).

``generate_to_netcdf`` must write exactly what the in-memory path
(``generate_fields``/``generate_ensemble`` + ``write_generated_netcdf``)
writes — same data, coords, dim labels — while holding only one output
block at a time. No reference equivalent: ``gen_fake_ds.py:156-162``
materializes every generated chunk before one ``to_netcdf``.
"""
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.inference import (
    generate_ensemble,
    generate_fields,
    generate_to_netcdf,
    write_generated_netcdf,
)
from downgan_tpu.training.state import make_models


def tiny_config(noise=0):
    return Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                  noise_channels=noise, chunk_size=4,
                  hp=HyperParams(batch_size=4))


def init_params(config):
    gen, _ = make_models(config)
    return gen.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, 8, 8, 7 + config.noise_channels)))


def read_all(path):
    out = {}
    with h5py.File(path, "r") as f:
        for k in f:
            out[k] = (np.asarray(f[k][...]),
                      tuple(d.label for d in f[k].dims))
    return out


def assert_same_file_contents(a, b):
    ra, rb = read_all(a), read_all(b)
    assert set(ra) == set(rb)
    for k in ra:
        np.testing.assert_array_equal(ra[k][0], rb[k][0], err_msg=k)
        assert ra[k][1] == rb[k][1], k


def test_streamed_matches_in_memory_plain_and_stochastic(tmp_path):
    for noise in (0, 2):
        config = tiny_config(noise=noise)
        params = init_params(config)
        coarse = np.random.default_rng(1).standard_normal(
            (10, 8, 8, 7)).astype(np.float32)  # ragged tail: 10 = 2x4 + 2
        times = np.arange(10, dtype=np.float64) * 6.0
        lats = np.linspace(20, 30, 32)
        lons = np.linspace(-85, -75, 32)

        mem = str(tmp_path / f"mem{noise}.nc")
        write_generated_netcdf(
            mem, generate_fields(config, params, coarse),
            times=times, lats=lats, lons=lons)
        stream = str(tmp_path / f"stream{noise}.nc")
        generate_to_netcdf(stream, config, params, coarse,
                           times=times, lats=lats, lons=lons)
        assert_same_file_contents(mem, stream)


def test_streamed_ensemble_matches_in_memory(tmp_path):
    config = tiny_config(noise=2)
    params = init_params(config)
    coarse = np.random.default_rng(2).standard_normal(
        (6, 8, 8, 7)).astype(np.float32)

    mem = str(tmp_path / "mem.nc")
    write_generated_netcdf(mem, generate_ensemble(config, params, coarse, 3))
    stream = str(tmp_path / "stream.nc")
    generate_to_netcdf(stream, config, params, coarse, n_members=3)
    assert_same_file_contents(mem, stream)

    with pytest.raises(ValueError, match="stochastic"):
        generate_to_netcdf(str(tmp_path / "x.nc"), tiny_config(noise=0),
                           init_params(tiny_config(noise=0)), coarse,
                           n_members=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        generate_to_netcdf(str(tmp_path / "x.nc"), config, params, coarse,
                           n_members=2, tile_rows=8)


def test_validation_error_does_not_clobber_existing_file(tmp_path):
    """Argument validation must fire BEFORE the writer opens: h5py "w"
    truncates, so a late check would destroy a previously generated file
    and leave full-size garbage behind."""
    config = tiny_config(noise=0)
    params = init_params(config)
    coarse = np.random.default_rng(5).standard_normal(
        (4, 8, 8, 7)).astype(np.float32)
    out = str(tmp_path / "existing.nc")
    generate_to_netcdf(out, config, params, coarse)
    before = read_all(out)

    with pytest.raises(ValueError, match="stochastic"):
        generate_to_netcdf(out, config, params, coarse, n_members=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        generate_to_netcdf(out, tiny_config(noise=2),
                           init_params(tiny_config(noise=2)), coarse,
                           n_members=2, tile_rows=8)
    after = read_all(out)
    assert set(before) == set(after)
    for k in before:
        np.testing.assert_array_equal(before[k][0], after[k][0], err_msg=k)


def test_streamed_tiled_accepts_preappended_latent(tmp_path):
    """A caller-pre-appended (n, h, w, noise_channels) latent must not get
    a second latent appended (same guard as tiled_sr_inference): the
    channel count already exceeding n_covariates means the caller drew
    their own realization."""
    from downgan_tpu.parallel.spatial import tiled_sr_inference

    config = tiny_config(noise=2)
    params = init_params(config)
    rng = np.random.default_rng(6)
    coarse = rng.standard_normal((3, 24, 16, 7)).astype(np.float32)
    z = rng.standard_normal((3, 24, 16, 2)).astype(np.float32)
    with_z = np.concatenate([coarse, z], axis=-1)

    whole = tiled_sr_inference(config, params, with_z, tile_rows=8, overlap=4)
    stream = str(tmp_path / "prez.nc")
    generate_to_netcdf(stream, config, params, with_z, chunk_size=2,
                       tile_rows=8, overlap=4)
    got = read_all(stream)
    np.testing.assert_array_equal(got["u10"][0], whole[..., 0])
    np.testing.assert_array_equal(got["v10"][0], whole[..., 1])


def test_streamed_tiled_deterministic_matches_whole_call(tmp_path):
    """Deterministic generator: streamed tiled output == one whole-series
    tiled call (tiling is per-sample; dispatch grouping cannot change
    values — the tiler is bit-identical across tiles_per_dispatch)."""
    from downgan_tpu.parallel.spatial import tiled_sr_inference

    config = tiny_config(noise=0)
    params = init_params(config)
    coarse = np.random.default_rng(3).standard_normal(
        (5, 24, 16, 7)).astype(np.float32)

    whole = tiled_sr_inference(config, params, coarse, tile_rows=8, overlap=4)
    stream = str(tmp_path / "tiled.nc")
    generate_to_netcdf(stream, config, params, coarse, chunk_size=2,
                       tile_rows=8, overlap=4)
    got = read_all(stream)
    assert got["u10"][0].shape == (5, 96, 64)
    np.testing.assert_array_equal(got["u10"][0], whole[..., 0])
    np.testing.assert_array_equal(got["v10"][0], whole[..., 1])


def test_streamed_tiled_stochastic_chunk_invariant(tmp_path):
    """Stochastic + tiled streaming: each sample's whole-domain latent is
    drawn from its ABSOLUTE index, so realizations do not depend on the
    streaming chunk size (and repeat bit-identically)."""
    config = tiny_config(noise=2)
    params = init_params(config)
    coarse = np.random.default_rng(4).standard_normal(
        (5, 24, 16, 7)).astype(np.float32)

    paths = []
    for i, chunk in enumerate((2, 5)):
        p = str(tmp_path / f"s{i}.nc")
        generate_to_netcdf(p, config, params, coarse, chunk_size=chunk,
                           tile_rows=8, overlap=4)
        paths.append(p)
    assert_same_file_contents(*paths)
    # and the latent is real: distinct from the deterministic output shape
    got = read_all(paths[0])
    assert got["u10"][0].shape == (5, 96, 64)
    assert np.isfinite(got["u10"][0]).all()


def test_generate_cli_streamed(tmp_path):
    """`generate --streamed` writes the same file the in-memory CLI path
    writes (synthetic covariates, bundle checkpoint)."""
    from click.testing import CliRunner

    from downgan_tpu.cli.__main__ import cli
    from downgan_tpu.inference import write_generator_bundle

    config = tiny_config(noise=0)
    params = init_params(config)
    bundle = str(tmp_path / "bundle")
    write_generator_bundle(bundle, config, params)

    runner = CliRunner()
    outs = []
    for flags in ([], ["--streamed"]):
        out = str(tmp_path / f"gen{len(outs)}.nc")
        r = runner.invoke(cli, ["generate", "--checkpoint", bundle,
                                "--synthetic", "--samples", "10",
                                "--out", out] + flags)
        assert r.exit_code == 0, r.output
        outs.append(out)
    assert_same_file_contents(*outs)
