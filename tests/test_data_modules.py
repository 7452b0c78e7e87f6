"""EOF, regrid, staging round-trip, and inference-path tests."""
import numpy as np
import pytest

from downgan_tpu.config.config import Config, HyperParams
from downgan_tpu.data.eof import (
    fit_eofs,
    fit_eofs_per_channel,
    low_pass_eof_batch,
    project,
    reconstruct,
)
from downgan_tpu.data.regrid import (
    TARGET_GRIDS,
    LonLatGrid,
    coarsen_block_mean,
    find_nearest_index,
    nearest_indices,
    remap_nearest,
)


# --- EOF -------------------------------------------------------------------

def test_eof_full_rank_reconstruction():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((20, 12)).astype(np.float32)
    basis = fit_eofs(data, n_components=12)
    rec = reconstruct(basis, project(basis, data))
    np.testing.assert_allclose(rec, data, atol=1e-4)


def test_eof_variance_ordering_and_truncation():
    rng = np.random.default_rng(1)
    # Strong leading mode + noise.
    t = np.linspace(0, 6.28, 50)
    mode = np.outer(np.sin(t), rng.standard_normal(30))
    data = 10 * mode + 0.1 * rng.standard_normal((50, 30))
    basis = fit_eofs(data, n_components=5)
    assert np.all(np.diff(basis.explained_variance) <= 1e-6)
    # 1-mode reconstruction captures most variance
    b1 = fit_eofs(data, 1)
    rec = reconstruct(b1, project(b1, data))
    resid = np.var(data - rec) / np.var(data)
    assert resid < 0.05


def test_low_pass_eof_batch_reduces_noise():
    rng = np.random.default_rng(2)
    t = np.linspace(0, 6.28, 64)
    base = np.sin(t)[:, None] * np.cos(t)[None, :]  # (64, 64)
    amp = rng.standard_normal(32)[:, None, None]  # per-sample amplitude
    fields = (amp * base[None] + 0.01 * rng.standard_normal((32, 64, 64)))[..., None]
    fields = np.concatenate([fields, fields], axis=-1).astype(np.float32)
    comps = fit_eofs_per_channel(fields, n_components=3)
    smoothed = np.asarray(low_pass_eof_batch(fields, comps))
    assert smoothed.shape == fields.shape
    # the varying coherent mode survives the 3-EOF projection
    corr = np.corrcoef(smoothed[3, ..., 0].ravel(), fields[3, ..., 0].ravel())[0, 1]
    assert abs(corr) > 0.95
    # and the projection removes most of the incoherent noise energy
    resid = fields - smoothed
    assert resid.var() < 0.01 * fields.var()


# --- regrid ---------------------------------------------------------------

def test_nearest_indices_exact_and_between():
    src = np.array([0.0, 1.0, 2.0, 3.0])
    np.testing.assert_array_equal(nearest_indices(src, np.array([0.0, 2.0])), [0, 2])
    np.testing.assert_array_equal(
        nearest_indices(src, np.array([0.4, 0.6, 2.9, -5.0, 9.0])), [0, 1, 3, 0, 3]
    )
    assert find_nearest_index(src, 1.2) == 1


def test_nearest_indices_validates_monotonicity():
    with pytest.raises(ValueError):
        nearest_indices(np.array([3.0, 1.0, 2.0]), np.array([1.0]))


def test_remap_identity_and_coarsen():
    lats = np.linspace(18.0, 20.0, 16)
    lons = np.linspace(-139.0, -137.0, 16)
    grid = LonLatGrid(16, 16, lons[0], lons[1] - lons[0], lats[0], lats[1] - lats[0])
    field = np.random.default_rng(0).standard_normal((3, 16, 16))
    out = remap_nearest(field, lats, lons, grid)
    np.testing.assert_array_equal(out, field)

    c = coarsen_block_mean(field, 4)
    assert c.shape == (3, 4, 4)
    np.testing.assert_allclose(c[0, 0, 0], field[0, :4, :4].mean(), rtol=1e-6)


def test_reference_target_grids_registered():
    g16 = TARGET_GRIDS["era_16_fold"]
    assert (g16.xsize, g16.ysize) == (880, 432)
    assert g16.lons[0] == pytest.approx(-139.055)
    g10 = TARGET_GRIDS["era_10_fold"]
    assert (g10.xsize, g10.ysize) == (1100, 540)


# --- staging round trip ---------------------------------------------------

def test_preprocessed_roundtrip(tmp_path):
    from downgan_tpu.data.staging import load_preprocessed, write_preprocessed

    config = Config(proc_data_dir=str(tmp_path), region="florida")
    rng = np.random.default_rng(0)
    ct = rng.standard_normal((6, 16, 16, 7)).astype(np.float32)
    ft = rng.standard_normal((6, 128, 128, 2)).astype(np.float32)
    cv = rng.standard_normal((3, 16, 16, 7)).astype(np.float32)
    fv = rng.standard_normal((3, 128, 128, 2)).astype(np.float32)
    paths = write_preprocessed(config, ct, ft, cv, fv)
    assert len(paths) == 4 and all(p.endswith("_florida.nc") for p in paths)
    ct2, ft2, cv2, fv2 = load_preprocessed(config)
    np.testing.assert_allclose(ct2, ct, rtol=1e-6)
    np.testing.assert_allclose(ft2, ft, rtol=1e-6)
    np.testing.assert_allclose(cv2, cv, rtol=1e-6)
    np.testing.assert_allclose(fv2, fv, rtol=1e-6)


def test_generate_train_test_from_raw_netcdfs(tmp_path):
    """End-to-end pipeline over tiny synthetic raw NetCDFs: crop ->
    standardize -> stack -> year split (incl. the test[0]=False quirk)."""
    from downgan_tpu.data.netcdf import write_netcdf
    from downgan_tpu.data.staging import generate_train_test_coarse_fine

    # Region florida: coarse box lat 4:20, lon 70:86 -> raw coarse grid must
    # cover at least 20x86; fine grid 8x that.
    n_t = 8
    rng = np.random.default_rng(0)
    # WRF float times: 4 samples in 2000 (masked year -> test), 4 in 2001.
    wrf_times = np.array(
        [20000101.0, 20000101.25, 20000101.5, 20000101.75,
         20010101.0, 20010101.25, 20010101.5, 20010101.75]
    )
    fine_paths = {}
    for var in ("u10", "v10"):
        p = str(tmp_path / f"fine_{var}.nc")
        write_netcdf(
            p,
            variables={var.upper(): rng.standard_normal((n_t, 160, 688)).astype(np.float32)},
            dims={var.upper(): ("Times", "lat", "lon")},
            coords={"Times": wrf_times},
        )
        fine_paths[var] = p
    cov_paths = {}
    for var, time_dep in (
        ("u10", True), ("v10", True), ("land_sea_mask", False),
        ("surface_pressure", True), ("surface_roughness", True),
        ("geopotential", False), ("cape", True),
    ):
        p = str(tmp_path / f"cov_{var}.nc")
        if time_dep:
            data = rng.standard_normal((n_t, 20, 86)).astype(np.float32)
            dims = ("time", "lat", "lon")
            coords = {"time": np.arange(n_t, dtype=np.float64)}
        else:
            data = rng.standard_normal((20, 86)).astype(np.float32)
            dims = ("lat", "lon")
            coords = None
        write_netcdf(p, variables={var: data}, dims={var: dims}, coords=coords)
        cov_paths[var] = p

    config = Config(
        region="florida",
        fine_paths=fine_paths,
        covariate_paths=cov_paths,
        already_preprocessed=False,
    )
    ct, ft, cv, fv = generate_train_test_coarse_fine(config)
    assert ct.shape == (4, 16, 16, 7)
    assert ft.shape == (4, 128, 128, 2)
    # 2000 is masked -> test split, minus the dropped first sample.
    assert cv.shape[0] == 3 and fv.shape[0] == 3
    # standardized: near zero-mean unit-std per var over the full period
    assert abs(ft.mean()) < 0.2


def test_legacy_load_data_parity(tmp_path):
    """prep_gan.load_data parity (prep_gan.py:81-111): fine U/V multifile
    sets concatenated along time, coarse file with latitude sorted
    ascending (xarray sortby semantics)."""
    from downgan_tpu.data.netcdf import write_netcdf
    from downgan_tpu.data.staging import load_data
    from downgan_tpu.data.times import dt_index, wrf_to_dt

    rng = np.random.default_rng(0)
    fine_paths = {}
    for var in ("U", "V"):
        for part, times in (("a", [20000101.0, 20000101.25]),
                            ("b", [20000101.5, 20000101.75])):
            p = str(tmp_path / f"fine_{var}_{part}.nc")
            write_netcdf(
                p,
                variables={f"{var}10": rng.standard_normal((2, 6, 8)).astype(np.float32)},
                dims={f"{var}10": ("Times", "lat", "lon")},
                coords={"Times": np.asarray(times)},
            )
        fine_paths[var] = str(tmp_path / f"fine_{var}_*.nc")

    lat_desc = np.array([30.0, 20.0, 10.0])
    u = rng.standard_normal((4, 3, 5)).astype(np.float32)
    coarse_p = str(tmp_path / "coarse.nc")
    write_netcdf(
        coarse_p,
        variables={"u10": u},
        dims={"u10": ("time", "latitude", "longitude")},
        coords={"time": np.arange(4.0), "latitude": lat_desc,
                "longitude": np.arange(5.0)},
    )

    out = load_data(fine_paths, coarse_p)
    fu, fu_t = out["fine_u"]
    assert fu.shape == (4, 6, 8)  # two files concatenated along time
    np.testing.assert_array_equal(
        fu_t, wrf_to_dt([20000101.0, 20000101.25, 20000101.5, 20000101.75]))
    coarse = out["coarse"]
    np.testing.assert_array_equal(coarse["latitude"], [10.0, 20.0, 30.0])
    # variables reordered along lat to match, and cast to float64
    np.testing.assert_allclose(coarse["u10"], u[:, ::-1], atol=0)
    assert coarse["u10"].dtype == np.float64
    # dt_index is the documented alias of wrf_to_dt (prep_gan.py:55-67)
    np.testing.assert_array_equal(dt_index([20000101.5]), wrf_to_dt([20000101.5]))


# --- inference path -------------------------------------------------------

def test_generate_fields_chunking_consistency():
    import jax

    from downgan_tpu.inference import generate_fields
    from downgan_tpu.training.state import make_models

    config = Config(coarse_size=8, fine_size=32, filters=8, num_res_blocks=1,
                    chunk_size=4)
    gen, _ = make_models(config)
    params = gen.init(jax.random.PRNGKey(0), np.zeros((1, 8, 8, 7), np.float32))
    coarse = np.random.default_rng(0).standard_normal((10, 8, 8, 7)).astype(np.float32)
    out_chunked = generate_fields(config, params, coarse, chunk_size=4)
    out_whole = generate_fields(config, params, coarse, chunk_size=10)
    assert out_chunked.shape == (10, 32, 32, 2)
    np.testing.assert_allclose(out_chunked, out_whole, atol=1e-5)


def test_write_generated_netcdf_roundtrip(tmp_path):
    from downgan_tpu.data.netcdf import NetCDFFile
    from downgan_tpu.inference import write_generated_netcdf

    fields = np.random.default_rng(0).standard_normal((5, 8, 8, 2)).astype(np.float32)
    path = str(tmp_path / "gen.nc")
    write_generated_netcdf(path, fields)
    with NetCDFFile(path) as f:
        assert set(f.variable_names) == {"u10", "v10"}
        u10 = f.variable("u10")
        np.testing.assert_allclose(u10.data, fields[..., 0], rtol=1e-6)
        assert u10.dims == ["time", "lat", "lon"]


def test_packed_int16_cf_decode(tmp_path):
    """CF packed-data decoding: int16 payload with scale_factor/add_offset
    and _FillValue -> float with NaNs (the reference's ERA fixture format)."""
    import h5py

    from downgan_tpu.data.netcdf import NetCDFFile

    path = str(tmp_path / "packed.nc")
    rng = np.random.default_rng(0)
    truth = rng.uniform(-20.0, 20.0, size=(4, 6, 5)).astype(np.float64)
    scale, offset = 0.01, 1.5
    packed = np.round((truth - offset) / scale).astype(np.int16)
    packed[0, 0, 0] = -32767  # fill
    with h5py.File(path, "w") as f:
        d = f.create_dataset("u10", data=packed)
        d.attrs["scale_factor"] = np.float64(scale)
        d.attrs["add_offset"] = np.float64(offset)
        d.attrs["_FillValue"] = np.int16(-32767)

    with NetCDFFile(path) as f:
        var = f.variable("u10")
    assert np.isnan(var.data[0, 0, 0])
    mask = ~np.isnan(var.data)
    np.testing.assert_allclose(var.data[mask].reshape(-1),
                               (packed.astype(np.float64) * scale + offset)[mask].reshape(-1),
                               rtol=1e-6)  # decode emits float32
    # quantization-level agreement with the original field
    np.testing.assert_allclose(var.data[1:], truth[1:], atol=scale)


def test_netcdf_reader_clear_errors(tmp_path):
    """Malformed inputs fail with clear exceptions, not silent garbage:
    a non-HDF5 file and a missing variable name."""
    from downgan_tpu.data.netcdf import NetCDFFile, write_netcdf

    bad = tmp_path / "not_netcdf.nc"
    bad.write_bytes(b"CDF\x01this is classic netcdf3/garbage, not hdf5")
    with pytest.raises(OSError):
        NetCDFFile(str(bad)).__enter__()

    good = str(tmp_path / "ok.nc")
    write_netcdf(good, variables={"u10": np.zeros((2, 3, 4), np.float32)},
                 dims={"u10": ("time", "lat", "lon")})
    with NetCDFFile(good) as f:
        with pytest.raises(KeyError):
            f.variable("nope")
