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


def _write_cov_fixtures(tmp_path, rng, n_t, names, lat=None, flip_lat=False,
                        prefix="cov"):
    """Covariate fixture files for the florida coarse box (20x86 grid).
    ``names`` maps std key -> variable name to write; optional lat coords
    (written flipped+data-flipped when flip_lat, so the geographic content
    is identical to the ascending original)."""
    cov_paths = {}
    for std, var in names.items():
        p = str(tmp_path / f"{prefix}_{std}.nc")
        time_dep = std not in ("land_sea_mask", "geopotential")
        data = rng.standard_normal(
            ((n_t, 20, 86) if time_dep else (20, 86))).astype(np.float32)
        dims = ("time", "lat", "lon") if time_dep else ("lat", "lon")
        coords = {"time": np.arange(n_t, dtype=np.float64)} if time_dep else {}
        if lat is not None:
            la, arr = (lat[::-1], np.flip(data, axis=-2)) if flip_lat else (lat, data)
            coords["lat"] = la
            data = arr
        from downgan_tpu.data.netcdf import write_netcdf

        write_netcdf(p, variables={var: data}, dims={var: dims},
                     coords=coords or None)
        cov_paths[std] = p
    return cov_paths


def test_covariates_found_by_raw_short_names(tmp_path):
    """Real ERA files store lsm/sp/sr/z/cape — the registry's raw names
    (reference selects ds[covariate_names_ordered[key]],
    gen_experiment_datasets.py:140) — and NON_STANDARD_ATTRIBUTES does not
    rename them; the loader must find them anyway."""
    from downgan_tpu.config.config import COVARIATE_NAMES_ORDERED
    from downgan_tpu.data.staging import load_covariates

    n_t = 4
    long_names = {k: k for k in COVARIATE_NAMES_ORDERED}
    raw_names = dict(COVARIATE_NAMES_ORDERED)  # std -> lsm/sp/sr/z/cape
    cov_long = _write_cov_fixtures(tmp_path, np.random.default_rng(0), n_t,
                                   long_names, prefix="long")
    cov_raw = _write_cov_fixtures(tmp_path, np.random.default_rng(0), n_t,
                                  raw_names, prefix="raw")
    cfg_l = Config(region="florida", covariate_paths=cov_long,
                   already_preprocessed=False)
    cfg_r = Config(region="florida", covariate_paths=cov_raw,
                   already_preprocessed=False)
    out_l = load_covariates(cfg_l, n_t, fine_coords=(None, None))
    out_r = load_covariates(cfg_r, n_t, fine_coords=(None, None))
    assert set(out_l) == set(out_r) == set(COVARIATE_NAMES_ORDERED)
    for k in out_l:
        np.testing.assert_array_equal(out_l[k], out_r[k])
        assert out_l[k].shape == (n_t, 16, 16)


def test_covariates_descending_lat_sorted_before_crop(tmp_path):
    """The reference sorts every covariate latitude-ascending before the
    index crop (sortby('lat', ascending=True),
    gen_experiment_datasets.py:133); a descending-lat file must produce
    the same geographic window as its ascending twin, not a flipped crop
    of the wrong rows."""
    from downgan_tpu.config.config import COVARIATE_NAMES_ORDERED
    from downgan_tpu.data.staging import load_covariates

    n_t = 4
    lat = np.linspace(0.0, 19.0, 20)
    names = {k: k for k in COVARIATE_NAMES_ORDERED}
    up = _write_cov_fixtures(tmp_path, np.random.default_rng(1), n_t, names,
                             lat=lat, flip_lat=False, prefix="asc")
    dn = _write_cov_fixtures(tmp_path, np.random.default_rng(1), n_t, names,
                             lat=lat, flip_lat=True, prefix="desc")
    cfg_u = Config(region="florida", covariate_paths=up,
                   already_preprocessed=False)
    cfg_d = Config(region="florida", covariate_paths=dn,
                   already_preprocessed=False)
    out_u = load_covariates(cfg_u, n_t, fine_coords=(None, None))
    out_d = load_covariates(cfg_d, n_t, fine_coords=(None, None))
    for k in out_u:
        np.testing.assert_array_equal(out_u[k], out_d[k])


def test_global_mask_coordinate_crop(tmp_path):
    """The land-sea mask is a GLOBAL 0-360-longitude file upstream; it is
    cropped by matching the fine grid's extent against the mask's own
    coords with the reference's exact slice arithmetic (crop_global_mask,
    gen_experiment_datasets.py:100-113), not by regional index slices."""
    from downgan_tpu.data.netcdf import write_netcdf
    from downgan_tpu.data.staging import _crop_global_mask, load_covariates
    from downgan_tpu.config.config import COVARIATE_NAMES_ORDERED

    rng = np.random.default_rng(2)
    # Global-ish mask grid: lat ascending, lon on the 0-360 convention.
    mask_lat = -40.0 + 0.8 * np.arange(120)
    mask_lon = 0.8 * np.arange(450)
    mask = (rng.random((1, 120, 450)) > 0.5).astype(np.float32)
    # Fine (cropped) grid extent in -180..180 longitudes.
    fine_lat = 0.1 * np.arange(32, 160)
    fine_lon = -139.0 + 0.1 * np.arange(560, 688)

    # Unit: the slice arithmetic transcribed from the reference lines.
    got = _crop_global_mask(mask, mask_lat, mask_lon, fine_lat, fine_lon)
    mlat1 = int(np.argmin(np.abs(fine_lat.min() - mask_lat)))
    mlat2 = int(np.argmin(np.abs(fine_lat.max() - mask_lat)))
    mlon1 = int(np.argmin(np.abs(fine_lon.min() - (-360 + mask_lon))))
    mlon2 = int(np.argmin(np.abs(fine_lon.max() - (-360 + mask_lon)))) + 1
    np.testing.assert_array_equal(got, mask[:, mlat1:mlat2, mlon1:mlon2])
    assert got.shape[1:] == (16, 17)  # lat end-exclusive, lon end-inclusive

    # Integration: load_covariates engages the coordinate crop for the
    # mask (global file WITH coords + known fine coords) and broadcasts
    # it along time AFTER cropping.
    n_t = 4
    names = {k: k for k in COVARIATE_NAMES_ORDERED}
    cov = _write_cov_fixtures(tmp_path, rng, n_t, names, prefix="gm")
    p = str(tmp_path / "gm_land_sea_mask.nc")
    write_netcdf(p, variables={"lsm": mask},
                 dims={"lsm": ("time", "lat", "lon")},
                 coords={"time": np.zeros(1), "lat": mask_lat, "lon": mask_lon})
    cov["land_sea_mask"] = p
    cfg = Config(region="florida", covariate_paths=cov,
                 already_preprocessed=False)
    out = load_covariates(cfg, n_t, fine_coords=(fine_lat, fine_lon))
    assert out["land_sea_mask"].shape == (n_t, 16, 17)
    np.testing.assert_array_equal(out["land_sea_mask"][0], got[0])
    np.testing.assert_array_equal(out["land_sea_mask"][3], got[0])


def test_regional_mask_with_coordinates_keeps_index_crop(tmp_path):
    """A REGIONAL land-sea mask that happens to carry ordinary -180..180
    lat/lon coordinates must keep the index crop: the reference's
    coordinate arithmetic (-360 + mask_lon) only makes sense for the
    global 0-360 ERA mask, and applying it to -180..180 longitudes makes
    every argmin collapse to the last column (a (rows, 1) miscrop)."""
    from downgan_tpu.data.netcdf import write_netcdf
    from downgan_tpu.data.pipeline import crop_array
    from downgan_tpu.data.staging import load_covariates
    from downgan_tpu.config.config import COVARIATE_NAMES_ORDERED

    rng = np.random.default_rng(5)
    n_t = 3
    names = {k: k for k in COVARIATE_NAMES_ORDERED}
    cov = _write_cov_fixtures(tmp_path, rng, n_t, names, prefix="rm")
    # Regional florida-box mask WITH coordinates, longitudes < 180.
    mask = (rng.random((20, 86)) > 0.5).astype(np.float32)
    mask_lat = 22.0 + 0.1 * np.arange(20)
    mask_lon = -139.0 + 0.8 * np.arange(86)
    p = str(tmp_path / "rm_land_sea_mask.nc")
    write_netcdf(p, variables={"lsm": mask}, dims={"lsm": ("lat", "lon")},
                 coords={"lat": mask_lat, "lon": mask_lon})
    cov["land_sea_mask"] = p
    cfg = Config(region="florida", covariate_paths=cov,
                 already_preprocessed=False)
    # fine coords present too — the pre-fix condition would have engaged
    # the global coordinate crop purely on their availability.
    fine_lat = 22.0 + 0.0125 * np.arange(160)
    fine_lon = -139.0 + 0.1 * np.arange(160)
    out = load_covariates(cfg, n_t, fine_coords=(fine_lat, fine_lon))
    expect = crop_array(mask[None], cfg, 1)
    assert out["land_sea_mask"].shape == (n_t,) + expect.shape[1:]
    np.testing.assert_array_equal(out["land_sea_mask"][0], expect[0])
    # Same grid as the index-cropped covariates: the stack sites accept it.
    assert (out["land_sea_mask"].shape[-2:]
            == out["surface_pressure"].shape[-2:])


def test_mismatched_covariate_grids_fail_with_named_offender():
    """A coordinate-cropped mask whose grid disagrees with the index-cropped
    covariates (as in test_global_mask_coordinate_crop's fixture) must fail
    at the stack site with the offender NAMED, not as an opaque np.stack
    'all input arrays must have the same shape' error."""
    from downgan_tpu.data.staging import _check_same_grid

    arrs = {
        "surface_pressure": np.zeros((4, 16, 16), np.float32),
        "land_sea_mask": np.zeros((4, 16, 17), np.float32),
    }
    with pytest.raises(ValueError, match=r"land_sea_mask=\(16, 17\)"):
        _check_same_grid(arrs, "covariate")
    _check_same_grid({k: np.zeros((4, 16, 16)) for k in arrs}, "covariate")


def test_multifile_glob_ordered_by_time_not_name(tmp_path):
    """open_mfdataset(combine='by_coords') orders chunks by time; lexical
    filename order would scramble unpadded names (wrf_2 after wrf_10)."""
    from downgan_tpu.data.netcdf import write_netcdf
    from downgan_tpu.data.staging import _read_var_multifile

    rng = np.random.default_rng(3)
    early = rng.standard_normal((2, 4, 4)).astype(np.float32)
    late = rng.standard_normal((2, 4, 4)).astype(np.float32)
    # Lexically "wrf_10.nc" < "wrf_2.nc", but wrf_2 holds the EARLIER times.
    write_netcdf(str(tmp_path / "wrf_2.nc"), variables={"u10": early},
                 dims={"u10": ("time", "lat", "lon")},
                 coords={"time": np.array([0.0, 1.0])})
    write_netcdf(str(tmp_path / "wrf_10.nc"), variables={"u10": late},
                 dims={"u10": ("time", "lat", "lon")},
                 coords={"time": np.array([2.0, 3.0])})
    data, t = _read_var_multifile(str(tmp_path / "wrf_*.nc"), "u10")
    np.testing.assert_array_equal(t, [0.0, 1.0, 2.0, 3.0])
    np.testing.assert_array_equal(data, np.concatenate([early, late]))
