"""Real-data validation against the reference's ERA fixture.

``/root/reference/DoWnGAN/GAN/tests/coarse_test.nc`` is a genuine
int16-packed ERA-Interim extract (u10/v10, 124x54x110) the reference uses
for its EOF test (``GAN/tests/test_losses.py:46-158``). Reading it through
our h5py NetCDF layer validates CF decode on real-world files, and the EOF
corruption test reproduces the reference's own real-data test with our
numpy-SVD PCA. Skipped when the reference checkout is absent.
"""
import os

import numpy as np
import pytest

FIXTURE = "/root/reference/DoWnGAN/GAN/tests/coarse_test.nc"
pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not available"
)


@pytest.fixture(scope="module")
def era_fields():
    from downgan_tpu.data.netcdf import NetCDFFile

    with NetCDFFile(FIXTURE) as f:
        u10 = f.variable("u10")
        v10 = f.variable("v10")
        lats = f.coord("latitude")
        lons = f.coord("longitude")
    return u10, v10, lats, lons


def test_packed_era_decode(era_fields):
    u10, v10, lats, lons = era_fields
    assert u10.data.shape == (124, 54, 110)
    assert u10.dims == ["time", "latitude", "longitude"]
    assert u10.data.dtype == np.float32
    assert np.all(np.isfinite(u10.data))
    # physically plausible 10m winds (m/s)
    for var in (u10, v10):
        assert -60 < var.data.min() < var.data.max() < 60
    assert lats.shape == (54,) and lons.shape == (110,)


def test_eof_corruption_detection_on_real_data(era_fields):
    """Reference test semantics (test_losses.py:119-158): fit PCA(20) on
    the real u10 fields; a noise-corrupted sample's projection differs
    from its clean projection, while the clean self-difference is zero."""
    from downgan_tpu.data.eof import fit_eofs, project

    u10 = era_fields[0].data
    flat = u10.reshape(u10.shape[0], -1).astype(np.float64)
    basis = fit_eofs(flat, n_components=20)

    clean = project(basis, flat)
    rng = np.random.default_rng(0)
    corrupted_fields = flat.copy()
    corrupted_fields[3] += rng.standard_normal(flat.shape[1]) * flat.std()
    corrupted = project(basis, corrupted_fields)

    self_mse = float(np.mean((clean - project(basis, flat)) ** 2))
    corrupt_mse = float(np.mean((clean[3] - corrupted[3]) ** 2))
    assert self_mse == 0.0
    assert corrupt_mse > 0.0


def test_standardize_real_fields(era_fields):
    """The native-path standardization handles real data (mean ~0/std ~1
    post-hoc, matching the reference's asserts)."""
    from downgan_tpu.data.pipeline import standardize

    u10 = era_fields[0].data
    out, mean, std = standardize(u10.copy())
    assert abs(float(np.nanmean(out))) < 1e-2
    assert abs(float(np.nanstd(out)) - 1.0) < 1e-2
    assert std > 0


def test_regrid_real_coordinates(era_fields):
    """Remap the real ERA grid onto a half-resolution target via the CDO-
    equivalent nearest-neighbour path."""
    from downgan_tpu.data.regrid import LonLatGrid, remap_nearest

    u10, _, lats, lons = era_fields
    lats_inc = np.sort(lats)  # ERA lat runs north->south; remap wants increasing
    data = u10.data[:, ::-1, :] if lats[0] > lats[-1] else u10.data
    target = LonLatGrid(
        xsize=55, ysize=27,
        xfirst=float(lons[0]), xinc=float(lons[1] - lons[0]) * 2,
        yfirst=float(lats_inc[0]), yinc=float(lats_inc[1] - lats_inc[0]) * 2,
    )
    out = remap_nearest(data, lats_inc, np.asarray(lons, np.float64), target)
    assert out.shape == (124, 27, 55)
    assert np.all(np.isfinite(out))
