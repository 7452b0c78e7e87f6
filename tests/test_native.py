"""Native C++ data-kernel tests: numerics vs numpy, fallback path."""
import numpy as np
import pytest

from downgan_tpu.data import native


def test_native_library_builds():
    """The toolchain is present in this environment; the library must build."""
    assert native.available()


def test_cf_unpack_matches_numpy():
    rng = np.random.default_rng(0)
    raw = rng.integers(-30000, 30000, size=(7, 13, 11), dtype=np.int16)
    raw[0, 0, :3] = -32767
    got = native.cf_unpack(raw, 0.01, 1.5, -32767)
    want = raw.astype(np.float64) * 0.01 + 1.5
    want[raw == -32767] = np.nan
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
    assert got.dtype == np.float32

    # int8 leg
    raw8 = rng.integers(-120, 120, size=(64,), dtype=np.int8)
    got8 = native.cf_unpack(raw8, 0.5, -2.0, None)
    np.testing.assert_allclose(got8, raw8 * 0.5 - 2.0, rtol=1e-6)


def test_nan_moments_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((200, 50)).astype(np.float32) * 3.0 + 7.0
    data[0, :10] = np.nan
    mean, std, count = native.nan_moments(data)
    assert mean == pytest.approx(float(np.nanmean(data)), rel=1e-6)
    assert std == pytest.approx(float(np.nanstd(data)), rel=1e-6)
    assert count == data.size - 10


def test_standardize_inplace_matches_numpy():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((100,)).astype(np.float32) * 2.0 + 5.0
    want = (data - data.mean()) / data.std()
    got = native.standardize_inplace(data.copy(), float(data.mean()), float(data.std()))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_standardize_fallback_bit_identical(monkeypatch):
    """The numpy fallback replicates the C kernel's float32 math exactly
    ((x - f32(mean)) * f32(1/std)): staged bits must not depend on g++
    availability — multihost pods can mix hosts with and without one."""
    rng = np.random.default_rng(5)
    data = (rng.standard_normal((500,)) * 2.0 + 5.0).astype(np.float32)
    mean, std = float(data.mean()), float(data.std())
    native_out = native.standardize_inplace(data.copy(), mean, std)
    monkeypatch.setenv("DOWNGAN_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    numpy_out = native.standardize_inplace(data.copy(), mean, std)
    np.testing.assert_array_equal(native_out, numpy_out)


def test_block_mean_coarsen_matches_numpy():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((3, 16, 24)).astype(np.float32)
    got = native.block_mean_coarsen(data, 4)
    want = data.reshape(3, 4, 4, 6, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pipeline_standardize_uses_native_consistently():
    from downgan_tpu.data.pipeline import standardize

    rng = np.random.default_rng(4)
    arr = (rng.standard_normal((50, 20)) * 4.0 + 3.0).astype(np.float32)
    out, mean, std = standardize(arr.copy())
    assert mean == pytest.approx(3.0, abs=0.3)
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(), 1.0, atol=1e-4)
    # float64 fallback agrees
    out64, m64, s64 = standardize(arr.astype(np.float64))
    np.testing.assert_allclose(out, out64, atol=1e-5)


def test_disable_env_fallback(monkeypatch):
    """DOWNGAN_DISABLE_NATIVE=1 forces pure numpy in a fresh state."""
    monkeypatch.setenv("DOWNGAN_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    raw = np.array([1, 2, -9], np.int16)
    got = native.cf_unpack(raw, 2.0, 1.0, -9)
    np.testing.assert_allclose(got[:2], [3.0, 5.0])
    assert np.isnan(got[2])
    monkeypatch.setattr(native, "_TRIED", False)  # let later tests rebuild

def test_cf_unpack_fallback_bit_identical_to_native(monkeypatch):
    """ADVICE r1: the numpy fallback must decode bit-for-bit like the C++
    kernel (float64 intermediate), so results don't depend on g++."""
    if not native.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(7)
    raw = rng.integers(-32000, 32000, size=(5000,), dtype=np.int16)
    raw[:5] = -32767
    # scale/offset chosen to be non-representable in float32
    scale, offset = 1.8307457812500001e-03, 0.1234567890123456
    via_native = native.cf_unpack(raw, scale, offset, -32767)

    monkeypatch.setenv("DOWNGAN_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    via_numpy = native.cf_unpack(raw, scale, offset, -32767)
    monkeypatch.setattr(native, "_TRIED", False)

    assert np.array_equal(via_native, via_numpy, equal_nan=True)
