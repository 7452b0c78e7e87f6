"""Loss-library tests: ports the reference's golden values
(``DoWnGAN/GAN/tests/test_losses.py``) to NHWC JAX, plus EOF-projection
behavior on synthetic data (the reference uses a real-data NetCDF fixture;
we use an equivalent synthetic low-rank field — SURVEY §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.ops.losses import (
    content_loss,
    content_mse_loss,
    divergence_loss,
    eof_loss,
    high_pass,
    low_pass,
    vorticity_loss,
    wass_loss,
)

N = 5


@pytest.fixture(scope="module")
def constant_fields():
    # Reference fixture (test_losses.py:21-23): hr=1, fake=5, (64,2,10,12)
    # NCHW -> our NHWC (64,10,12,2).
    hr = jnp.ones((64, 10, 12, 2))
    fake = N * jnp.ones((64, 10, 12, 2))
    return hr, fake


@pytest.fixture(scope="module")
def gaussian_fields():
    # Reference fixture (test_losses.py:28-37): meshgrid('ij') of
    # arange(-5,5) x arange(-6,6); hr = exp(-(x^2+y^2)), fake = exp(-(x^4+y^4)),
    # broadcast over batch and both channels.
    xx, yy = np.meshgrid(np.arange(-5, 5), np.arange(-6, 6), indexing="ij")
    zz_hr = np.exp(-(xx**2 + yy**2)).astype(np.float32)
    zz_fake = np.exp(-(xx**4 + yy**4)).astype(np.float32)
    hr = np.broadcast_to(zz_hr[None, :, :, None], (64, 10, 12, 2)).copy()
    fake = np.broadcast_to(zz_fake[None, :, :, None], (64, 10, 12, 2)).copy()
    return jnp.asarray(hr), jnp.asarray(fake)


def test_content_loss(constant_fields):
    hr, fake = constant_fields
    assert float(content_loss(hr, fake)) == pytest.approx(N - 1)


def test_content_mse_loss(constant_fields):
    hr, fake = constant_fields
    assert float(content_mse_loss(hr, fake)) == pytest.approx((N - 1) ** 2)


def test_divergence_loss_golden(gaussian_fields):
    hr, fake = gaussian_fields
    # Golden value from the reference suite (test_losses.py:90-94).
    assert float(divergence_loss(hr, fake)) == pytest.approx(0.0018, abs=1e-4)


def test_vorticity_loss_golden(gaussian_fields):
    hr, fake = gaussian_fields
    # Golden value from the reference suite (test_losses.py:112-116).
    assert float(vorticity_loss(hr, fake)) == pytest.approx(0.00144, abs=1e-4)


def test_wass_loss():
    assert float(wass_loss(jnp.float32(3.0), jnp.float32(1.5))) == pytest.approx(1.5)


def test_divergence_identical_is_zero(gaussian_fields):
    hr, _ = gaussian_fields
    assert float(divergence_loss(hr, hr)) == pytest.approx(0.0, abs=1e-6)


def test_eof_projection_detects_corruption():
    """EOF analogue of the reference's real-data PCA test
    (test_losses.py:119-158): a corrupted sample must project differently,
    an uncorrupted one identically."""
    rng = np.random.RandomState(0)
    t, h, w = 100, 12, 10
    # Low-rank synthetic field: 5 spatial modes with random time loadings.
    modes = rng.randn(5, h * w).astype(np.float32)
    loadings = rng.randn(t, 5).astype(np.float32)
    X = loadings @ modes  # (t, h*w)
    X = (X - X.mean()) / X.std()

    # PCA via SVD (no sklearn needed at runtime).
    Xc = X - X.mean(axis=0, keepdims=True)
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    n_comp = 5
    explained = (s[:n_comp] ** 2) / (t - 1)
    components = vt[:n_comp] / explained[:, None]

    fields = jnp.asarray(X.reshape(t, h, w, 1).repeat(2, axis=-1))
    corrupted = np.array(fields)
    corrupted[0] += rng.normal(scale=5.0, size=(h, w, 2))
    corrupted = jnp.asarray(corrupted)

    loss_clean = float(eof_loss(jnp.asarray(components), fields, fields))
    loss_corrupt = float(eof_loss(jnp.asarray(components), fields, corrupted))
    assert loss_clean == pytest.approx(0.0, abs=1e-10)
    assert loss_corrupt > 1e-6


def test_low_pass_matches_torch_avgpool():
    """low_pass must equal torch ReplicationPad2d(2) + AvgPool2d(5, stride=1)
    (reference hyperparams.py:30-33)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    x = rng.randn(2, 2, 16, 16).astype(np.float32)
    pad = torch.nn.ReplicationPad2d(2)
    pool = torch.nn.AvgPool2d(5, stride=1, padding=0)
    ref = pool(pad(torch.from_numpy(x))).numpy()
    ours = np.asarray(low_pass(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_high_plus_low_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 2))
    np.testing.assert_allclose(
        np.asarray(low_pass(x) + high_pass(x)), np.asarray(x), rtol=1e-5, atol=1e-6
    )
