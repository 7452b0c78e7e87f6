"""Pallas fused-DRB kernel tests (interpret mode — CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from downgan_tpu.models.generator import DenseResidualBlock
from downgan_tpu.ops.pallas.drb import (
    cs_to_nhwc,
    drb_forward,
    drb_forward_reference,
    nhwc_to_cs,
    pack_drb_weights,
)


@pytest.fixture(scope="module")
def drb_setup():
    F, B, H, W = 16, 4, 16, 16
    drb = DenseResidualBlock(F)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, F))
    params = drb.init(jax.random.PRNGKey(1), x)
    return F, B, H, W, drb, x, params


def test_cs_layout_roundtrip(drb_setup):
    F, B, H, W, _, x, _ = drb_setup
    np.testing.assert_array_equal(
        np.asarray(cs_to_nhwc(nhwc_to_cs(x), B, H, W)), np.asarray(x)
    )


def test_reference_formulation_matches_flax(drb_setup):
    F, B, H, W, drb, x, params = drb_setup
    want = drb.apply(params, x)
    ws, bs = pack_drb_weights(params["params"], F)
    got = cs_to_nhwc(drb_forward_reference(nhwc_to_cs(x), ws, bs, F, H, W), B, H, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_kernel_matches_flax(drb_setup):
    F, B, H, W, drb, x, params = drb_setup
    want = drb.apply(params, x)
    ws, bs = pack_drb_weights(params["params"], F)
    got = cs_to_nhwc(
        drb_forward(nhwc_to_cs(x), ws, bs, F, H, W, interpret=True), B, H, W
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_kernel_nonsquare_batch(drb_setup):
    """S only needs to be a lane multiple: odd batch sizes work."""
    F, _, H, W, drb, _, params = drb_setup
    x = jax.random.normal(jax.random.PRNGKey(5), (3, H, W, F))
    want = drb.apply(params, x)
    ws, bs = pack_drb_weights(params["params"], F)
    got = cs_to_nhwc(
        drb_forward(nhwc_to_cs(x), ws, bs, F, H, W, interpret=True), 3, H, W
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
