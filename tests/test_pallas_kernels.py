"""Pallas FIR kernels vs the XLA upfirdn formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.ops import downsample_2d, upsample_2d
from conditional_score_diffusion_tpu.ops.fused_act import fused_leaky_relu
from conditional_score_diffusion_tpu.ops.pallas_kernels import (
    fir_downsample2,
    fir_upsample2,
    fused_leaky_relu_pallas,
)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 12, 5)])
def test_fir_upsample2_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = upsample_2d(x, k=[1, 3, 3, 1], factor=2)
    got = fir_upsample2(x, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 12, 5)])
def test_fir_downsample2_matches_xla(shape):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = downsample_2d(x, k=[1, 3, 3, 1], factor=2)
    got = fir_downsample2(x, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_leaky_relu_pallas_matches_jnp():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    want = fused_leaky_relu(x, b)
    got = fused_leaky_relu_pallas(x, b, interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv3x3_pallas_matches_xla_interpret():
    from conditional_score_diffusion_tpu.ops.conv_pallas import conv3x3_pallas, _xla_conv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    np.testing.assert_allclose(
        conv3x3_pallas(x, w, True), _xla_conv(x, w), atol=1e-4
    )
    # backward agrees with XLA's conv VJP
    f = lambda x, w: jnp.sum(conv3x3_pallas(x, w, True) ** 2)
    g = lambda x, w: jnp.sum(_xla_conv(x, w) ** 2)
    gx1, gw1 = jax.grad(f, (0, 1))(x, w)
    gx2, gw2 = jax.grad(g, (0, 1))(x, w)
    np.testing.assert_allclose(gx1, gx2, atol=1e-3)
    np.testing.assert_allclose(gw1, gw2, atol=1e-3)
