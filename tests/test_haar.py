"""Haar wavelet ops: orthonormality, round-trip, band semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from conditional_score_diffusion_tpu.ops.haar import (
    _H,
    get_dc_coefficients,
    get_hf_coefficients,
    haar_backward,
    haar_forward,
    haar_forward_2d,
    haar_inverse_2d,
    multi_level_haar_forward,
    permute_channels,
)


def test_haar_matrix_is_orthonormal():
    np.testing.assert_allclose(_H @ _H.T, np.eye(4), atol=1e-7)


def test_roundtrip_exact():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32))
    np.testing.assert_allclose(haar_backward(haar_forward(x)), x, atol=1e-6)
    np.testing.assert_allclose(haar_inverse_2d(haar_forward_2d(x)), x, atol=1e-6)


def test_energy_preserved():
    """Orthonormal transform preserves the L2 norm."""
    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 3).astype(np.float32))
    z = haar_forward(x)
    np.testing.assert_allclose(float(jnp.sum(x**2)), float(jnp.sum(z**2)), rtol=1e-5)


def test_dc_of_constant_and_hf_zero():
    c = jnp.full((1, 4, 4, 3), 0.5)
    np.testing.assert_allclose(get_dc_coefficients(c), 1.0, atol=1e-6)  # 2x value
    np.testing.assert_allclose(get_hf_coefficients(c), 0.0, atol=1e-6)


def test_permute_roundtrip():
    z = jnp.asarray(np.random.RandomState(2).rand(1, 4, 4, 12).astype(np.float32))
    np.testing.assert_allclose(
        permute_channels(permute_channels(z, True), False), z
    )


def test_band_major_layout():
    """After haar_forward, channels [:C] are the DC band."""
    x = jnp.asarray(np.random.RandomState(3).rand(1, 8, 8, 3).astype(np.float32))
    z = haar_forward(x)
    dc = z[..., :3]
    # DC of each 2x2 block = mean * 2
    blocks = np.asarray(x).reshape(1, 4, 2, 4, 2, 3).mean(axis=(2, 4)) * 2
    np.testing.assert_allclose(np.asarray(dc), blocks, atol=1e-5)


def test_multi_level_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    a, d = multi_level_haar_forward(x, 3)
    assert a.shape == (2, 4, 4, 3) and d.shape == (2, 4, 4, 9)
