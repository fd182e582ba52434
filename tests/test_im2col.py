"""Exactness tests for the im2col conv formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from conditional_score_diffusion_tpu.ops.im2col import conv3x3_im2col


@pytest.mark.parametrize("shape", [(2, 5, 5, 8, 8), (3, 10, 10, 4, 6), (1, 20, 20, 3, 5)])
def test_im2col_matches_direct(shape):
    B, H, W, C, K = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, K).astype(np.float32) * 0.1)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = jax.jit(conv3x3_im2col)(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
