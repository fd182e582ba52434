"""Exactness tests for the space-to-depth conv recasts (BENCH_NOTES round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from conditional_score_diffusion_tpu.ops.space_to_depth import (
    conv3x3_via_s2d_4way,
    conv3x3_via_s2d_dense,
    depth_to_space,
    space_to_depth,
)


def _direct(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_s2d_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


@pytest.mark.parametrize("shape", [(2, 8, 8, 4, 4), (1, 12, 10, 3, 7), (3, 6, 6, 8, 8)])
def test_dense_recast_exact(shape):
    B, H, W, C, K = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, K).astype(np.float32) * 0.1)
    ref = _direct(x, w)
    got = conv3x3_via_s2d_dense(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 8, 8, 4, 4), (1, 12, 10, 3, 7), (3, 6, 6, 8, 8)])
def test_4way_recast_exact(shape):
    B, H, W, C, K = shape
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, K).astype(np.float32) * 0.1)
    ref = _direct(x, w)
    got = conv3x3_via_s2d_4way(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_recasts_jit_with_traced_weights():
    # the jnp kernel constructions must trace (no numpy fallback inside jit)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.1)
    ref = _direct(x, w)
    got_d = jax.jit(conv3x3_via_s2d_dense)(x, w)
    got_4 = jax.jit(conv3x3_via_s2d_4way)(x, w)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_4), np.asarray(ref), rtol=1e-5, atol=1e-5)
