"""Tests for TPU-native ops against an independent numpy oracle.

The oracle reimplements the documented upfirdn semantics (zero-stuff
upsample -> pad -> convolve -> stride-slice; spec: reference
`op/upfirdn2d.py:159-200`) directly in numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from conditional_score_diffusion_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    fused_leaky_relu,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)


def upfirdn2d_oracle(x_nhwc, kernel, up=1, down=1, pad=(0, 0)):
    """Numpy reference: per channel, upsample->pad->convolve->downsample."""
    B, H, W, C = x_nhwc.shape
    out = []
    for b in range(B):
        chans = []
        for c in range(C):
            img = np.asarray(x_nhwc[b, :, :, c], dtype=np.float64)
            # zero-stuff upsample to H*up x W*up (trailing zeros included)
            u = np.zeros((H * up, W * up))
            u[::up, ::up] = img
            # pad (can be negative -> crop)
            p0, p1 = pad
            u = np.pad(u, ((max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0))))
            if p0 < 0:
                u = u[-p0:, -p0:]
            if p1 < 0:
                u = u[:p1, :p1]
            # correlate with flipped kernel == convolve with kernel
            f = signal.convolve2d(u, np.asarray(kernel, dtype=np.float64), mode="valid")
            chans.append(f[::down, ::down])
        out.append(np.stack(chans, axis=-1))
    return np.stack(out)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2))])
def test_upfirdn2d_matches_oracle_separable(up, down, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    k = setup_kernel([1, 3, 3, 1])
    got = upfirdn2d(x, k, up=up, down=down, pad=pad)
    want = upfirdn2d_oracle(x, k, up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upfirdn2d_matches_oracle_nonseparable():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    k = rng.randn(3, 3).astype(np.float32)  # full-rank kernel
    got = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    want = upfirdn2d_oracle(x, k, up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_2d_shape_and_dc_gain():
    x = jnp.ones((1, 8, 8, 1))
    y = upsample_2d(x, k=[1, 3, 3, 1], factor=2)
    assert y.shape == (1, 16, 16, 1)
    # Constant input must stay constant (gain normalization) away from borders.
    np.testing.assert_allclose(y[0, 4:12, 4:12, 0], 1.0, atol=1e-5)


def test_downsample_2d_shape_and_dc_gain():
    x = jnp.ones((1, 16, 16, 1))
    y = downsample_2d(x, k=[1, 3, 3, 1], factor=2)
    assert y.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(y[0, 2:6, 2:6, 0], 1.0, atol=1e-5)


def _transpose_conv_oracle(x, w, factor):
    """Numpy zero-stuff + full-pad + correlate (the fused up-conv first stage)."""
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    out = np.zeros((B, (H - 1) * factor + kh, (W - 1) * factor + kw, O))
    u = np.zeros((B, H * factor - (factor - 1) + 2 * (kh - 1), W * factor - (factor - 1) + 2 * (kw - 1), C))
    u[:, kh - 1 : kh - 1 + H * factor - (factor - 1) : factor,
      kw - 1 : kw - 1 + W * factor - (factor - 1) : factor, :] = np.asarray(x)
    for o in range(O):
        acc = np.zeros(out.shape[1:3])
        for b in range(B):
            acc = sum(
                signal.correlate2d(u[b, :, :, c], np.asarray(w[:, :, c, o]), mode="valid")
                for c in range(C)
            )
            out[b, :, :, o] = acc
    return out


def test_upsample_conv_matches_oracle_and_unfused_interior():
    """Fused upsample+conv: exact vs numpy oracle of the same chain; equal to
    upsample_2d + SAME conv away from borders (fused pads once, so borders
    legitimately differ — same as the reference CUDA path)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    fused = upsample_conv_2d(x, w, k=[1, 3, 3, 1])
    assert fused.shape == (1, 16, 16, 4)

    # Exact oracle: transpose-conv stage then upfirdn with the fused padding.
    k4 = setup_kernel([1, 3, 3, 1]) * 4.0
    p = (k4.shape[0] - 2) - (3 - 1)
    stage1 = _transpose_conv_oracle(x, w, factor=2)
    want = upfirdn2d_oracle(stage1, k4, pad=((p + 1) // 2 + 1, p // 2 + 1))
    np.testing.assert_allclose(fused, want, atol=1e-4)

    # Interior equality with the unfused composition.
    up = upsample_2d(x, k=[1, 3, 3, 1], factor=2)
    unfused = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(fused[:, 2:-2, 2:-2], unfused[:, 2:-2, 2:-2], atol=1e-4)


def test_conv_downsample_equals_unfused_interior():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    fused = conv_downsample_2d(x, w, k=[1, 3, 3, 1])
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    unfused = downsample_2d(conv, k=[1, 3, 3, 1], factor=2)
    assert fused.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(fused[:, 1:-1, 1:-1], unfused[:, 1:-1, 1:-1], atol=1e-4)


def test_naive_up_down():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = naive_upsample_2d(x)
    assert up.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(up[0, 0, 0, 0], up[0, 1, 1, 0])
    down = naive_downsample_2d(up)
    np.testing.assert_allclose(down, x)


def test_upfirdn2d_is_differentiable():
    k = setup_kernel([1, 3, 3, 1])
    f = lambda x: jnp.sum(upfirdn2d(x, k, up=2, pad=(2, 1)) ** 2)
    g = jax.grad(f)(jnp.ones((1, 4, 4, 2)))
    assert g.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_leaky_relu():
    x = jnp.array([[-1.0, 1.0]])
    b = jnp.array([0.5, 0.5])
    out = fused_leaky_relu(x, b)
    np.testing.assert_allclose(
        out, np.array([[-0.5 * 0.2, 1.5]]) * np.sqrt(2.0), rtol=1e-6
    )
