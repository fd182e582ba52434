"""Metric tests against independent oracles (cv2, reference bicubic)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.eval.metrics import (
    diversity,
    get_consistency_fn,
    mean_psnr,
    mean_ssim,
    psnr,
    ssim,
)
from conditional_score_diffusion_tpu.ops.resize import imresize, resize_matrix

cv2 = pytest.importorskip("cv2")


def _ssim_oracle(img1, img2):
    """cv2-based SSIM exactly as reference `evaluation_tools.py:93-114`."""
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    s2 = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean()


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 10.0 / 255.0)
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20 * np.log10(255.0 / 10.0), rtol=1e-5)


def test_psnr_identical_is_inf():
    a = jnp.ones((1, 8, 8, 1)) * 0.5
    assert np.isinf(float(psnr(a, a)[0]))


def test_ssim_matches_cv2_oracle():
    rng = np.random.RandomState(0)
    a = rng.rand(1, 32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(1, 32, 32, 3).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
    want = np.mean(
        [_ssim_oracle(a[0, :, :, c] * 255, b[0, :, :, c] * 255) for c in range(3)]
    )
    np.testing.assert_allclose(ours, want, atol=2e-4)


def test_ssim_self_is_one():
    rng = np.random.RandomState(1)
    a = rng.rand(2, 24, 24, 3).astype(np.float32)
    vals = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(vals, 1.0, atol=1e-6)


def test_resize_matrix_rows_sum_to_one():
    for in_s, out_s in [(160, 20), (20, 160), (32, 32), (17, 5)]:
        M = resize_matrix(in_s, out_s)
        np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=1e-5)


def test_imresize_identity():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    np.testing.assert_allclose(imresize(x, scale=1.0), x, atol=1e-5)


def test_imresize_constant_preserved():
    x = jnp.full((1, 32, 32, 3), 0.37)
    y = imresize(x, scale=0.25)
    assert y.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(y, 0.37, atol=1e-5)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/bicubic_pytorch.py"),
    reason="reference oracle not available",
)
def test_imresize_matches_matlab_reference():
    """Oracle: the reference's standalone MATLAB-compatible imresize
    (`bicubic_pytorch.py` — core.imresize with kernel='cubic')."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        import bicubic_pytorch as ref
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(3)
    x = rng.rand(3, 32, 32).astype(np.float32)  # CHW for the reference
    for scale in (0.5, 0.25, 2.0):
        want = ref.imresize(torch.from_numpy(x), scale=scale).numpy()
        got = imresize(jnp.asarray(x.transpose(1, 2, 0)), scale=scale)
        got = np.asarray(got).transpose(2, 0, 1)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_diversity():
    draws = jnp.stack([jnp.zeros((2, 4, 4, 1)), jnp.ones((2, 4, 4, 1))])
    np.testing.assert_allclose(diversity(draws), 0.5, atol=1e-6)


def test_sr_consistency_fn():
    fn = get_consistency_fn("super-resolution")
    rng = np.random.RandomState(4)
    hr = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    val_same = fn(hr, hr, scale=4)
    assert np.isinf(val_same) or val_same > 50


def test_inpainting_consistency_fn():
    fn = get_consistency_fn("inpainting")
    rng = np.random.RandomState(5)
    gt = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:8, 4:8, :].set(1.0)
    samples = gt * (1 - mask) + 0.5 * mask  # differs only inside the mask
    assert np.isinf(fn(samples, gt, mask)) or fn(samples, gt, mask) > 50


def test_image_to_image_consistency_fn():
    fn = get_consistency_fn("image-to-image")
    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = fn(a, a)
    assert np.isinf(v) or v > 50


class TestMetricPrecision:
    """Metric-path matmuls/convs must request HIGHEST precision: TPU default
    (bf16-pass) conv precision corrupts SSIM's E[x^2]-mu^2 variance terms at
    the [0,255] working scale (measured 0.795 vs 0.881 on the same data) and
    perturbs resize-based consistency PSNR."""

    def test_ssim_conv_requests_highest(self):
        import jax

        from conditional_score_diffusion_tpu.eval.metrics import ssim

        a = jnp.zeros((1, 16, 16, 3))
        jaxpr = str(jax.make_jaxpr(ssim)(a, a))
        assert "HIGHEST" in jaxpr

    def test_imresize_requests_highest(self):
        import jax

        from conditional_score_diffusion_tpu.ops.resize import imresize

        a = jnp.zeros((1, 16, 16, 3))
        jaxpr = str(jax.make_jaxpr(lambda x: imresize(x, scale=0.5))(a))
        assert "HIGHEST" in jaxpr
