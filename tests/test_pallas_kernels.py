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


class TestFusedGNSiLUConv:
    """Fused GroupNorm+SiLU+conv3x3 kernel (`ops/fused_block_pallas.py`) vs
    the XLA composition, interpret mode (compiled path benched on TPU)."""

    def _check(self, B, H, W, Cin, Cout, groups, dtype, with_bias, with_temb):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from conditional_score_diffusion_tpu.ops.fused_block_pallas import (
            gn_silu_conv3x3_nhwc,
            gn_silu_conv3x3_reference,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32), dtype)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.1, dtype)
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, Cin).astype(np.float32))
        beta = jnp.asarray(rng.uniform(-0.2, 0.2, Cin).astype(np.float32))
        bias = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1) if with_bias else None
        temb = jnp.asarray(rng.randn(B, Cout).astype(np.float32) * 0.1) if with_temb else None

        got = gn_silu_conv3x3_nhwc(x, w, gamma, beta, groups, bias=bias, temb=temb, interpret=True)
        want = gn_silu_conv3x3_reference(x, w, gamma, beta, groups, bias=bias, temb=temb)
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol,
        )

    def test_f32_plain(self):
        import jax.numpy as jnp

        self._check(2, 8, 8, 16, 24, 4, jnp.float32, False, False)

    def test_f32_bias_temb(self):
        import jax.numpy as jnp

        self._check(2, 12, 12, 8, 8, 2, jnp.float32, True, True)

    def test_bf16_resblock_shape(self):
        import jax.numpy as jnp

        # low-res-tail shape class (20x20, wide channels, groups=32-style)
        self._check(2, 10, 10, 32, 32, 8, jnp.bfloat16, True, True)

    def test_multi_tile_h(self):
        import jax.numpy as jnp

        # force several H tiles so the halo masking logic is exercised at
        # tile seams (H=16 with a small VMEM budget still fits in one tile,
        # so use a tall skinny input)
        self._check(1, 32, 4, 8, 8, 2, jnp.float32, True, False)
