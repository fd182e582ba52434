"""Whole-resblock fused Pallas kernel: exactness vs the XLA composition.

`resblock_fused_lowres` computes an entire eval resblock (GN0-SiLU-conv0
+temb, GN1-SiLU-conv1, shortcut+residual, optional skip_rescale) in one
VMEM pass with in-kernel GroupNorm statistics.  Interpret mode on CPU;
the compiled path is measured on TPU (`scripts/bench_eval_policy.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.ops.fused_block_pallas import (
    resblock_fused_lowres,
)


def _reference(x, p, num_groups0, num_groups1, skip_rescale):
    """XLA composition of the same eval resblock (NHWC)."""

    def gn(v, gamma, beta, G):
        B, H, W, C = v.shape
        vg = v.reshape(B, H, W, G, C // G).astype(jnp.float32)
        mean = jnp.mean(vg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(vg, axis=(1, 2, 4), keepdims=True)
        n = ((vg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(B, H, W, C)
        return n * gamma + beta

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    h = jax.nn.silu(gn(x, p["gamma0"], p["beta0"], num_groups0))
    h = conv(h, p["w0"]) + p["b0"] + p["temb_proj"][:, None, None, :]
    h = jax.nn.silu(gn(h, p["gamma1"], p["beta1"], num_groups1))
    h = conv(h, p["w1"]) + p["b1"]
    if p.get("ws") is not None:
        res = jnp.einsum("bhwc,cd->bhwd", x, p["ws"]) + p["bs"]
    else:
        res = x
    out = res + h
    return out * (1.0 / np.sqrt(2.0)) if skip_rescale else out


def _params(rng, cin, cout, with_shortcut, batch=4):
    p = {
        "gamma0": jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5),
        "beta0": jnp.asarray(rng.randn(cin).astype(np.float32) * 0.1),
        "w0": jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1),
        "b0": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
        "temb_proj": jnp.asarray(rng.randn(batch, cout).astype(np.float32) * 0.3),
        "gamma1": jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5),
        "beta1": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
        "w1": jnp.asarray(rng.randn(3, 3, cout, cout).astype(np.float32) * 0.1),
        "b1": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
        "ws": None,
        "bs": None,
    }
    if with_shortcut:
        p["ws"] = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.2)
        p["bs"] = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    return p


@pytest.mark.parametrize(
    "cin,cout,g0,g1,skip_rescale",
    [
        (16, 16, 4, 4, False),     # identity shortcut
        (16, 32, 4, 8, False),     # channel-mix shortcut
        (24, 24, 3, 3, True),      # groups not dividing lanes + rescale
    ],
)
def test_resblock_fused_matches_reference(cin, cout, g0, g1, skip_rescale):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 6, 6, cin).astype(np.float32))
    p = _params(rng, cin, cout, with_shortcut=cin != cout)

    ref = _reference(x, p, g0, g1, skip_rescale)
    got = resblock_fused_lowres(
        x,
        gamma0=p["gamma0"], beta0=p["beta0"], num_groups0=g0,
        w0=p["w0"], b0=p["b0"], temb_proj=p["temb_proj"],
        gamma1=p["gamma1"], beta1=p["beta1"], num_groups1=g1,
        w1=p["w1"], b1=p["b1"],
        shortcut_w=p["ws"], shortcut_b=p["bs"],
        skip_rescale=skip_rescale,
        interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_resblock_fused_no_temb():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 5, 16).astype(np.float32))
    p = _params(rng, 16, 16, with_shortcut=False)
    p["temb_proj"] = jnp.zeros((2, 16))
    ref = _reference(x, p, 4, 4, False)
    got = resblock_fused_lowres(
        x,
        gamma0=p["gamma0"], beta0=p["beta0"], num_groups0=4,
        w0=p["w0"], b0=p["b0"], temb_proj=None,
        gamma1=p["gamma1"], beta1=p["beta1"], num_groups1=4,
        w1=p["w1"], b1=p["b1"],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "ca,cb,cout,g0,skip_rescale",
    [
        (8, 8, 16, 4, False),    # identity residual over the concat
        (8, 8, 24, 4, True),     # channel-mix shortcut + rescale
        (6, 10, 16, 4, False),   # groups straddle the concat boundary
    ],
)
def test_resblock_fused_split_matches_reference(ca, cb, cout, g0, skip_rescale):
    """Split-skip variant == concat-then-block, with the concat virtual."""
    from conditional_score_diffusion_tpu.ops.fused_block_pallas import (
        resblock_fused_lowres_split,
    )

    cin = ca + cb
    rng = np.random.RandomState(3)
    xa = jnp.asarray(rng.randn(4, 6, 6, ca).astype(np.float32))
    xb = jnp.asarray(rng.randn(4, 6, 6, cb).astype(np.float32))
    p = _params(rng, cin, cout, with_shortcut=cin != cout)

    ref = _reference(jnp.concatenate([xa, xb], -1), p, g0, 4, skip_rescale)
    got = resblock_fused_lowres_split(
        xa, xb,
        gamma0=p["gamma0"], beta0=p["beta0"], num_groups0=g0,
        w0=p["w0"], b0=p["b0"], temb_proj=p["temb_proj"],
        gamma1=p["gamma1"], beta1=p["beta1"], num_groups1=4,
        w1=p["w1"], b1=p["b1"],
        shortcut_w=p["ws"], shortcut_b=p["bs"],
        skip_rescale=skip_rescale,
        interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_batch_chunking_exact():
    """GN statistics are per-sample, so any batch chunk size must give the
    same answer; force tiny chunks by shrinking the VMEM budget heuristic
    via a large spatial size."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(6, 4, 4, 8).astype(np.float32))
    p = _params(rng, 8, 8, with_shortcut=False, batch=6)
    ref = _reference(x, p, 2, 2, False)
    got = resblock_fused_lowres(
        x,
        gamma0=p["gamma0"], beta0=p["beta0"], num_groups0=2,
        w0=p["w0"], b0=p["b0"], temb_proj=p["temb_proj"],
        gamma1=p["gamma1"], beta1=p["beta1"], num_groups1=2,
        w1=p["w1"], b1=p["b1"],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
