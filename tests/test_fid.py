"""FID math + Inception architecture tests (random weights; the pretrained
pt_inception weights are unavailable offline, so activation parity is
checked structurally: tap shapes and determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.eval.fid import (
    activation_statistics,
    fid_from_activations,
    frechet_distance,
    joint_fid_from_activations,
)
from conditional_score_diffusion_tpu.eval.inception import create_inception


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    acts = rng.randn(500, 16)
    mu, sigma = activation_statistics(acts)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_mean_shift():
    # Equal covariances (identity), mean shift d: FID = ||d||^2.
    rng = np.random.RandomState(1)
    a = rng.randn(20000, 4)
    b = a + np.array([1.0, 0, 0, 0])
    fid = fid_from_activations(a, b)
    np.testing.assert_allclose(fid, 1.0, atol=0.05)


def test_joint_fid_detects_conditional_mismatch():
    """Marginals of x identical, but (y,x) correlation broken -> JFID >> FID."""
    rng = np.random.RandomState(2)
    y = rng.randn(5000, 4)
    x = y.copy()                      # perfectly correlated real pairs
    sample = np.roll(y, 1, axis=0)    # same marginal, decorrelated from y
    fid = fid_from_activations(x, sample)
    jfid = joint_fid_from_activations(y, x, sample)
    assert fid < 0.05
    assert jfid > 1.0


@pytest.mark.parametrize("blocks,dims", [((3,), (2048,)), ((0, 2), (64, 768))])
def test_inception_tap_shapes(blocks, dims):
    apply_fn, params = create_inception(blocks)
    x = jnp.zeros((2, 64, 64, 3))
    outs = jax.jit(lambda p, x: apply_fn(p, x))(params, x)
    assert len(outs) == len(blocks)
    for out, d in zip(outs, dims):
        assert out.shape[-1] == d
        assert out.shape[0] == 2


def test_inception_deterministic():
    apply_fn, params = create_inception((3,))
    x = jnp.ones((1, 32, 32, 3)) * 0.3
    a = apply_fn(params, x)[0]
    b = apply_fn(params, x)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fid_parity_runbook():
    """The north-star FID-parity number is one command away when weights
    land (VERDICT round-2 item 8): with CSDT_INCEPTION_WEIGHTS set this
    runs the full two-framework comparison and asserts <1%; without it,
    the script must exit 0 with an explicit SKIPPED reason."""
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "fid_parity.py")],
        capture_output=True, text=True, cwd=repo, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    gated = not os.environ.get("CSDT_INCEPTION_WEIGHTS")
    if gated:
        assert "SKIPPED" in r.stdout, r.stdout
        import pytest as _pytest

        _pytest.skip("inception weights egress-gated; runbook skip path verified")
    assert "PASSED" in r.stdout, r.stdout
