"""Loss-function tests: analytic expectations and branch behavior."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from conditional_score_diffusion_tpu.losses import (
    build_loss_fn,
    get_general_sde_loss_fn,
    get_smld_loss_fn,
    get_inverse_problem_smld_loss_fn,
)
from conditional_score_diffusion_tpu.models import create_model
from conditional_score_diffusion_tpu.sde import VESDE, batch_mul


class _ZeroModule:
    """Stand-in module whose apply returns zeros shaped like the input."""

    embedding_type = "positional"

    def apply(self, variables, inputs, labels, train=False, rngs=None):
        if isinstance(inputs, dict):
            return {k: jnp.zeros_like(v) for k, v in inputs.items()}
        return jnp.zeros_like(inputs)


class _ScaledNoisePredictor:
    """Module returning -z_hat*std ... here: returns inputs*0 (see zero test)."""


def test_unconditional_loss_value_for_zero_model():
    """With model output 0, score = 0, so likelihood-weighted loss is
    E[g(t)^2 * mean(z^2/std^2)] — check against a direct Monte-Carlo of the
    same expression computed from the identical rng stream."""
    sde = VESDE(sigma_min=0.1, sigma_max=5.0, N=100)
    module = _ZeroModule()
    loss_fn = get_general_sde_loss_fn(module, conditional=False, train=False,
                                      reduce_mean=True, likelihood_weighting=True)
    batch = jnp.zeros((64, 8))
    rng = jax.random.key(0)
    loss = loss_fn({}, sde, batch, rng)

    # recompute manually with the same rng splitting scheme
    rng_t, rng_z, rng_train = jax.random.split(rng, 3)
    t = jax.random.uniform(rng_t, (64,), minval=1e-5, maxval=sde.T)
    z = jax.random.normal(rng_z, batch.shape)
    _, std = sde.marginal_prob(batch, t)
    g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
    expected = jnp.mean(jnp.mean((z / std[:, None]) ** 2, axis=-1) * g2)
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)


def test_perfect_score_gives_smaller_loss_than_zero_score():
    """A module predicting the true noise direction must beat the zero model."""
    sde = VESDE(sigma_min=0.1, sigma_max=5.0, N=100)

    class _Perfect:
        embedding_type = "positional"

        def apply(self, variables, inputs, labels, train=False, rngs=None):
            # For pure-noise data x_t = std * z: true score = -x_t/std^2;
            # the wrapper divides by std, so the net must output -x_t/std.
            # Unconditional VE continuous models receive std itself as the
            # time conditioning (reference models/utils.py:250).
            std = labels
            return -batch_mul(1.0 / std, inputs)

    batch = jnp.zeros((128, 4))  # data == 0 => x_t = std*z exactly
    rng = jax.random.key(1)
    zero_loss = get_general_sde_loss_fn(_ZeroModule(), conditional=False, train=False)(
        {}, sde, batch, rng
    )
    perfect_loss = get_general_sde_loss_fn(_Perfect(), conditional=False, train=False)(
        {}, sde, batch, rng
    )
    assert float(perfect_loss) < 1e-6
    assert float(zero_loss) > 1.0


def test_multispeed_loss_runs_and_weights_domains():
    sde = {
        "x": VESDE(sigma_min=0.01, sigma_max=10.0, N=100),
        "y": VESDE(sigma_min=0.01, sigma_max=0.5, N=100),
    }
    module = _ZeroModule()
    loss_fn = get_general_sde_loss_fn(module, conditional=True, train=False)
    batch = {"x": jnp.zeros((32, 6)), "y": jnp.zeros((32, 6))}
    loss = loss_fn({}, sde, batch, jax.random.key(0))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_sr3_loss_keeps_y_clean():
    sde = VESDE(sigma_min=0.01, sigma_max=10.0, N=100)
    seen = {}

    class _Spy:
        embedding_type = "positional"

        def apply(self, variables, inputs, labels, train=False, rngs=None):
            seen["y"] = inputs["y"]
            return jnp.zeros_like(inputs["x"])

    loss_fn = get_general_sde_loss_fn(_Spy(), conditional=True, train=False)
    y = jnp.full((8, 3), 7.0)
    batch = {"x": jnp.zeros((8, 3)), "y": y}
    loss_fn({}, sde, batch, jax.random.key(0))
    np.testing.assert_array_equal(seen["y"], y)  # y enters the net unperturbed


def test_discrete_smld_loss_finite():
    sde = VESDE(sigma_min=0.1, sigma_max=5.0, N=50)
    loss_fn = get_smld_loss_fn(_ZeroModule(), train=False)
    loss = loss_fn({}, sde, jnp.zeros((16, 4)), jax.random.key(0))
    assert np.isfinite(float(loss))


def test_discrete_inverse_problem_smld_loss_finite():
    sde = {
        "x": VESDE(sigma_min=0.1, sigma_max=5.0, N=50),
        "y": VESDE(sigma_min=0.1, sigma_max=0.5, N=50),
    }
    loss_fn = get_inverse_problem_smld_loss_fn(_ZeroModule(), train=False)
    loss = loss_fn({}, sde, {"x": jnp.zeros((16, 4)), "y": jnp.zeros((16, 4))},
                   jax.random.key(0))
    assert np.isfinite(float(loss))


def test_loss_differentiable_through_real_model():
    """End-to-end grad through the FCN on the unconditional continuous loss."""
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(
        dict(name="fcn", state_size=2, hidden_layers=1, hidden_nodes=16, dropout=0.0)
    )
    module = create_model(c)
    params = module.init(jax.random.key(0), jnp.zeros((4, 2)), jnp.zeros((4,)))["params"]
    sde = VESDE(sigma_min=0.01, sigma_max=5.0, N=100)
    loss_fn = get_general_sde_loss_fn(module, conditional=False, train=True)
    batch = jax.random.normal(jax.random.key(1), (32, 2))

    val, grads = jax.value_and_grad(
        lambda p: loss_fn(p, sde, batch, jax.random.key(2))
    )(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
