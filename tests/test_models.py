"""Model shape/registry tests on tiny configurations."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from conditional_score_diffusion_tpu import registry
from conditional_score_diffusion_tpu.models import create_model, example_inputs, init_model
from conditional_score_diffusion_tpu.models.ddpm import squeeze2x


def tiny_ddpm_config(name="ddpm", conditional_approach=None, image_size=16):
    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict()
    c.training.sde = "vesde"
    if conditional_approach:
        c.training.conditioning_approach = conditional_approach
    c.data = ml_collections.ConfigDict()
    c.data.image_size = image_size
    c.data.effective_image_size = image_size
    c.data.centered = False
    c.data.shape_x = [3, image_size, image_size]
    c.data.shape_y = [3, image_size, image_size]
    c.data.shape = [3, image_size, image_size]
    c.data.num_channels = 6 if conditional_approach else 3
    c.data.target_resolution = image_size
    c.data.scale = 2
    c.model = ml_collections.ConfigDict()
    c.model.name = name
    c.model.nf = 8
    c.model.ch_mult = (1, 2)
    c.model.num_res_blocks = 1
    c.model.attn_resolutions = (8,)
    c.model.dropout = 0.0
    c.model.resamp_with_conv = True
    c.model.conditional = True
    c.model.nonlinearity = "swish"
    c.model.output_channels = c.data.num_channels
    c.model.input_channels = c.data.num_channels
    c.model.fir = True
    c.model.fir_kernel = [1, 3, 3, 1]
    c.model.skip_rescale = True
    c.model.resblock_type = "biggan"
    c.model.progressive = "output_skip"
    c.model.progressive_input = "input_skip"
    c.model.progressive_combine = "sum"
    c.model.embedding_type = "positional"
    c.model.init_scale = 0.0
    c.model.fourier_scale = 16
    return c


def test_registry_has_reference_names():
    for name in ["ncsnpp", "ncsnpp_paired", "ncsnpp_2xSR", "ncsnpp_KxSR",
                 "ddpm", "ddpm_paired", "ddpm_paired_SR3", "ddpm_2xSR",
                 "ddpm_KxSR", "fcn"]:
        assert name in registry.models, name


def test_fcn_forward():
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(
        dict(name="fcn", state_size=2, hidden_layers=2, hidden_nodes=32, dropout=0.1)
    )
    m = create_model(c)
    params = m.init(jax.random.key(0), jnp.zeros((4, 2)), jnp.zeros((4,)))["params"]
    out = m.apply({"params": params}, jnp.ones((4, 2)), jnp.full((4,), 0.5))
    assert out.shape == (4, 2)


def test_ddpm_forward_shape():
    c = tiny_ddpm_config("ddpm")
    module, params = init_model(c, jax.random.key(0))
    x = jnp.ones((2, 16, 16, 3))
    out = module.apply({"params": params}, x, jnp.zeros((2,)))
    # output_channels = num_channels = 3 here
    assert out.shape == (2, 16, 16, c.model.output_channels)


def test_ddpm_paired_returns_dict():
    c = tiny_ddpm_config("ddpm_paired", conditional_approach="ours_NDV")
    module, params = init_model(c, jax.random.key(0))
    inputs = {"x": jnp.ones((2, 16, 16, 3)), "y": jnp.ones((2, 16, 16, 3))}
    out = module.apply({"params": params}, inputs, jnp.zeros((2,)))
    assert set(out) == {"x", "y"}
    assert out["x"].shape == (2, 16, 16, 3)
    assert out["y"].shape == (2, 16, 16, 3)


def test_ddpm_sr3_returns_array():
    c = tiny_ddpm_config("ddpm_paired_SR3", conditional_approach="sr3")
    module, params = init_model(c, jax.random.key(0))
    inputs = {"x": jnp.ones((2, 16, 16, 3)), "y": jnp.ones((2, 16, 16, 3))}
    out = module.apply({"params": params}, inputs, jnp.zeros((2,)))
    # SR3 model outputs num_channels = 6 channels and returns them raw
    assert out.shape == (2, 16, 16, 6)


def test_squeeze2x_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    z = squeeze2x(x)
    assert z.shape == (2, 4, 4, 12)
    np.testing.assert_allclose(squeeze2x(z, reverse=True), x)


@pytest.mark.parametrize("progressive,progressive_input,resblock,fir",
                         [("output_skip", "input_skip", "biggan", True),
                          ("none", "none", "ddpm", False),
                          ("residual", "residual", "biggan", True)])
def test_ncsnpp_forward_variants(progressive, progressive_input, resblock, fir):
    c = tiny_ddpm_config("ncsnpp")
    c.model.progressive = progressive
    c.model.progressive_input = progressive_input
    c.model.resblock_type = resblock
    c.model.fir = fir
    module, params = init_model(c, jax.random.key(0))
    x = jnp.ones((2, 16, 16, 3))
    out = module.apply({"params": params}, x, jnp.full((2,), 10.0))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ncsnpp_fourier_embedding():
    c = tiny_ddpm_config("ncsnpp")
    c.model.embedding_type = "fourier"
    module, params = init_model(c, jax.random.key(0))
    x = jnp.ones((1, 16, 16, 3))
    out = module.apply({"params": params}, x, jnp.log(jnp.full((1,), 5.0)))
    assert out.shape == (1, 16, 16, 3)


def test_ncsnpp_paired_split():
    c = tiny_ddpm_config("ncsnpp_paired", conditional_approach="ours_NDV")
    module, params = init_model(c, jax.random.key(0))
    inputs = {"x": jnp.ones((1, 16, 16, 3)), "y": jnp.ones((1, 16, 16, 3))}
    out = module.apply({"params": params}, inputs, jnp.zeros((1,)))
    assert out["x"].shape == (1, 16, 16, 3) and out["y"].shape == (1, 16, 16, 3)


def test_dropout_rng_changes_train_output():
    # Tested on FCN: in the U-Nets, dropout feeds a conv initialized at scale
    # 1e-10 (the reference's init_scale=0 convention), so its effect is
    # invisible at init by design.
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(
        dict(name="fcn", state_size=2, hidden_layers=1, hidden_nodes=32, dropout=0.5)
    )
    m = create_model(c)
    params = m.init(jax.random.key(0), jnp.zeros((4, 2)), jnp.zeros((4,)))["params"]
    x, t = jnp.ones((4, 2)), jnp.zeros((4,))
    o1 = m.apply({"params": params}, x, t, train=True, rngs={"dropout": jax.random.key(1)})
    o2 = m.apply({"params": params}, x, t, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(o1, o2)
