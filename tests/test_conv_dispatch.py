"""Shape-gated conv dispatch: exactness + checkpoint compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.models import layers


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    layers.set_conv_dispatch(None)


def _apply(module, params, x):
    return module.apply({"params": params}, x)


@pytest.mark.parametrize("mode", ["im2col", "s2d4", "s2d_dense"])
def test_dispatch_matches_nn_conv(mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))

    layers.set_conv_dispatch(None)
    ref_mod = layers.conv3x3(10, name="conv")
    params = ref_mod.init(jax.random.key(0), x)["params"]
    ref = _apply(ref_mod, params, x)

    layers.set_conv_dispatch(lambda shape, out: mode)
    dis_mod = layers.conv3x3(10, name="conv")
    assert isinstance(dis_mod, layers.DispatchConv3x3)
    # the nn.Conv checkpoint loads into the dispatch module unchanged
    got = _apply(dis_mod, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_policy_gates_by_shape():
    calls = []

    def policy(shape, out):
        calls.append(shape)
        return "im2col" if shape[1] * shape[2] <= 400 else "xla"

    layers.set_conv_dispatch(policy)
    mod = layers.conv3x3(4, name="conv")
    x_small = jnp.zeros((1, 5, 5, 4))
    params = mod.init(jax.random.key(0), x_small)["params"]
    _apply(mod, params, x_small)
    assert calls and calls[-1] == (1, 5, 5, 4)


def test_full_model_exact_through_dispatch():
    """ddpm_paired forward is bit-comparable with dispatch on vs off."""
    import ml_collections

    from conditional_score_diffusion_tpu.models import init_model

    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(
        dict(continuous=True, sde="vesde", lightning_module="conditional",
             conditioning_approach="ours_NDV")
    )
    c.data = ml_collections.ConfigDict(
        dict(effective_image_size=8, centered=False, num_channels=6,
             shape_x=[3, 8, 8], shape_y=[3, 8, 8])
    )
    c.model = ml_collections.ConfigDict(
        dict(name="ddpm_paired", nf=16, ch_mult=(1, 2), num_res_blocks=1,
             attn_resolutions=(4,), dropout=0.0, resamp_with_conv=True,
             conditional=True, nonlinearity="swish", num_scales=100,
             sigma_min_x=0.05, sigma_max_x=5.0, sigma_min_y=0.01,
             sigma_max_y=0.5, input_channels=6, output_channels=6,
             ema_rate=0.999)
    )
    layers.set_conv_dispatch(None)
    module, params = init_model(c, jax.random.key(0))
    rng = np.random.RandomState(1)
    inp = {
        "x": jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32)),
        "y": jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32)),
    }
    t = jnp.asarray([0.3, 0.8])
    ref = module.apply({"params": params}, inp, t)

    layers.set_conv_dispatch(lambda shape, out: "im2col")
    module2, _ = init_model(c, jax.random.key(0))
    got = module2.apply({"params": params}, inp, t)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("mode", ["im2col", "s2d4"])
def test_split_conv_dispatch_exact(mode):
    """SplitConv3x3 under dispatch == joint nn.Conv on the concat."""
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))

    layers.set_conv_dispatch(None)
    joint = layers.conv3x3(5, name="conv")
    x = jnp.concatenate([a, b], axis=-1)
    params = joint.init(jax.random.key(0), x)["params"]
    ref = joint.apply({"params": params}, x)

    layers.set_conv_dispatch(lambda shape, out: mode)
    split = layers.SplitConv3x3(5, name="conv")
    got = split.apply({"params": params}, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_named_policies_gate_odd_and_oversize_shapes():
    """ADVICE round-3: s2d policies must reject odd spatial sizes (s2d
    halves H/W); the whole-block gate must not admit shapes the VMEM
    accounting never covered."""
    s2d = layers.NAMED_CONV_POLICIES["s2d_highres"]
    tuned = layers.NAMED_CONV_POLICIES["tuned"]
    assert s2d((1, 80, 80, 3), 64) == "s2d4"
    assert s2d((1, 81, 81, 3), 64) == "xla"
    assert tuned((1, 81, 81, 3), 64) == "xla"
    assert tuned((1, 160, 160, 3), 64) == "s2d4"

    gate = layers.fused_block_candidate_policy
    assert gate((1, 10, 10, 384), 384)
    assert gate((1, 5, 5, 192), 192)
    assert not gate((1, 11, 11, 128), 128)  # H*W<=128 used to admit this
    assert not gate((1, 16, 8, 64), 64)


def test_space_to_depth_rejects_odd_sizes():
    from conditional_score_diffusion_tpu.ops.space_to_depth import space_to_depth

    with pytest.raises(ValueError, match="even spatial"):
        space_to_depth(jnp.zeros((1, 81, 81, 3)))


def test_multiscale_reapplies_per_scale_policy():
    """ADVICE round-3: with several models in one process the last
    create_model wins — eval/multiscale re-applies each scale's knobs
    before tracing.  Simulate the create-all-then-trace pattern."""
    import ml_collections

    cfg_a = ml_collections.ConfigDict(dict(conv_dispatch="tuned"))
    cfg_b = ml_collections.ConfigDict(dict(conv_dispatch="none"))
    layers.apply_dispatch_config(cfg_a)
    layers.apply_dispatch_config(cfg_b)  # last-created wins: policy now None
    assert layers._CONV_DISPATCH["policy"] is None
    # the multiscale loop's fix: re-apply scale A right before its trace
    layers.apply_dispatch_config(cfg_a)
    assert layers._CONV_DISPATCH["policy"] is layers.NAMED_CONV_POLICIES["tuned"]
    layers.apply_dispatch_config(ml_collections.ConfigDict())
