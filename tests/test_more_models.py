"""Shape tests for NCSNv2/NCSN, DDPM3D, and the normalization zoo."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from conditional_score_diffusion_tpu import registry
from conditional_score_diffusion_tpu.models import get_model
from conditional_score_diffusion_tpu.models.normalization import (
    ConditionalInstanceNorm2dPlus,
    InstanceNorm2dPlus,
    VarianceNorm2d,
)
from conditional_score_diffusion_tpu.models.ncsnv2 import bilinear_resize_align_corners


def _ncsnv2_config(image_size=32):
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(
        dict(image_size=image_size, num_channels=3, centered=False)
    )
    c.model = ml_collections.ConfigDict(
        dict(nf=16, num_scales=10, normalization="InstanceNorm++", nonlinearity="elu")
    )
    return c


def test_registry_has_legacy_names():
    for name in ["ncsnv2_64", "ncsnv2_128", "ncsnv2_256", "ncsn",
                 "ddpm3D", "ddpm3D_paired", "ddpm3D_paired_SR3"]:
        assert name in registry.models, name


@pytest.mark.parametrize("name,size", [("ncsnv2_64", 32), ("ncsnv2_128", 32), ("ncsnv2_256", 64)])
def test_ncsnv2_forward(name, size):
    c = _ncsnv2_config(size)
    m = get_model(name).from_config(c)
    x = jnp.ones((1, size, size, 3))
    params = m.init(jax.random.key(0), x, None)["params"]
    out = m.apply({"params": params}, x, None)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_ncsn_conditional_forward():
    c = _ncsnv2_config(32)
    m = get_model("ncsn").from_config(c)
    x = jnp.ones((2, 32, 32, 3))
    labels = jnp.array([0, 5])
    params = m.init(jax.random.key(0), x, labels)["params"]
    out = m.apply({"params": params}, x, labels)
    assert out.shape == x.shape
    # different noise labels must change the output (conditional norm works)
    out2 = m.apply({"params": params}, x, jnp.array([5, 0]))
    assert not np.allclose(out, out2)


def test_ddpm3d_forward():
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(dict(centered=False))
    c.model = ml_collections.ConfigDict(
        dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0,
             resamp_with_conv=True, conditional=True, output_channels=1,
             nonlinearity="swish")
    )
    m = get_model("ddpm3D").from_config(c)
    x = jnp.ones((1, 8, 8, 8, 1))
    t = jnp.zeros((1,))
    params = m.init(jax.random.key(0), x, t)["params"]
    out = m.apply({"params": params}, x, t)
    assert out.shape == (1, 8, 8, 8, 1)


def test_ddpm3d_paired_dict():
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(dict(centered=False))
    c.model = ml_collections.ConfigDict(
        dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0,
             resamp_with_conv=True, conditional=True, output_channels=2,
             nonlinearity="swish")
    )
    m = get_model("ddpm3D_paired").from_config(c)
    inputs = {"x": jnp.ones((1, 8, 8, 8, 1)), "y": jnp.ones((1, 8, 8, 8, 1))}
    t = jnp.zeros((1,))
    params = m.init(jax.random.key(0), inputs, t)["params"]
    out = m.apply({"params": params}, inputs, t)
    assert out["x"].shape == (1, 8, 8, 8, 1) and out["y"].shape == (1, 8, 8, 8, 1)


def test_instance_norm_plus_statistics():
    m = InstanceNorm2dPlus(4)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4)) * 3 + 1
    params = m.init(jax.random.key(1), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_variance_norm_unit_variance():
    m = VarianceNorm2d(3)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3)) * 5
    params = {"alpha": jnp.ones((3,))}
    out = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out.var(axis=(1, 2))), 1.0, atol=0.01)


def test_conditional_instance_norm_plus_depends_on_class():
    m = ConditionalInstanceNorm2dPlus(4, num_classes=10)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    params = m.init(jax.random.key(1), x, jnp.array([0, 1]))["params"]
    o1 = m.apply({"params": params}, x, jnp.array([0, 1]))
    o2 = m.apply({"params": params}, x, jnp.array([1, 0]))
    assert not np.allclose(o1, o2)


def test_bilinear_align_corners_against_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(1, 5, 7, 2).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(11, 13),
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(bilinear_resize_align_corners(jnp.asarray(x), (11, 13)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ddpm_multi_speed_haar_roundtrip_shapes():
    """The working realization of the reference's unfinished
    ddpm_multi_speed_haar: haar dict in -> haar dict out, invertibly
    consistent shapes at depth 2."""
    from conditional_score_diffusion_tpu.ops.haar import haar_forward
    from test_models import tiny_ddpm_config

    c = tiny_ddpm_config("ddpm_multi_speed_haar")
    c.model.output_channels = 3
    c.model.input_channels = 3
    c.data.max_haar_depth = 2
    m = get_model("ddpm_multi_speed_haar").from_config(c)

    img = jnp.ones((2, 16, 16, 3))
    z1 = haar_forward(img)
    a1, d1 = z1[..., :3], z1[..., 3:]
    z2 = haar_forward(a1)
    a2, d2 = z2[..., :3], z2[..., 3:]
    haar_x = {"d1": d1, "d2": d2, "a2": a2}

    t = jnp.zeros((2,))
    params = m.init(jax.random.key(0), haar_x, t)["params"]
    out = m.apply({"params": params}, haar_x, t)
    assert set(out) == {"d1", "d2", "a2"}
    assert out["d1"].shape == d1.shape
    assert out["d2"].shape == d2.shape
    assert out["a2"].shape == a2.shape
