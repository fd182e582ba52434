"""Split-skip decoder blocks (`model.split_skip_convs`): the virtual-concat
path (SplitGroupNorm/SplitConv3x3/SplitNIN) must be numerically exact vs the
joint concat path and share its parameter layout (checkpoints
interchangeable)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from conditional_score_diffusion_tpu.models.ddpm import DDPM
from conditional_score_diffusion_tpu.models.layers import (
    NIN,
    SplitConv3x3,
    SplitGroupNorm,
    SplitNIN,
    conv3x3,
    legacy_group_norm,
)


class TestSplitModules:
    def test_split_group_norm_matches_joint(self):
        # 96 + 96 channels, 32 groups: boundary on a group edge
        a = jax.random.normal(jax.random.key(0), (2, 8, 8, 96))
        b = jax.random.normal(jax.random.key(1), (2, 8, 8, 96))
        cat = jnp.concatenate([a, b], -1)
        gn = legacy_group_norm(192)
        p = gn.init(jax.random.key(2), cat)
        ref = gn.apply(p, cat)
        sgn = SplitGroupNorm(32)
        na, nb = sgn.apply(p, a, b)
        got = jnp.concatenate([na, nb], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_split_group_norm_straddling_boundary(self):
        # 192 + 96 = 288 channels, 32 groups -> group size 9; the boundary
        # at 192 falls INSIDE group 21 — stats must combine across halves.
        a = 2.0 + jax.random.normal(jax.random.key(0), (2, 4, 4, 192))
        b = -1.0 + 0.5 * jax.random.normal(jax.random.key(1), (2, 4, 4, 96))
        cat = jnp.concatenate([a, b], -1)
        gn = legacy_group_norm(288)
        p = gn.init(jax.random.key(2), cat)
        ref = gn.apply(p, cat)
        na, nb = SplitGroupNorm(32).apply(p, a, b)
        got = jnp.concatenate([na, nb], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_split_conv3x3_matches_joint(self):
        a = jax.random.normal(jax.random.key(0), (2, 8, 8, 24))
        b = jax.random.normal(jax.random.key(1), (2, 8, 8, 40))
        cat = jnp.concatenate([a, b], -1)
        conv = conv3x3(16)
        p = conv.init(jax.random.key(2), cat)
        ref = conv.apply(p, cat)
        got = SplitConv3x3(16).apply(p, a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_split_nin_matches_joint(self):
        a = jax.random.normal(jax.random.key(0), (2, 8, 8, 24))
        b = jax.random.normal(jax.random.key(1), (2, 8, 8, 40))
        cat = jnp.concatenate([a, b], -1)
        nin = NIN(16)
        p = nin.init(jax.random.key(2), cat)
        ref = nin.apply(p, cat)
        got = SplitNIN(16).apply(p, a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


class TestSplitSkipDDPM:
    @pytest.fixture(scope="class")
    def built(self):
        kw = dict(
            nf=32, ch_mult=(1, 2, 2), num_res_blocks=2, attn_resolutions=(8,),
            dropout=0.0, resamp_with_conv=True, image_size=32, conditional=True,
            centered=True, output_channels=3,
        )
        joint = DDPM(**kw, split_skip_convs=False)
        split = DDPM(**kw, split_skip_convs=True)
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
        t = jnp.array([0.3, 0.7])
        params = joint.init(jax.random.key(1), x, t)["params"]
        return joint, split, params, x, t

    def test_param_layouts_identical(self, built):
        joint, split, params, x, t = built
        p_split = split.init(jax.random.key(1), x, t)["params"]
        shapes = lambda p: jtu.tree_map(lambda a: a.shape, p)
        assert shapes(params) == shapes(p_split)

    def test_forward_exact(self, built):
        joint, split, params, x, t = built
        oj = joint.apply({"params": params}, x, t)
        os_ = split.apply({"params": params}, x, t)
        scale = float(jnp.abs(oj).max())
        assert float(jnp.abs(oj - os_).max()) <= 1e-5 * max(scale, 1e-8) + 1e-9

    def test_grads_flow_and_match(self, built):
        joint, split, params, x, t = built

        def loss(m, p):
            return jnp.sum(m.apply({"params": p}, x, t) ** 2)

        gj = jax.grad(lambda p: loss(joint, p))(params)
        gs = jax.grad(lambda p: loss(split, p))(params)
        flat_j = jnp.concatenate([g.ravel() for g in jtu.tree_leaves(gj)])
        flat_s = jnp.concatenate([g.ravel() for g in jtu.tree_leaves(gs)])
        denom = float(jnp.abs(flat_j).max())
        assert float(jnp.abs(flat_j - flat_s).max()) <= 1e-4 * max(denom, 1e-8)


class TestSplitSkipNCSNpp:
    def _make(self, resblock_type, split):
        import ml_collections

        from conditional_score_diffusion_tpu.models.ncsnpp import NCSNpp

        c = ml_collections.ConfigDict(
            dict(
                model=dict(
                    name="ncsnpp", nf=32, ch_mult=(1, 2), num_res_blocks=2,
                    attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
                    conditional=True, fir=True, fir_kernel=[1, 3, 3, 1],
                    skip_rescale=True, resblock_type=resblock_type,
                    progressive="none", progressive_input="none",
                    embedding_type="positional", init_scale=0.0,
                    fourier_scale=16, progressive_combine="sum",
                    nonlinearity="swish", split_skip_convs=split,
                ),
                data=dict(effective_image_size=16, centered=True, num_channels=3),
            )
        )
        return NCSNpp.from_config(c)

    @pytest.mark.parametrize("resblock_type", ["biggan", "ddpm"])
    def test_forward_exact_and_layout(self, resblock_type):
        joint = self._make(resblock_type, split=False)
        split = self._make(resblock_type, split=True)
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        t = jnp.array([0.3, 0.7])
        pj = joint.init(jax.random.key(1), x, t)["params"]
        ps = split.init(jax.random.key(1), x, t)["params"]
        shapes = lambda p: jtu.tree_map(lambda a: a.shape, p)
        assert shapes(pj) == shapes(ps)
        oj = joint.apply({"params": pj}, x, t)
        os_ = split.apply({"params": pj}, x, t)
        scale = float(jnp.abs(oj).max())
        assert float(jnp.abs(oj - os_).max()) <= 1e-5 * max(scale, 1e-8) + 1e-9


class TestSplitSkipDDPM3D:
    def test_forward_exact_and_layout(self):
        from conditional_score_diffusion_tpu.models.ddpm3d import DDPM3D

        kw = dict(
            nf=16, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0,
            resamp_with_conv=True, conditional=True, centered=True,
            output_channels=1,
        )
        joint = DDPM3D(**kw, split_skip_convs=False)
        split = DDPM3D(**kw, split_skip_convs=True)
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8, 1))
        t = jnp.array([0.3, 0.7])
        pj = joint.init(jax.random.key(1), x, t)["params"]
        ps = split.init(jax.random.key(1), x, t)["params"]
        shapes = lambda p: jtu.tree_map(lambda a: a.shape, p)
        assert shapes(pj) == shapes(ps)
        oj = joint.apply({"params": pj}, x, t)
        os_ = split.apply({"params": pj}, x, t)
        scale = float(jnp.abs(oj).max())
        assert float(jnp.abs(oj - os_).max()) <= 1e-5 * max(scale, 1e-8) + 1e-9
