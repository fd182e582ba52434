"""Deterministic numerical parity against the actual reference code (torch
CPU), where importable.

These tests run only when /root/reference is mounted.  They are the
strongest parity evidence available without trained checkpoints: the same
weights produce the same outputs.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import ml_collections


def _import_reference_sde_lib():
    sys.path.insert(0, REF)
    try:
        import sde_lib as ref_sde

        return ref_sde
    finally:
        sys.path.pop(0)


def _stub_modules():
    """Stub the reference's heavyweight deps that aren't in this image:
    pytorch_lightning (LightningModule -> nn.Module) and the CUDA `op`
    package (never called for the models under test)."""
    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")
        pl_stub.LightningModule = torch.nn.Module
        pl_stub.LightningDataModule = object
        sys.modules["pytorch_lightning"] = pl_stub
    if "op" not in sys.modules:
        op_stub = types.ModuleType("op")

        def _unavailable(*a, **k):
            raise RuntimeError("CUDA op stub called")

        op_stub.upfirdn2d = _unavailable
        op_stub.fused_leaky_relu = _unavailable
        sys.modules["op"] = op_stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")

        class _Resize:  # only instantiated by KxSR variants (not under test)
            def __init__(self, *a, **k):
                pass

        class _Interp:
            BILINEAR = "bilinear"
            BICUBIC = "bicubic"
            NEAREST = "nearest"

        tv_t.Resize = _Resize
        tv_f.InterpolationMode = _Interp
        tv_f.rgb_to_grayscale = lambda x: x.mean(dim=1, keepdim=True)
        tv.transforms = tv_t
        tv_t.functional = tv_f
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f
    if "iunets" not in sys.modules:
        iu = types.ModuleType("iunets")
        iu_layers = types.ModuleType("iunets.layers")
        iu_layers.InvertibleDownsampling2D = object
        iu.layers = iu_layers
        sys.modules["iunets"] = iu
        sys.modules["iunets.layers"] = iu_layers


def _import_reference_ddpm():
    """Import the reference DDPM model with non-installed deps stubbed."""
    _stub_modules()
    sys.path.insert(0, REF)
    try:
        import models.ddpm as ref_ddpm

        return ref_ddpm
    finally:
        sys.path.pop(0)


class TestSdeParity:
    def test_vesde_marginal_and_discretize(self):
        ref_sde = _import_reference_sde_lib()
        r = ref_sde.VESDE(sigma_min=0.02, sigma_max=30.0, N=100)

        from conditional_score_diffusion_tpu.sde import VESDE

        o = VESDE(sigma_min=0.02, sigma_max=30.0, N=100)

        t = np.array([0.0, 0.123, 0.5, 0.999], np.float32)
        x = np.random.RandomState(0).randn(4, 3).astype(np.float32)

        rm, rs = r.marginal_prob(torch.from_numpy(x), torch.from_numpy(t))
        om, os_ = o.marginal_prob(jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(os_), rs.numpy(), rtol=1e-5)

        rf, rg = r.discretize(torch.from_numpy(x), torch.from_numpy(t))
        of, og = o.discretize(jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(of), rf.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(og), rg.numpy(), rtol=1e-4)

        _, rdiff = r.sde(torch.from_numpy(x), torch.from_numpy(t))
        _, odiff = o.sde(jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(odiff), rdiff.numpy(), rtol=1e-5)

    def test_vesde_backward_kernel(self):
        ref_sde = _import_reference_sde_lib()
        r = ref_sde.VESDE(sigma_min=0.02, sigma_max=30.0, N=100)
        from conditional_score_diffusion_tpu.sde import VESDE

        o = VESDE(sigma_min=0.02, sigma_max=30.0, N=100)
        rng = np.random.RandomState(1)
        x0 = rng.randn(3, 2).astype(np.float32)
        xt = rng.randn(3, 2).astype(np.float32)
        t = np.array([0.2, 0.5, 0.8], np.float32)
        tau = np.full(3, 0.01, np.float32)
        rm, rs = r.compute_backward_kernel(
            torch.from_numpy(x0), torch.from_numpy(xt),
            torch.from_numpy(t), torch.from_numpy(tau),
        )
        om, os_ = o.compute_backward_kernel(
            jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t), jnp.asarray(tau)
        )
        np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(os_), rs.numpy(), rtol=1e-4)

    def test_vpsde_parity(self):
        ref_sde = _import_reference_sde_lib()
        r = ref_sde.VPSDE(beta_min=0.1, beta_max=20.0, N=100)
        from conditional_score_diffusion_tpu.sde import VPSDE

        o = VPSDE(beta_0=0.1, beta_1=20.0, N=100)
        t = np.array([0.01, 0.4, 0.95], np.float32)
        x = np.ones((3, 2), np.float32)
        rm, rs = r.marginal_prob(torch.from_numpy(x), torch.from_numpy(t))
        om, os_ = o.marginal_prob(jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(os_), rs.numpy(), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(o.discrete_betas), r.discrete_betas.numpy(), rtol=1e-6
        )


class TestTimestepEmbeddingParity:
    def test_embedding_matches(self):
        _stub_modules()
        sys.path.insert(0, REF)
        try:
            from models import layers as ref_layers
        finally:
            sys.path.pop(0)
        from conditional_score_diffusion_tpu.models.layers import get_timestep_embedding

        t = np.array([0.0, 1.0, 57.3, 999.0], np.float32)
        want = ref_layers.get_timestep_embedding(torch.from_numpy(t), 64).numpy()
        got = np.asarray(get_timestep_embedding(jnp.asarray(t), 64))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestDDPMForwardParity:
    """Same weights -> same outputs: port a reference torch DDPM to Flax and
    compare forwards to float tolerance."""

    def _config(self):
        c = ml_collections.ConfigDict()
        c.data = ml_collections.ConfigDict(
            dict(effective_image_size=16, centered=False)
        )
        c.model = ml_collections.ConfigDict(
            dict(name="ddpm", nf=32, ch_mult=(1, 2), num_res_blocks=2,
                 attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
                 conditional=True, nonlinearity="swish",
                 input_channels=3, output_channels=3)
        )
        return c

    def test_forward_parity(self):
        ref_ddpm = _import_reference_ddpm()
        c = self._config()
        tm = ref_ddpm.DDPM(c)
        tm.eval()

        from conditional_score_diffusion_tpu.models.ddpm import DDPM
        from conditional_score_diffusion_tpu.models.torch_port import (
            port_reference_ddpm_state_dict,
        )

        fm = DDPM.from_config(c)
        params = port_reference_ddpm_state_dict(tm.state_dict(), c)

        rng = np.random.RandomState(0)
        x = rng.rand(2, 3, 16, 16).astype(np.float32)  # NCHW in [0,1]
        labels = np.array([3.0, 700.0], np.float32)

        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(labels)).numpy()

        got = fm.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(labels),
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestPairedPortParity:
    def test_ddpm_paired_forward_parity(self):
        ref_ddpm = _import_reference_ddpm()
        c = ml_collections.ConfigDict()
        c.data = ml_collections.ConfigDict(dict(effective_image_size=16, centered=False))
        c.model = ml_collections.ConfigDict(
            dict(name="ddpm_paired", nf=32, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
                 conditional=True, nonlinearity="swish",
                 input_channels=6, output_channels=6)
        )
        tm = ref_ddpm.DDPM_paired(c)
        tm.eval()

        from conditional_score_diffusion_tpu.models.ddpm import DDPMPaired
        from conditional_score_diffusion_tpu.models.torch_port import (
            port_reference_ddpm_paired,
        )

        fm = DDPMPaired.from_config(c)
        params = port_reference_ddpm_paired(tm.state_dict(), c)

        rng = np.random.RandomState(0)
        x = rng.rand(2, 3, 16, 16).astype(np.float32)
        y = rng.rand(2, 3, 16, 16).astype(np.float32)
        labels = np.array([10.0, 500.0], np.float32)
        with torch.no_grad():
            want = tm(
                {"x": torch.from_numpy(x), "y": torch.from_numpy(y)},
                torch.from_numpy(labels),
            )
        got = fm.apply(
            {"params": params},
            {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
             "y": jnp.asarray(y.transpose(0, 2, 3, 1))},
            jnp.asarray(labels),
        )
        for k in ("x", "y"):
            np.testing.assert_allclose(
                np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(), atol=2e-4
            )


def test_lightning_checkpoint_loader(tmp_path):
    """Full user flow: a Lightning-format .ckpt from the reference loads
    into Flax params via load_reference_lightning_checkpoint."""
    ref_ddpm = _import_reference_ddpm()
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(dict(effective_image_size=16, centered=False))
    c.model = ml_collections.ConfigDict(
        dict(name="ddpm_paired", nf=32, ch_mult=(1, 2), num_res_blocks=1,
             attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
             conditional=True, nonlinearity="swish",
             input_channels=6, output_channels=6)
    )
    tm = ref_ddpm.DDPM_paired(c)
    ckpt = {
        "state_dict": {f"score_model.{k}": v for k, v in tm.state_dict().items()},
        "epoch": 3,
    }
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)

    from conditional_score_diffusion_tpu.models.ddpm import DDPMPaired
    from conditional_score_diffusion_tpu.models.torch_port import (
        load_reference_lightning_checkpoint,
    )

    params = load_reference_lightning_checkpoint(path, c)
    fm = DDPMPaired.from_config(c)
    out = fm.apply(
        {"params": params},
        {"x": jnp.zeros((1, 16, 16, 3)), "y": jnp.zeros((1, 16, 16, 3))},
        jnp.zeros((1,)),
    )
    assert out["x"].shape == (1, 16, 16, 3)
