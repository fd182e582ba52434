"""DDPM3D same-weights forward parity against the reference torch model.

The reference 3-D model (`models/ddpm3D.py:38-195`) only runs with
``resamp_with_conv=False``: its upsampling path reuses the 2-D ``Upsample``
(`models/ddpm3D.py:30,100`) whose conv is ``nn.Conv2d``
(`models/layers.py:593-605`) and crashes on 5-D tensors when with_conv=True.
The parity config therefore uses parameter-free resampling, which still
exercises the 3-D resblocks (conv shortcuts), pooling, nearest upsampling,
GroupNorm and the time embedding.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

import jax.numpy as jnp
import ml_collections

from test_reference_parity import _stub_modules


def _import_reference_ddpm3d():
    _stub_modules()
    sys.path.insert(0, REF)
    try:
        import models.ddpm3D as ref_ddpm3d

        return ref_ddpm3d
    finally:
        sys.path.pop(0)


def _cfg():
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(dict(centered=False, effective_image_size=8))
    c.model = ml_collections.ConfigDict(
        dict(name="ddpm3D", nf=32, ch_mult=(1, 2), num_res_blocks=1,
             dropout=0.0, resamp_with_conv=False, conditional=True,
             input_channels=1, output_channels=1, nonlinearity="swish")
    )
    return c


def test_ddpm3d_forward_parity():
    ref = _import_reference_ddpm3d()
    c = _cfg()
    torch.manual_seed(0)
    tm = ref.DDPM3D(c)
    tm.eval()

    from conditional_score_diffusion_tpu.models.ddpm3d import DDPM3D
    from conditional_score_diffusion_tpu.models.torch_port import (
        port_reference_ddpm3d_state_dict,
    )

    fm = DDPM3D.from_config(c)
    params = port_reference_ddpm3d_state_dict(tm.state_dict(), c)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 1, 8, 8, 8).astype(np.float32)  # NCDHW
    labels = np.array([3.0, 40.0], np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    got = fm.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # NDHWC
        jnp.asarray(labels),
    )
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_lightning_checkpoint_loader_ports_ddpm3d(tmp_path):
    """--mode-train-resume path: a reference .ckpt for ddpm3D_paired ports
    into this framework through load_reference_lightning_checkpoint."""
    ref = _import_reference_ddpm3d()
    c = _cfg()
    c.model.name = "ddpm3D_paired"
    c.model.input_channels = 2
    c.model.output_channels = 2
    torch.manual_seed(1)
    tm = ref.DDPM3D_paired(c)
    tm.eval()
    ckpt = {"state_dict": {f"score_model.{k}": v for k, v in tm.state_dict().items()}}
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, str(path))

    from conditional_score_diffusion_tpu.models import get_model
    from conditional_score_diffusion_tpu.models.torch_port import (
        load_reference_lightning_checkpoint,
    )

    params = load_reference_lightning_checkpoint(str(path), c)
    fm = get_model("ddpm3D_paired").from_config(c)
    rng = np.random.RandomState(1)
    x = rng.rand(1, 1, 8, 8, 8).astype(np.float32)
    y = rng.rand(1, 1, 8, 8, 8).astype(np.float32)
    labels = np.array([7.0], np.float32)
    with torch.no_grad():
        want = tm({"x": torch.from_numpy(x), "y": torch.from_numpy(y)},
                  torch.from_numpy(labels))
    inputs = {"x": jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
              "y": jnp.asarray(y.transpose(0, 2, 3, 4, 1))}
    got = fm.apply({"params": params}, inputs, jnp.asarray(labels))
    np.testing.assert_allclose(
        np.asarray(got["x"]).transpose(0, 4, 1, 2, 3), want["x"].numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["y"]).transpose(0, 4, 1, 2, 3), want["y"].numpy(), atol=5e-4
    )
