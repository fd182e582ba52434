"""NCSN++ same-weights forward parity against the reference torch model.

The CUDA `op` package is replaced by a torch implementation of the
documented upfirdn semantics (zero-stuff -> pad -> convolve -> decimate) so
the FIR paths run on CPU.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

import jax.numpy as jnp
import ml_collections

from test_reference_parity import _stub_modules  # noqa: E402


def _torch_upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Torch implementation of the upfirdn spec (NCHW)."""
    import torch.nn.functional as F

    B, C, H, W = x.shape
    kh, kw = kernel.shape
    v = x.reshape(B * C, 1, H, W)
    if up > 1:
        z = torch.zeros(B * C, 1, H, up, W, up, dtype=x.dtype)
        z[:, :, :, 0, :, 0] = v.reshape(B * C, 1, H, W)
        # torch can't scatter like that directly; build via zero-interleave
        u = torch.zeros(B * C, 1, H * up, W * up, dtype=x.dtype)
        u[:, :, ::up, ::up] = v
        v = u
    p0, p1 = pad
    v = F.pad(v, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
    if p0 < 0:
        v = v[:, :, -p0:, -p0:]
    if p1 < 0:
        v = v[:, :, :p1, :p1]
    w = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw).to(x.dtype)
    v = F.conv2d(v, w)
    v = v[:, :, ::down, ::down]
    return v.reshape(B, C, v.shape[2], v.shape[3])


def _install_op_stub():
    _stub_modules()
    op_stub = sys.modules["op"]
    op_stub.upfirdn2d = _torch_upfirdn2d


def _import_reference_ncsnpp():
    _install_op_stub()
    sys.path.insert(0, REF)
    try:
        import models.ncsnpp as ref_ncsnpp

        return ref_ncsnpp
    finally:
        sys.path.pop(0)


def _config(fir, progressive, progressive_input, resblock_type="biggan",
            embedding_type="positional"):
    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(dict(continuous=True))
    c.data = ml_collections.ConfigDict(
        dict(effective_image_size=16, centered=False, num_channels=3)
    )
    c.model = ml_collections.ConfigDict(
        dict(name="ncsnpp", nf=32, ch_mult=(1, 2), num_res_blocks=1,
             attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
             conditional=True, fir=fir, fir_kernel=[1, 3, 3, 1],
             skip_rescale=True, resblock_type=resblock_type,
             progressive=progressive, progressive_input=progressive_input,
             progressive_combine="sum", embedding_type=embedding_type,
             init_scale=0.0, fourier_scale=16, nonlinearity="swish")
    )
    return c


@pytest.mark.parametrize(
    "fir,prog,prog_in,resblock,emb",
    [
        (False, "none", "none", "biggan", "positional"),
        # NOTE: the reference's ddpm-resblock-type resampling is broken
        # upstream in BOTH branches (non-FIR: F.interpolate gets 'nearest'
        # as scale_factor, `layerspp.py:117`; FIR: torch rejects the
        # negative-step slice in `up_or_down_sampling.py:126`), so no
        # torch-side oracle exists for it — its configs never ran upstream.
        # Our implementation of both branches is tested standalone in
        # tests/test_models.py.
        (True, "output_skip", "residual", "biggan", "positional"),
        (True, "output_skip", "input_skip", "biggan", "positional"),
        (True, "none", "residual", "biggan", "fourier"),
    ],
)
def test_ncsnpp_forward_parity(fir, prog, prog_in, resblock, emb):
    ref_ncsnpp = _import_reference_ncsnpp()
    c = _config(fir, prog, prog_in, resblock, emb)
    tm = ref_ncsnpp.NCSNpp(c)
    tm.eval()

    from conditional_score_diffusion_tpu.models.ncsnpp import NCSNpp
    from conditional_score_diffusion_tpu.models.torch_port_ncsnpp import (
        port_reference_ncsnpp_state_dict,
    )

    fm = NCSNpp.from_config(c)
    params = port_reference_ncsnpp_state_dict(tm.state_dict(), c)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 16, 16).astype(np.float32)
    if emb == "fourier":
        cond = np.log(np.array([0.5, 7.0], np.float32))
    else:
        cond = np.array([10.0, 500.0], np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(cond)).numpy()

    got = fm.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(cond),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4)
