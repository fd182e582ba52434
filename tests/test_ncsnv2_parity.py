"""NCSNv2 same-weights forward parity against the reference torch model.

NCSNv2's torch state dict uses semantic attribute names (res1/refine1/...),
so the port maps named modules rather than replaying construction order.
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


def _import_reference_ncsnv2():
    _stub_modules()
    sys.path.insert(0, REF)
    try:
        import models.ncsnv2 as ref_ncsnv2

        return ref_ncsnv2
    finally:
        sys.path.pop(0)


def _cfg():
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(
        dict(image_size=32, num_channels=3, centered=False)
    )
    c.model = ml_collections.ConfigDict(
        dict(name="ncsnv2_64", nf=16, num_scales=10,
             normalization="InstanceNorm++", nonlinearity="elu")
    )
    return c


def _conv(sd, p):
    return {
        "kernel": jnp.asarray(
            np.transpose(np.asarray(sd[f"{p}.weight"]), (2, 3, 1, 0))
        ),
        "bias": jnp.asarray(np.asarray(sd[f"{p}.bias"])),
    }


def _conv_nobias(sd, p):
    return {
        "kernel": jnp.asarray(
            np.transpose(np.asarray(sd[f"{p}.weight"]), (2, 3, 1, 0))
        )
    }


def _inpp(sd, p):
    out = {
        "alpha": jnp.asarray(np.asarray(sd[f"{p}.alpha"])),
        "gamma": jnp.asarray(np.asarray(sd[f"{p}.gamma"])),
    }
    if f"{p}.beta" in sd:
        out["beta"] = jnp.asarray(np.asarray(sd[f"{p}.beta"]))
    return out


def _residual_block(sd, p):
    out = {
        "norm0": _inpp(sd, f"{p}.normalize1"),
        "norm1": _inpp(sd, f"{p}.normalize2"),
        "conv0": _conv(sd, f"{p}.conv1"),
    }
    # conv2 is a plain conv (dilation/no-resample) or ConvMeanPool
    if f"{p}.conv2.weight" in sd:
        out["conv1"] = _conv(sd, f"{p}.conv2")
    else:
        out["conv1"] = {"conv": _conv(sd, f"{p}.conv2.conv")}
    if f"{p}.shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{p}.shortcut")
    elif f"{p}.shortcut.conv.weight" in sd:
        out["shortcut"] = {"conv": _conv(sd, f"{p}.shortcut.conv")}
    return out


def _rcu(sd, p, n_blocks, n_stages):
    out = {}
    for i in range(n_blocks):
        for j in range(n_stages):
            out[f"conv_{i}_{j}"] = _conv_nobias(sd, f"{p}.{i + 1}_{j + 1}_conv")
    return out


def _crp(sd, p, n_stages):
    return {f"conv{i}": _conv_nobias(sd, f"{p}.convs.{i}") for i in range(n_stages)}


def _msf(sd, p, n_inputs):
    return {f"conv{i}": _conv(sd, f"{p}.convs.{i}") for i in range(n_inputs)}


def _refine(sd, p, n_inputs, end=False):
    out = {
        f"adapt{i}": _rcu(sd, f"{p}.adapt_convs.{i}", 2, 2) for i in range(n_inputs)
    }
    out["crp"] = _crp(sd, f"{p}.crp", 2)
    out["out"] = _rcu(sd, f"{p}.output_convs", 3 if end else 1, 2)
    if n_inputs > 1:
        out["msf"] = _msf(sd, f"{p}.msf", n_inputs)
    return out


def port_ncsnv2_64(sd):
    params = {
        "begin_conv": _conv(sd, "begin_conv"),
        "end_conv": _conv(sd, "end_conv"),
        "normalizer": _inpp(sd, "normalizer"),
    }
    for li, name in enumerate(["res1", "res2", "res3", "res4"]):
        for bi in range(2):
            params[f"res{li}_{bi}"] = _residual_block(sd, f"{name}.{bi}")
    params["refine1"] = _refine(sd, "refine1", 1)
    params["refine2"] = _refine(sd, "refine2", 2)
    params["refine3"] = _refine(sd, "refine3", 2)
    params["refine4"] = _refine(sd, "refine4", 2, end=True)
    return params


def patch_reference_ncsn_bugs():
    """Make the reference NCSN-lineage models constructible/runnable.

    Upstream bug 1: ResidualBlock constructs the normalization with one
    argument (`layers.py:493`) but InstanceNorm2dPlus requires num_classes
    (`normalization.py:158`) -> reference NCSNv2 crashes at build.
    Upstream bug 2: dilated ncsn_conv3x3 keeps padding=1 (`layers.py:107`),
    shrinking feature maps and crashing the residual add (`layers.py:516`)
    — the original ermongroup code pads by the dilation.  Patch the oracle
    to SAME semantics (which our implementation uses).
    """
    import models.normalization as ref_norm

    if ref_norm.InstanceNorm2dPlus.__init__.__defaults__ == (True,):
        ref_norm.InstanceNorm2dPlus.__init__.__defaults__ = (None, True)
    import models.layers as ref_layers

    if not getattr(ref_layers, "_csdt_patched", False):
        _orig_conv3x3 = ref_layers.ncsn_conv3x3

        def _fixed(in_planes, out_planes, stride=1, bias=True, dilation=1,
                   init_scale=1.0, padding=None):
            if padding is None:
                padding = dilation
            return _orig_conv3x3(in_planes, out_planes, stride=stride, bias=bias,
                                 dilation=dilation, init_scale=init_scale,
                                 padding=padding)

        ref_layers.ncsn_conv3x3 = _fixed
        ref_layers._csdt_patched = True


def test_ncsnv2_64_forward_parity():
    ref = _import_reference_ncsnv2()
    patch_reference_ncsn_bugs()
    c = _cfg()
    tm = ref.NCSNv2(c)
    tm.eval()

    from conditional_score_diffusion_tpu.models.ncsnv2 import NCSNv2

    fm = NCSNv2.from_config(c)
    params = port_ncsnv2_64(tm.state_dict())

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), None).numpy()
    got = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), None)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4)
