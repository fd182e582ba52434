"""NCSN (v1, conditional) same-weights forward parity against the reference.

The reference `ncsn` is quadruply dead upstream: besides the two bugs
patched by `patch_reference_ncsn_bugs` it builds its normalizers from
``get_normalization(config)`` *unconditionally* (`ncsnv2.py:136`) — the
returned InstanceNorm2dPlus.forward takes (x) but every conditional block
calls norm(x, y) (`layers.py:447`), a TypeError at the first forward.  The
oracle here patches get_normalization to return the conditional class the
blocks expect (the original ermongroup behavior).
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

from test_ncsnv2_parity import (
    _conv,
    _conv_nobias,
    _import_reference_ncsnv2,
    patch_reference_ncsn_bugs,
)


def _cfg():
    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(
        dict(image_size=32, num_channels=3, centered=False)
    )
    c.model = ml_collections.ConfigDict(
        dict(name="ncsn", nf=16, num_scales=10,
             normalization="InstanceNorm++", nonlinearity="elu")
    )
    return c


def _cond_norm(sd, p, nf):
    """torch ConditionalInstanceNorm2dPlus embed -> flax Embed params.

    Our forward subtracts 1 from the beta chunk (init symmetry), so the
    ported beta chunk is shifted by +1."""
    w = np.asarray(sd[f"{p}.embed.weight"]).copy()  # [classes, 3*nf]
    w[:, 2 * nf :] += 1.0
    return {"embed": {"embedding": jnp.asarray(w)}}


def _cond_res(sd, p, nf_out):
    out = {
        "norm0": _cond_norm(sd, f"{p}.normalize1", _nfeat(sd, f"{p}.normalize1")),
        "norm1": _cond_norm(sd, f"{p}.normalize2", _nfeat(sd, f"{p}.normalize2")),
        "conv0": _conv(sd, f"{p}.conv1"),
    }
    if f"{p}.conv2.weight" in sd:
        out["conv1"] = _conv(sd, f"{p}.conv2")
    else:
        out["conv1"] = {"conv": _conv(sd, f"{p}.conv2.conv")}
    if f"{p}.shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{p}.shortcut")
    elif f"{p}.shortcut.conv.weight" in sd:
        out["shortcut"] = {"conv": _conv(sd, f"{p}.shortcut.conv")}
    return out


def _nfeat(sd, p):
    return np.asarray(sd[f"{p}.embed.weight"]).shape[1] // 3


def _cond_rcu(sd, p, n_blocks, n_stages):
    out = {}
    for i in range(n_blocks):
        for j in range(n_stages):
            out[f"norm_{i}_{j}"] = _cond_norm(
                sd, f"{p}.{i + 1}_{j + 1}_norm", _nfeat(sd, f"{p}.{i + 1}_{j + 1}_norm")
            )
            out[f"conv_{i}_{j}"] = _conv_nobias(sd, f"{p}.{i + 1}_{j + 1}_conv")
    return out


def _cond_crp(sd, p, n_stages):
    out = {}
    for i in range(n_stages):
        out[f"norm{i}"] = _cond_norm(sd, f"{p}.norms.{i}", _nfeat(sd, f"{p}.norms.{i}"))
        out[f"conv{i}"] = _conv_nobias(sd, f"{p}.convs.{i}")
    return out


def _cond_msf(sd, p, n_inputs):
    out = {}
    for i in range(n_inputs):
        out[f"norm{i}"] = _cond_norm(sd, f"{p}.norms.{i}", _nfeat(sd, f"{p}.norms.{i}"))
        out[f"conv{i}"] = _conv(sd, f"{p}.convs.{i}")
    return out


def _cond_refine(sd, p, n_inputs, end=False):
    out = {
        f"adapt{i}": _cond_rcu(sd, f"{p}.adapt_convs.{i}", 2, 2)
        for i in range(n_inputs)
    }
    out["crp"] = _cond_crp(sd, f"{p}.crp", 2)
    out["out"] = _cond_rcu(sd, f"{p}.output_convs", 3 if end else 1, 2)
    if n_inputs > 1:
        out["msf"] = _cond_msf(sd, f"{p}.msf", n_inputs)
    return out


def port_ncsn(sd, nf):
    params = {
        "begin_conv": _conv(sd, "begin_conv"),
        "end_conv": _conv(sd, "end_conv"),
        "normalizer": _cond_norm(sd, "normalizer", nf),
    }
    for li, name in enumerate(["res1", "res2", "res3", "res4"]):
        for bi in range(2):
            params[f"res{li}_{bi}"] = _cond_res(sd, f"{name}.{bi}", nf)
    params["refine1"] = _cond_refine(sd, "refine1", 1)
    params["refine2"] = _cond_refine(sd, "refine2", 2)
    params["refine3"] = _cond_refine(sd, "refine3", 2)
    params["refine4"] = _cond_refine(sd, "refine4", 2, end=True)
    return params


def test_ncsn_forward_parity():
    ref = _import_reference_ncsnv2()
    patch_reference_ncsn_bugs()
    # Upstream bug 3: NCSN builds normalizers via get_normalization(config)
    # with conditional=False (`ncsnv2.py:136`) but calls them as norm(x, y).
    # Give the oracle the conditional class its blocks expect.
    import models.normalization as ref_norm

    orig_get_normalization = ref.get_normalization
    ref.get_normalization = lambda config, conditional=False: (
        ref_norm.ConditionalInstanceNorm2dPlus
    )
    try:
        c = _cfg()
        torch.manual_seed(0)
        tm = ref.NCSN(c)
        tm.eval()
    finally:
        # scope the patch to oracle construction: models.ncsnv2 is shared
        # with the (unconditional) NCSNv2 parity test
        ref.get_normalization = orig_get_normalization

    from conditional_score_diffusion_tpu.models.ncsnv2 import NCSN

    fm = NCSN.from_config(c)
    params = port_ncsn(tm.state_dict(), c.model.nf)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    labels = np.array([0, 7])
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    got = fm.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(labels),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4)
