"""Port reference PyTorch NCSN++ checkpoints to Flax params.

Like `torch_port.py` but for the NCSN++ family: the reference builds a flat
``all_modules`` list whose order depends on config (fourier/positional,
ddpm/biggan blocks, progressive modes — `models/ncsnpp.py:74-236`); this
module replays that order and emits the named Flax tree of
`models/ncsnpp.py:NCSNpp`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _t(a):
    return jnp.asarray(np.asarray(a))


def _conv_oihw(sd, prefix):
    return {
        "kernel": _t(np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _linear(sd, prefix):
    return {"kernel": _t(np.asarray(sd[f"{prefix}.weight"]).T), "bias": _t(sd[f"{prefix}.bias"])}


def _gn(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _nin(sd, prefix):
    return {"dense": {"kernel": _t(sd[f"{prefix}.W"]), "bias": _t(sd[f"{prefix}.b"])}}


def _attnpp(sd, i):
    p = f"all_modules.{i}"
    return {
        "norm": _gn(sd, f"{p}.GroupNorm_0"),
        "q": _nin(sd, f"{p}.NIN_0"),
        "k": _nin(sd, f"{p}.NIN_1"),
        "v": _nin(sd, f"{p}.NIN_2"),
        "out": _nin(sd, f"{p}.NIN_3"),
    }


def _resblockpp(sd, i, resblock_type):
    p = f"all_modules.{i}"
    out = {
        "norm0": _gn(sd, f"{p}.GroupNorm_0"),
        "conv0": _conv_oihw(sd, f"{p}.Conv_0"),
        "norm1": _gn(sd, f"{p}.GroupNorm_1"),
        "conv1": _conv_oihw(sd, f"{p}.Conv_1"),
    }
    if f"{p}.Dense_0.weight" in sd:
        out["temb_proj"] = _linear(sd, f"{p}.Dense_0")
    if f"{p}.Conv_2.weight" in sd:
        out["shortcut"] = _conv_oihw(sd, f"{p}.Conv_2")
    elif f"{p}.NIN_0.W" in sd:
        out["shortcut"] = _nin(sd, f"{p}.NIN_0")
    return out


def _resample(sd, i, fir):
    """layerspp Upsample/Downsample with conv."""
    p = f"all_modules.{i}"
    if fir:
        # up_or_down_sampling.Conv2d: raw weight (out,in,k,k) + bias
        return {
            "conv_w": _t(np.transpose(np.asarray(sd[f"{p}.Conv2d_0.weight"]), (2, 3, 1, 0))),
            "conv_b": _t(sd[f"{p}.Conv2d_0.bias"]),
        }
    return {"conv": _conv_oihw(sd, f"{p}.Conv_0")}


def port_reference_ncsnpp_state_dict(sd: Dict, config) -> Dict:
    sd = dict(sd)
    m = config.model
    ch_mult = tuple(m.ch_mult)
    num_res_blocks = m.num_res_blocks
    num_resolutions = len(ch_mult)
    attn_resolutions = tuple(m.attn_resolutions)
    all_res = [config.data.effective_image_size // (2**i) for i in range(num_resolutions)]
    resblock_type = m.resblock_type.lower()
    progressive = m.progressive.lower()
    progressive_input = m.progressive_input.lower()
    embedding_type = m.embedding_type.lower()
    fir = m.fir

    params: Dict = {}
    idx = 0
    if embedding_type == "fourier":
        params["fourier"] = {"W": _t(sd[f"all_modules.{idx}.W"])}
        idx += 1
    if m.conditional:
        params["temb0"] = _linear(sd, f"all_modules.{idx}"); idx += 1
        params["temb1"] = _linear(sd, f"all_modules.{idx}"); idx += 1

    params["conv_in"] = _conv_oihw(sd, f"all_modules.{idx}"); idx += 1

    # Downsampling (reference `ncsnpp.py:152-178`)
    for l in range(num_resolutions):
        for b in range(num_res_blocks):
            params[f"down_{l}_{b}"] = _resblockpp(sd, idx, resblock_type); idx += 1
            if all_res[l] in attn_resolutions:
                params[f"down_attn_{l}_{b}"] = _attnpp(sd, idx); idx += 1
        if l != num_resolutions - 1:
            if resblock_type == "ddpm":
                params[f"down_{l}"] = _resample(sd, idx, fir); idx += 1
            else:
                params[f"down_{l}"] = _resblockpp(sd, idx, resblock_type); idx += 1
            if progressive_input == "input_skip":
                params[f"combine_{l}"] = {"conv": _conv_oihw(sd, f"all_modules.{idx}.Conv_0")}
                idx += 1
            elif progressive_input == "residual":
                params[f"pyr_down_{l}"] = _resample(sd, idx, fir); idx += 1

    # Bottleneck
    params["mid_block0"] = _resblockpp(sd, idx, resblock_type); idx += 1
    params["mid_attn"] = _attnpp(sd, idx); idx += 1
    params["mid_block1"] = _resblockpp(sd, idx, resblock_type); idx += 1

    # Upsampling (reference `ncsnpp.py:187-227`)
    for l in reversed(range(num_resolutions)):
        for b in range(num_res_blocks + 1):
            params[f"up_{l}_{b}"] = _resblockpp(sd, idx, resblock_type); idx += 1
        if all_res[l] in attn_resolutions:
            params[f"up_attn_{l}"] = _attnpp(sd, idx); idx += 1
        if progressive != "none":
            if l == num_resolutions - 1 or progressive == "output_skip":
                params[f"pyr_norm_{l}"] = _gn(sd, f"all_modules.{idx}"); idx += 1
                params[f"pyr_conv_{l}"] = _conv_oihw(sd, f"all_modules.{idx}"); idx += 1
            else:  # residual, l != last
                params[f"pyr_up_{l}"] = _resample(sd, idx, fir); idx += 1
        if l != 0:
            if resblock_type == "ddpm":
                params[f"up_{l}"] = _resample(sd, idx, fir); idx += 1
            else:
                params[f"up_{l}"] = _resblockpp(sd, idx, resblock_type); idx += 1

    if progressive != "output_skip":
        params["norm_out"] = _gn(sd, f"all_modules.{idx}"); idx += 1
        params["conv_out"] = _conv_oihw(sd, f"all_modules.{idx}"); idx += 1

    remaining = {k for k in sd if k.startswith("all_modules.") and int(k.split(".")[1]) >= idx}
    assert not remaining, f"unconsumed torch modules from index {idx}: {sorted(remaining)[:4]}"
    return params


def port_reference_ncsnpp_paired(sd: Dict, config) -> Dict:
    return {"unet": port_reference_ncsnpp_state_dict(sd, config)}
