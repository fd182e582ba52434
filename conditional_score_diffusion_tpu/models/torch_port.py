"""Port reference PyTorch DDPM checkpoints to this framework's Flax params.

The reference stores its U-Net as a flat ``nn.ModuleList`` (`models/ddpm.py:
80-147`), so torch state-dict keys are positional (``all_modules.N.*``).
This module replays the reference's construction order for a given config
and maps each positional module onto the corresponding named Flax submodule
of `models/ddpm.py:DDPM`, transposing tensors between torch and Flax
conventions:

  * ``nn.Linear``:   weight (out,in) -> kernel (in,out); bias unchanged
  * ``nn.Conv2d``:   weight OIHW -> kernel HWIO; bias unchanged
  * ``nn.GroupNorm``: weight -> scale; bias -> bias
  * ``NIN``:         W (in,out) -> dense/kernel (in,out); b -> dense/bias

Enables (a) migrating trained reference checkpoints into this framework
and (b) deterministic forward-parity tests against the reference
(tests/test_reference_parity.py).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _linear(sd, i):
    return {
        "kernel": jnp.asarray(np.asarray(sd[f"all_modules.{i}.weight"]).T),
        "bias": jnp.asarray(np.asarray(sd[f"all_modules.{i}.bias"])),
    }


def _conv(sd, i):
    w = np.asarray(sd[f"all_modules.{i}.weight"])  # OIHW
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(np.asarray(sd[f"all_modules.{i}.bias"])),
    }


def _groupnorm(sd, prefix):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def _nin(sd, prefix):
    return {
        "dense": {
            "kernel": jnp.asarray(np.asarray(sd[f"{prefix}.W"])),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.b"])),
        }
    }


def _resblock(sd, i, has_temb=True):
    p = f"all_modules.{i}"
    out = {
        "norm0": _groupnorm(sd, f"{p}.GroupNorm_0"),
        "conv0": {
            "kernel": jnp.asarray(
                np.transpose(np.asarray(sd[f"{p}.Conv_0.weight"]), (2, 3, 1, 0))
            ),
            "bias": jnp.asarray(np.asarray(sd[f"{p}.Conv_0.bias"])),
        },
        "norm1": _groupnorm(sd, f"{p}.GroupNorm_1"),
        "conv1": {
            "kernel": jnp.asarray(
                np.transpose(np.asarray(sd[f"{p}.Conv_1.weight"]), (2, 3, 1, 0))
            ),
            "bias": jnp.asarray(np.asarray(sd[f"{p}.Conv_1.bias"])),
        },
    }
    if has_temb and f"{p}.Dense_0.weight" in sd:
        out["temb_proj"] = {
            "kernel": jnp.asarray(np.asarray(sd[f"{p}.Dense_0.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{p}.Dense_0.bias"])),
        }
    if f"{p}.NIN_0.W" in sd:
        out["shortcut"] = _nin(sd, f"{p}.NIN_0")
    elif f"{p}.Conv_2.weight" in sd:
        out["shortcut"] = {
            "kernel": jnp.asarray(
                np.transpose(np.asarray(sd[f"{p}.Conv_2.weight"]), (2, 3, 1, 0))
            ),
            "bias": jnp.asarray(np.asarray(sd[f"{p}.Conv_2.bias"])),
        }
    return out


def _attnblock(sd, i):
    p = f"all_modules.{i}"
    return {
        "norm": _groupnorm(sd, f"{p}.GroupNorm_0"),
        "q": _nin(sd, f"{p}.NIN_0"),
        "k": _nin(sd, f"{p}.NIN_1"),
        "v": _nin(sd, f"{p}.NIN_2"),
        "out": _nin(sd, f"{p}.NIN_3"),
    }


def port_reference_ddpm_state_dict(sd: Dict, config) -> Dict:
    """torch DDPM state dict (reference `models/ddpm.py`) -> Flax params for
    `models.ddpm.DDPM` built from the same config."""
    sd = {k: v for k, v in sd.items()}
    m = config.model
    ch_mult = tuple(m.ch_mult)
    num_res_blocks = m.num_res_blocks
    num_resolutions = len(ch_mult)
    attn_resolutions = tuple(m.attn_resolutions)
    all_res = [
        config.data.effective_image_size // (2**i) for i in range(num_resolutions)
    ]

    params: Dict = {}
    idx = 0
    if m.conditional:
        params["temb0"] = _linear(sd, idx); idx += 1
        params["temb1"] = _linear(sd, idx); idx += 1

    params["conv_in"] = _conv(sd, idx); idx += 1

    # Downsampling path (reference `models/ddpm.py:115-127`)
    for i_level in range(num_resolutions):
        for i_block in range(num_res_blocks):
            params[f"down_{i_level}_{i_block}"] = _resblock(sd, idx); idx += 1
            if all_res[i_level] in attn_resolutions:
                params[f"down_attn_{i_level}_{i_block}"] = _attnblock(sd, idx); idx += 1
        if i_level != num_resolutions - 1:
            params[f"down_{i_level}"] = {
                "conv": {
                    "kernel": jnp.asarray(
                        np.transpose(
                            np.asarray(sd[f"all_modules.{idx}.Conv_0.weight"]), (2, 3, 1, 0)
                        )
                    ),
                    "bias": jnp.asarray(np.asarray(sd[f"all_modules.{idx}.Conv_0.bias"])),
                }
            }
            idx += 1

    params["mid_block0"] = _resblock(sd, idx); idx += 1
    params["mid_attn"] = _attnblock(sd, idx); idx += 1
    params["mid_block1"] = _resblock(sd, idx); idx += 1

    # Upsampling path (reference `models/ddpm.py:134-142`)
    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            params[f"up_{i_level}_{i_block}"] = _resblock(sd, idx); idx += 1
        if all_res[i_level] in attn_resolutions:
            params[f"up_attn_{i_level}"] = _attnblock(sd, idx); idx += 1
        if i_level != 0:
            params[f"up_{i_level}"] = {
                "conv": {
                    "kernel": jnp.asarray(
                        np.transpose(
                            np.asarray(sd[f"all_modules.{idx}.Conv_0.weight"]), (2, 3, 1, 0)
                        )
                    ),
                    "bias": jnp.asarray(np.asarray(sd[f"all_modules.{idx}.Conv_0.bias"])),
                }
            }
            idx += 1

    params["norm_out"] = _groupnorm(sd, f"all_modules.{idx}"); idx += 1
    params["conv_out"] = _conv(sd, idx); idx += 1

    remaining = {k for k in sd if k.startswith(f"all_modules.{idx}")}
    assert not remaining, f"unconsumed torch modules from index {idx}: {sorted(remaining)[:4]}"
    return params


def _conv3d(sd, i):
    w = np.asarray(sd[f"all_modules.{i}.weight"])  # OIDHW
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),  # DHWIO
        "bias": jnp.asarray(np.asarray(sd[f"all_modules.{i}.bias"])),
    }


def _resblock3d(sd, i):
    p = f"all_modules.{i}"

    def conv(name):
        return {
            "kernel": jnp.asarray(
                np.transpose(np.asarray(sd[f"{p}.{name}.weight"]), (2, 3, 4, 1, 0))
            ),
            "bias": jnp.asarray(np.asarray(sd[f"{p}.{name}.bias"])),
        }

    out = {
        "norm0": _groupnorm(sd, f"{p}.GroupNorm_0"),
        "conv0": conv("Conv_0"),
        "norm1": _groupnorm(sd, f"{p}.GroupNorm_1"),
        "conv1": conv("Conv_1"),
    }
    if f"{p}.Dense_0.weight" in sd:
        out["temb_proj"] = {
            "kernel": jnp.asarray(np.asarray(sd[f"{p}.Dense_0.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{p}.Dense_0.bias"])),
        }
    if f"{p}.Conv_2.weight" in sd:
        out["shortcut"] = conv("Conv_2")
    return out


def port_reference_ddpm3d_state_dict(sd: Dict, config) -> Dict:
    """torch DDPM3D state dict (reference `models/ddpm3D.py:38-195`) -> Flax
    params for `models.ddpm3d.DDPM3D`.  The reference model only runs with
    ``resamp_with_conv=False`` (its Upsample applies a 2-D conv to 5-D
    tensors, `models/ddpm3D.py:100` + `models/layers.py:593-605`), so the
    param-less Up/Downsample modules still consume ModuleList indices."""
    sd = {k: v for k, v in sd.items()}
    m = config.model
    ch_mult = tuple(m.ch_mult)
    num_res_blocks = m.num_res_blocks
    num_resolutions = len(ch_mult)

    params: Dict = {}
    idx = 0
    if m.conditional:
        params["temb0"] = _linear(sd, idx); idx += 1
        params["temb1"] = _linear(sd, idx); idx += 1

    params["conv_in"] = _conv3d(sd, idx); idx += 1

    for i_level in range(num_resolutions):
        for i_block in range(num_res_blocks):
            params[f"down_{i_level}_{i_block}"] = _resblock3d(sd, idx); idx += 1
        if i_level != num_resolutions - 1:
            if m.resamp_with_conv:
                params[f"down_{i_level}"] = {"conv": _conv3d_sub(sd, idx)}
            idx += 1

    params["mid_block0"] = _resblock3d(sd, idx); idx += 1
    params["mid_block1"] = _resblock3d(sd, idx); idx += 1

    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            params[f"up_{i_level}_{i_block}"] = _resblock3d(sd, idx); idx += 1
        if i_level != 0:
            if m.resamp_with_conv:
                params[f"up_{i_level}"] = {"conv": _conv3d_sub(sd, idx)}
            idx += 1

    params["norm_out"] = _groupnorm(sd, f"all_modules.{idx}"); idx += 1
    params["conv_out"] = _conv3d(sd, idx); idx += 1

    remaining = {k for k in sd if k.startswith(f"all_modules.{idx}")}
    assert not remaining, f"unconsumed torch modules from index {idx}: {sorted(remaining)[:4]}"
    return params


def _conv3d_sub(sd, i):
    w = np.asarray(sd[f"all_modules.{i}.Conv_0.weight"])
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
        "bias": jnp.asarray(np.asarray(sd[f"all_modules.{i}.Conv_0.bias"])),
    }


def port_reference_ddpm_paired(sd: Dict, config) -> Dict:
    """Paired variants wrap the same U-Net; Flax nests it under 'unet'."""
    return {"unet": port_reference_ddpm_state_dict(sd, config)}


def load_reference_lightning_checkpoint(path: str, config) -> Dict:
    """Load a reference PyTorch-Lightning `.ckpt` and port the score model.

    Lightning stores the module under ``state_dict`` with keys prefixed
    ``score_model.`` (reference `BaseSdeGenerativeModel.__init__`).  Handles
    the plain `ddpm` and the paired wrappers (which share the flat
    all_modules layout).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {
        k[len("score_model.") :]: v
        for k, v in sd.items()
        if k.startswith("score_model.")
    } or sd
    name = config.model.name
    if name in ("ddpm_paired", "ddpm_paired_SR3", "ddpm_2xSR", "ddpm_KxSR"):
        return port_reference_ddpm_paired(sd, config)
    if name == "ddpm":
        return port_reference_ddpm_state_dict(sd, config)
    if name == "ddpm3D":
        return port_reference_ddpm3d_state_dict(sd, config)
    if name in ("ddpm3D_paired", "ddpm3D_paired_SR3"):
        return {"unet": port_reference_ddpm3d_state_dict(sd, config)}
    if name == "ncsnpp":
        from .torch_port_ncsnpp import port_reference_ncsnpp_state_dict

        return port_reference_ncsnpp_state_dict(sd, config)
    if name in ("ncsnpp_paired", "ncsnpp_paired_SR3", "ncsnpp_2xSR", "ncsnpp_KxSR"):
        from .torch_port_ncsnpp import port_reference_ncsnpp_paired

        return port_reference_ncsnpp_paired(sd, config)
    raise NotImplementedError(f"porter for model {name!r} not implemented yet")
