"""DDPM U-Net and its conditional variants (Flax, NHWC).

Reference: `models/ddpm.py` — `ddpm` (`:80-213`), `ddpm_paired_SR3`
(`:275-285`), `ddpm_paired` (`:287-298`), `ddpm_2xSR` (`:300-314`),
`ddpm_KxSR` (`:316-331`), plus the `SqueezeBlock` space-to-depth and Haar
channel permutation helpers (`:39-78`).

This family is the backbone of the CelebA-160 inverse-problem configs
(e.g. `configs/ve/inverse_problems/super_resolution/celebA_ours_NDV_160.py`
sets ``model.name = 'ddpm_paired'``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import register_model
from .layers import (
    AttnBlock,
    legacy_group_norm,
    Downsample,
    ResnetBlockDDPM,
    Upsample,
    conv3x3,
    default_init,
    get_timestep_embedding,
)

_ACTS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "swish": jax.nn.silu,
}


def squeeze2x(z: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Space-to-depth by 2 (reference `models/ddpm.py:39-52`, NHWC layout).

    Channel ordering matches the reference's NCHW permute: output channel
    index is ``4*c + (2*dy + dx)``.
    """
    B, H, W, C = z.shape
    if not reverse:
        z = z.reshape(B, H // 2, 2, W // 2, 2, C)
        z = z.transpose(0, 1, 3, 5, 2, 4)  # B, H/2, W/2, C, 2, 2
        return z.reshape(B, H // 2, W // 2, 4 * C)
    z = z.reshape(B, H, W, C // 4, 2, 2)
    z = z.transpose(0, 1, 4, 2, 5, 3)  # B, H, 2, W, 2, C/4
    return z.reshape(B, H * 2, W * 2, C // 4)


@register_model(name="ddpm")
class DDPM(nn.Module):
    """Classic DDPM U-Net (reference `models/ddpm.py:80-213`)."""

    nf: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    attn_resolutions: Tuple[int, ...]
    dropout: float
    resamp_with_conv: bool
    image_size: int
    conditional: bool
    centered: bool
    output_channels: int
    nonlinearity: str = "swish"
    embedding_type: str = "positional"
    #: Decoder skip handling: compute skip-concat blocks on the virtual
    #: concatenation (GroupNorm/conv/NIN all distribute over the channel
    #: split — exact math, identical params; see layers.SplitConv3x3).
    #: Avoids the concat's pad/copy fusions on TPU — measured 7% per-eval
    #: win on the flagship 160px ddpm_paired (BENCH_NOTES round 2).  Config
    #: knob ``model.split_skip_convs``; config-built models default ON
    #: (exact math, checkpoint-compatible), direct construction defaults
    #: OFF so both paths stay covered by tests.
    split_skip_convs: bool = False

    @classmethod
    def from_config(cls, config):
        m = config.model
        return cls(
            nf=m.nf,
            ch_mult=tuple(m.ch_mult),
            num_res_blocks=m.num_res_blocks,
            attn_resolutions=tuple(m.attn_resolutions),
            dropout=m.dropout,
            resamp_with_conv=m.resamp_with_conv,
            image_size=config.data.effective_image_size,
            conditional=m.conditional,
            centered=config.data.centered,
            output_channels=m.output_channels,
            nonlinearity=m.nonlinearity.lower(),
            split_skip_convs=m.get("split_skip_convs", True),
        )

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        act = _ACTS[self.nonlinearity]
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_res = [self.image_size // (2**i) for i in range(num_resolutions)]

        if self.conditional:
            # sin/cos in f32, then drop to the activation dtype so a bf16
            # input keeps the whole network bf16 (an f32 temb would promote
            # every resblock after `h + Dense(temb)` back to f32)
            temb = get_timestep_embedding(cond, nf).astype(x.dtype)
            temb = nn.Dense(nf * 4, kernel_init=default_init(), name="temb0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(), name="temb1")(act(temb))
        else:
            temb = None

        h = x if self.centered else 2 * x - 1.0

        resblock = lambda out_ch, name, split=False: ResnetBlockDDPM(
            act=act, out_ch=out_ch, dropout=self.dropout, name=name, split_skip=split
        )

        # Downsampling path.
        hs = [conv3x3(nf, name="conv_in")(h)]
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                h = resblock(nf * self.ch_mult[i_level], f"down_{i_level}_{i_block}")(
                    hs[-1], temb, train
                )
                if h.shape[1] in self.attn_resolutions:
                    h = AttnBlock(h.shape[-1], name=f"down_attn_{i_level}_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(
                    Downsample(
                        hs[-1].shape[-1], with_conv=self.resamp_with_conv, name=f"down_{i_level}"
                    )(hs[-1])
                )

        # Bottleneck.
        h = hs[-1]
        h = resblock(None, "mid_block0")(h, temb, train)
        h = AttnBlock(h.shape[-1], name="mid_attn")(h)
        h = resblock(None, "mid_block1")(h, temb, train)

        # Upsampling path.
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                h = resblock(
                    nf * self.ch_mult[i_level],
                    f"up_{i_level}_{i_block}",
                    split=self.split_skip_convs,
                )(h, temb, train, skip=hs.pop())
            if h.shape[1] in self.attn_resolutions:
                h = AttnBlock(h.shape[-1], name=f"up_attn_{i_level}")(h)
            if i_level != 0:
                h = Upsample(h.shape[-1], with_conv=self.resamp_with_conv, name=f"up_{i_level}")(h)

        assert not hs
        h = act(legacy_group_norm(h.shape[-1], name="norm_out")(h))
        h = conv3x3(self.output_channels, init_scale=0.0, name="conv_out")(h)
        return h


class _PairedBase(nn.Module):
    """Shared concat-channels wrapper for paired (x, y) models."""

    unet: nn.Module

    @property
    def embedding_type(self):
        return self.unet.embedding_type

    @classmethod
    def from_config(cls, config):
        return cls(unet=DDPM.from_config(config))


@register_model(name="ddpm_multi_speed_haar")
class DDPMMultiSpeedHaar(_PairedBase):
    """Multi-speed-Haar DDPM: consumes/produces dicts of Haar coefficients,
    running the U-Net in image space.

    The reference registers this model but its `forward` is unfinished —
    `convert_to_haar_space` builds a dict and never returns it
    (`models/ddpm.py:238-249`, SURVEY.md §7.5) — so this is the working
    realization of its evident intent: haar dict -> image -> U-Net ->
    image -> haar dict.
    """

    max_haar_depth: int = 1

    @classmethod
    def from_config(cls, config):
        return cls(
            unet=DDPM.from_config(config),
            max_haar_depth=config.data.get("max_haar_depth", 1),
        )

    @nn.compact
    def __call__(self, haar_x: dict, cond, train: bool = False):
        from ..ops.haar import haar_backward, haar_forward

        # dict {'d1'..'dK', 'aK'} of detail/approx bands -> image
        depth = max(int(k[1:]) for k in haar_x if k.startswith("a"))
        a = haar_x[f"a{depth}"]
        for i in range(depth, 0, -1):
            a = haar_backward(jnp.concatenate([a, haar_x[f"d{i}"]], axis=-1))
        out = self.unet(a, cond, train)
        # image -> haar dict at the same depth
        result = {}
        x = out
        C = out.shape[-1]
        for i in range(1, depth + 1):
            z = haar_forward(x)
            x = z[..., :C]
            result[f"d{i}"] = z[..., C:]
        result[f"a{depth}"] = x
        return result


@register_model(name="ddpm_paired")
class DDPMPaired(_PairedBase):
    """Joint score of (x, y): concat on channels, split the output
    (reference `models/ddpm.py:287-298`)."""

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        xc = x.shape[-1]
        out = self.unet(jnp.concatenate([x, y], axis=-1), cond, train)
        return {"x": out[..., :xc], "y": out[..., xc:]}


@register_model(name="ddpm_paired_SR3")
class DDPMPairedSR3(_PairedBase):
    """SR3/CDE estimator: y is clean network input, score of x only
    (reference `models/ddpm.py:275-285`)."""

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        return self.unet(jnp.concatenate([x, y], axis=-1), cond, train)


@register_model(name="ddpm_2xSR")
class DDPM2xSR(_PairedBase):
    """2x SR: space-to-depth x so both domains share resolution
    (reference `models/ddpm.py:300-314`)."""

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        xs = squeeze2x(x)
        xc = xs.shape[-1]
        out = self.unet(jnp.concatenate([xs, y], axis=-1), cond, train)
        return {"x": squeeze2x(out[..., :xc], reverse=True), "y": out[..., xc:]}


@register_model(name="ddpm_SR")
class DDPMSR(DDPM2xSR):
    """Alias used by the legacy celebA bicubic-multiscale SRFlow recipes
    (reference `configs/ve/srflow/celebA/bicubic/**/config_*.py:113`, which
    name a `ddpm_SR` model whose 15-channel squeezed-HR+LR input matches the
    2xSR squeeze formulation)."""


@register_model(name="ddpm_KxSR")
class DDPMKxSR(_PairedBase):
    """Kx SR: bilinear-resize y to GT size in, back to LQ size out
    (reference `models/ddpm.py:316-331`)."""

    target_resolution: int = 0
    scale: int = 1

    @classmethod
    def from_config(cls, config):
        return cls(
            unet=DDPM.from_config(config),
            target_resolution=config.data.target_resolution,
            scale=config.data.scale,
        )

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        B, _, _, yc = y.shape
        gt = self.target_resolution
        lq = gt // self.scale
        y_up = jax.image.resize(y, (B, gt, gt, yc), method="bilinear")
        xc = x.shape[-1]
        out = self.unet(jnp.concatenate([x, y_up], axis=-1), cond, train)
        y_out = jax.image.resize(out[..., xc:], (B, lq, lq, yc), method="bilinear")
        return {"x": out[..., :xc], "y": y_out}
