"""NCSN++ U-Net and paired variants (Flax, NHWC).

Reference: `models/ncsnpp.py:39-450` — Fourier/positional time embedding,
BigGAN or DDPM resblocks, FIR up/down sampling, progressive input/output
pyramids (`input_skip`/`output_skip`/`residual`, combiner sum/cat),
attention at configured resolutions, /sqrt(2) skip rescale.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from .ddpm import squeeze2x
from .layers import conv3x3, default_init, get_timestep_embedding, group_norm
from .layerspp import (
    AttnBlockpp,
    Combine,
    Downsample,
    GaussianFourierProjection,
    ResnetBlockBigGANpp,
    ResnetBlockDDPMpp,
    Upsample,
)

# 1/sqrt(2) as a weak-typed Python float: `x / np.sqrt(2.0)` would promote
# bfloat16 activations to float32 (NumPy scalars are strongly typed).
_INV_SQRT2 = float(1.0 / np.sqrt(2.0))

_ACTS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "swish": jax.nn.silu,
}


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
    nf: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    attn_resolutions: Tuple[int, ...]
    dropout: float
    resamp_with_conv: bool
    image_size: int
    conditional: bool
    centered: bool
    channels: int
    fir: bool
    fir_kernel: Tuple[int, ...]
    skip_rescale: bool
    resblock_type: str
    progressive: str
    progressive_input: str
    embedding_type: str
    init_scale: float
    fourier_scale: float
    combine_method: str
    nonlinearity: str = "swish"
    #: Decoder skip-concat blocks computed on the virtual concatenation
    #: (exact math, identical params — see layers.SplitConv3x3).  Default ON
    #: for config-built models; ``model.split_skip_convs`` disables.
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
            channels=config.data.num_channels,
            fir=m.fir,
            fir_kernel=tuple(m.fir_kernel),
            skip_rescale=m.skip_rescale,
            resblock_type=m.resblock_type.lower(),
            progressive=m.progressive.lower(),
            progressive_input=m.progressive_input.lower(),
            embedding_type=m.embedding_type.lower(),
            init_scale=m.init_scale,
            fourier_scale=m.fourier_scale,
            combine_method=m.progressive_combine.lower(),
            nonlinearity=m.nonlinearity.lower(),
            split_skip_convs=m.get("split_skip_convs", True),
        )

    def _resblock(self, act, name, out_ch=None, up=False, down=False, split=False):
        if self.resblock_type == "ddpm":
            assert not (up or down)
            return ResnetBlockDDPMpp(
                act=act,
                out_ch=out_ch,
                dropout=self.dropout,
                init_scale=self.init_scale,
                skip_rescale=self.skip_rescale,
                split_skip=split,
                name=name,
            )
        return ResnetBlockBigGANpp(
            act=act,
            out_ch=out_ch,
            up=up,
            down=down,
            dropout=self.dropout,
            fir=self.fir,
            fir_kernel=self.fir_kernel,
            init_scale=self.init_scale,
            skip_rescale=self.skip_rescale,
            split_skip=split,
            name=name,
        )

    @nn.compact
    def __call__(self, x, time_cond, train: bool = False):
        act = _ACTS[self.nonlinearity]
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")

        # Time embedding (reference `ncsnpp.py:242-262`).
        if self.embedding_type == "fourier":
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=self.fourier_scale, name="fourier"
            )(time_cond)
        elif self.embedding_type == "positional":
            temb = get_timestep_embedding(time_cond, nf)
        else:
            raise ValueError(f"embedding type {self.embedding_type!r} unknown")
        # drop the f32 sin/cos embedding to the activation dtype so a bf16
        # input keeps the whole network bf16 (an f32 temb would promote
        # every resblock after `h + Dense(temb)` back to f32)
        temb = temb.astype(x.dtype)

        if self.conditional:
            temb = nn.Dense(nf * 4, kernel_init=default_init(), name="temb0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(), name="temb1")(act(temb))
        else:
            temb = None

        if not self.centered:
            x = 2 * x - 1.0

        attn = lambda ch, name: AttnBlockpp(
            ch, skip_rescale=self.skip_rescale, init_scale=self.init_scale, name=name
        )
        upsample = lambda ch, name: Upsample(
            ch, with_conv=self.resamp_with_conv, fir=self.fir, fir_kernel=self.fir_kernel, name=name
        )
        downsample = lambda ch, name: Downsample(
            ch, with_conv=self.resamp_with_conv, fir=self.fir, fir_kernel=self.fir_kernel, name=name
        )

        # Downsampling block (reference `ncsnpp.py:268-309`).
        input_pyramid = x if self.progressive_input != "none" else None
        hs = [conv3x3(nf, name="conv_in")(x)]
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = self._resblock(act, f"down_{i_level}_{i_block}", out_ch)(hs[-1], temb, train)
                if h.shape[1] in self.attn_resolutions:
                    h = attn(h.shape[-1], f"down_attn_{i_level}_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = downsample(hs[-1].shape[-1], f"down_{i_level}")(hs[-1])
                else:
                    h = self._resblock(act, f"down_{i_level}", down=True)(hs[-1], temb, train)
                if self.progressive_input == "input_skip":
                    input_pyramid = Downsample(
                        input_pyramid.shape[-1],
                        with_conv=False,
                        fir=self.fir,
                        fir_kernel=self.fir_kernel,
                        name=f"pyr_down_{i_level}",
                    )(input_pyramid)
                    h = Combine(
                        h.shape[-1], method=self.combine_method, name=f"combine_{i_level}"
                    )(input_pyramid, h)
                elif self.progressive_input == "residual":
                    input_pyramid = Downsample(
                        h.shape[-1],
                        with_conv=True,
                        fir=self.fir,
                        fir_kernel=self.fir_kernel,
                        name=f"pyr_down_{i_level}",
                    )(input_pyramid)
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) * _INV_SQRT2
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # Bottleneck (reference `ncsnpp.py:311-317`).
        h = hs[-1]
        h = self._resblock(act, "mid_block0")(h, temb, train)
        h = attn(h.shape[-1], "mid_attn")(h)
        h = self._resblock(act, "mid_block1")(h, temb, train)

        pyramid = None

        # Upsampling block (reference `ncsnpp.py:321-372`).
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                h = self._resblock(
                    act, f"up_{i_level}_{i_block}", out_ch, split=self.split_skip_convs
                )(h, temb, train, skip=hs.pop())
            if h.shape[1] in self.attn_resolutions:
                h = attn(h.shape[-1], f"up_attn_{i_level}")(h)

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = act(group_norm(h.shape[-1], name=f"pyr_norm_{i_level}")(h))
                        pyramid = conv3x3(
                            self.channels, init_scale=self.init_scale, name=f"pyr_conv_{i_level}"
                        )(pyramid)
                    else:  # residual
                        pyramid = act(group_norm(h.shape[-1], name=f"pyr_norm_{i_level}")(h))
                        pyramid = conv3x3(h.shape[-1], name=f"pyr_conv_{i_level}")(pyramid)
                else:
                    if self.progressive == "output_skip":
                        pyramid = Upsample(
                            pyramid.shape[-1],
                            with_conv=False,
                            fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            name=f"pyr_up_{i_level}",
                        )(pyramid)
                        pyramid_h = act(group_norm(h.shape[-1], name=f"pyr_norm_{i_level}")(h))
                        pyramid_h = conv3x3(
                            self.channels, init_scale=self.init_scale, name=f"pyr_conv_{i_level}"
                        )(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = Upsample(
                            h.shape[-1],
                            with_conv=True,
                            fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            name=f"pyr_up_{i_level}",
                        )(pyramid)
                        if self.skip_rescale:
                            pyramid = (pyramid + h) * _INV_SQRT2
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = upsample(h.shape[-1], f"up_{i_level}")(h)
                else:
                    h = self._resblock(act, f"up_{i_level}", up=True)(h, temb, train)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(group_norm(h.shape[-1], name="norm_out")(h))
            h = conv3x3(self.channels, init_scale=self.init_scale, name="conv_out")(h)
        return h


class _PairedBase(nn.Module):
    unet: nn.Module

    @property
    def embedding_type(self):
        return self.unet.embedding_type

    @classmethod
    def from_config(cls, config):
        return cls(unet=NCSNpp.from_config(config))


@register_model(name="ncsnpp_paired")
class NCSNppPaired(_PairedBase):
    """Reference `models/ncsnpp.py:390-401`."""

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        xc = x.shape[-1]
        out = self.unet(jnp.concatenate([x, y], axis=-1), cond, train)
        return {"x": out[..., :xc], "y": out[..., xc:]}


@register_model(name="ncsnpp_paired_SR3")
class NCSNppPairedSR3(_PairedBase):
    """SR3-style: score of x only, clean y as input."""

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        return self.unet(jnp.concatenate([x, y], axis=-1), cond, train)


@register_model(name="ncsnpp_2xSR")
class NCSNpp2xSR(_PairedBase):
    """Reference `models/ncsnpp.py:418-432` (SqueezeBlock space-to-depth)."""

    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        xs = squeeze2x(x)
        xc = xs.shape[-1]
        out = self.unet(jnp.concatenate([xs, y], axis=-1), cond, train)
        return {"x": squeeze2x(out[..., :xc], reverse=True), "y": out[..., xc:]}


@register_model(name="ncsnpp_KxSR")
class NCSNppKxSR(_PairedBase):
    """Reference `models/ncsnpp.py:435-450` (bilinear resize of y)."""

    target_resolution: int = 0
    scale: int = 1

    @classmethod
    def from_config(cls, config):
        return cls(
            unet=NCSNpp.from_config(config),
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
