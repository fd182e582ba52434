"""3-D DDPM U-Net for volumes (MRI -> PET), NDHWC.

Reference: `models/ddpm3D.py:38-195` — 3-D convs, conv shortcuts (NIN
unsupported in 3D there), no attention; `ddpm3D_paired` / `ddpm3D_paired_SR3`
concat on channels.  Note the reference upsamples with the 2-D `Upsample`
(a latent bug for 5-D tensors); here the upsample is a proper 3-D nearest
resize.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import register_model
from .layers import ResnetBlockDDPM, conv3x3, default_init, get_timestep_embedding, legacy_group_norm

_ACTS = {"elu": jax.nn.elu, "relu": jax.nn.relu,
         "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2), "swish": jax.nn.silu}


class Downsample3D(nn.Module):
    channels: int
    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
            return conv3x3(self.channels, stride=2, padding=0, dim=3, name="conv")(x)
        return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class Upsample3D(nn.Module):
    channels: int
    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        h = jax.image.resize(x, (B, D * 2, H * 2, W * 2, C), method="nearest")
        if self.with_conv:
            h = conv3x3(self.channels, dim=3, name="conv")(h)
        return h


@register_model(name="ddpm3D")
class DDPM3D(nn.Module):
    nf: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    dropout: float
    resamp_with_conv: bool
    conditional: bool
    centered: bool
    output_channels: int
    nonlinearity: str = "swish"
    embedding_type: str = "positional"
    #: Virtual-concat decoder skip blocks (exact math, identical params —
    #: see layers.SplitConv3x3); `model.split_skip_convs`, default ON for
    #: config-built models.
    split_skip_convs: bool = False

    @classmethod
    def from_config(cls, config):
        m = config.model
        return cls(
            nf=m.nf,
            ch_mult=tuple(m.ch_mult),
            num_res_blocks=m.num_res_blocks,
            dropout=m.dropout,
            resamp_with_conv=m.resamp_with_conv,
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

        if self.conditional:
            # f32 sin/cos, then the activation dtype (keeps bf16 paths bf16)
            temb = get_timestep_embedding(cond, nf).astype(x.dtype)
            temb = nn.Dense(nf * 4, kernel_init=default_init(), name="temb0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(), name="temb1")(act(temb))
        else:
            temb = None

        h = x if self.centered else 2 * x - 1.0

        resblock = lambda out_ch, name, split=False: ResnetBlockDDPM(
            act=act, out_ch=out_ch, conv_shortcut=True, dropout=self.dropout,
            dim=3, split_skip=split, name=name
        )

        hs = [conv3x3(nf, dim=3, name="conv_in")(h)]
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                h = resblock(nf * self.ch_mult[i_level], f"down_{i_level}_{i_block}")(
                    hs[-1], temb, train
                )
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(
                    Downsample3D(
                        hs[-1].shape[-1], with_conv=self.resamp_with_conv, name=f"down_{i_level}"
                    )(hs[-1])
                )

        h = hs[-1]
        h = resblock(None, "mid_block0")(h, temb, train)
        h = resblock(None, "mid_block1")(h, temb, train)

        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                h = resblock(
                    nf * self.ch_mult[i_level],
                    f"up_{i_level}_{i_block}",
                    split=self.split_skip_convs,
                )(h, temb, train, skip=hs.pop())
            if i_level != 0:
                h = Upsample3D(h.shape[-1], with_conv=self.resamp_with_conv, name=f"up_{i_level}")(h)

        assert not hs
        h = act(legacy_group_norm(h.shape[-1], name="norm_out")(h))
        return conv3x3(self.output_channels, init_scale=0.0, dim=3, name="conv_out")(h)


class _Paired3DBase(nn.Module):
    unet: nn.Module

    @property
    def embedding_type(self):
        return self.unet.embedding_type

    @classmethod
    def from_config(cls, config):
        return cls(unet=DDPM3D.from_config(config))


@register_model(name="ddpm3D_paired")
class DDPM3DPaired(_Paired3DBase):
    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        xc = x.shape[-1]
        out = self.unet(jnp.concatenate([x, y], axis=-1), cond, train)
        return {"x": out[..., :xc], "y": out[..., xc:]}


@register_model(name="ddpm3D_paired_SR3")
class DDPM3DPairedSR3(_Paired3DBase):
    @nn.compact
    def __call__(self, inputs, cond, train: bool = False):
        x, y = inputs["x"], inputs["y"]
        return self.unet(jnp.concatenate([x, y], axis=-1), cond, train)
