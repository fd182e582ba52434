"""NCSN++ building blocks (Flax, NHWC).

Reference: `models/layerspp.py` (GaussianFourierProjection, Combine,
AttnBlockpp, FIR Upsample/Downsample, ResnetBlockDDPMpp, ResnetBlockBigGANpp).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)
from .layers import (
    NIN,
    SplitConv3x3,
    SplitGroupNorm,
    SplitNIN,
    _spatial_attention,
    conv1x1,
    conv3x3,
    default_init,
    default_num_groups,
    fused_block_applicable,
    fused_resblock,
    fused_resblock_split,
    fused_split_block_applicable,
    gn_act_conv_tail,
    group_norm,
)

# 1/sqrt(2) as a weak-typed Python float: `x / np.sqrt(2.0)` would promote
# bfloat16 activations to float32 (NumPy scalars are strongly typed).
_INV_SQRT2 = float(1.0 / np.sqrt(2.0))


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for noise levels (reference `layerspp.py:32-41`).

    The projection matrix is fixed at init (requires_grad=False in the
    reference); stop_gradient keeps it frozen here.
    """

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        W = self.param(
            "W",
            jax.nn.initializers.normal(stddev=self.scale),
            (self.embedding_size,),
        )
        W = jax.lax.stop_gradient(W)
        x_proj = x[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
    """Combine a progressive-input pyramid with features (reference `layerspp.py:44-59`)."""

    out_ch: int
    method: str = "cat"

    @nn.compact
    def __call__(self, x, y):
        h = conv1x1(self.out_ch, name="conv")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"combine method {self.method!r} not recognized")


class AttnBlockpp(nn.Module):
    """NCSN++ self-attention with optional /sqrt(2) skip rescale
    (reference `layerspp.py:62-91`)."""

    channels: int
    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x):
        h = group_norm(self.channels, name="norm")(x)
        q = NIN(self.channels, name="q")(h)
        k = NIN(self.channels, name="k")(h)
        v = NIN(self.channels, name="v")(h)
        h = _spatial_attention(q, k, v)
        h = NIN(self.channels, init_scale=self.init_scale, name="out")(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) * _INV_SQRT2


class Upsample(nn.Module):
    """x2 upsample: nearest / FIR / fused FIR-conv (reference `layerspp.py:94-126`)."""

    out_ch: int
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if not self.fir:
            h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            if self.with_conv:
                h = conv3x3(self.out_ch, name="conv")(h)
            return h
        if not self.with_conv:
            return upsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("conv_w", default_init(), (3, 3, C, self.out_ch))
        b = self.param("conv_b", jax.nn.initializers.zeros, (self.out_ch,))
        h = upsample_conv_2d(x, w, k=self.fir_kernel)
        return h + b.reshape(1, 1, 1, -1)


class Downsample(nn.Module):
    """x2 downsample: avg-pool / FIR / fused conv-FIR (reference `layerspp.py:129-163`)."""

    out_ch: int
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                return conv3x3(self.out_ch, stride=2, padding=0, name="conv")(x)
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        if not self.with_conv:
            return downsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("conv_w", default_init(), (3, 3, C, self.out_ch))
        b = self.param("conv_b", jax.nn.initializers.zeros, (self.out_ch,))
        h = conv_downsample_2d(x, w, k=self.fir_kernel)
        return h + b.reshape(1, 1, 1, -1)


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style NCSN++ resblock (reference `layerspp.py:166-209`)."""

    act: Callable
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    split_skip: bool = False  # see layers.ResnetBlockDDPM.split_skip

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False, skip=None):
        if skip is not None and not self.split_skip:
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        out_ch = self.out_ch if self.out_ch is not None else in_ch
        if fused_block_applicable(x, temb, self.act, train, skip, 2, out_ch) and (
            in_ch == out_ch or not self.conv_shortcut
        ):
            return fused_resblock(
                x, temb, act=self.act, out_ch=out_ch,
                groups_in=default_num_groups(in_ch),
                groups_out=default_num_groups(out_ch),
                conv1_init_scale=self.init_scale,
                skip_rescale=self.skip_rescale, shortcut_kind="nin",
            )
        if fused_split_block_applicable(x, skip, self.act, train, 2, out_ch) and (
            in_ch == out_ch or not self.conv_shortcut
        ):
            return fused_resblock_split(
                x, skip, temb, act=self.act, out_ch=out_ch,
                groups_in=default_num_groups(in_ch),
                groups_out=default_num_groups(out_ch),
                conv1_init_scale=self.init_scale,
                skip_rescale=self.skip_rescale, shortcut_kind="nin",
            )
        if skip is None:
            h = self.act(group_norm(in_ch, name="norm0")(x))
            h = conv3x3(out_ch, name="conv0")(h)
        else:
            na, nb = SplitGroupNorm(default_num_groups(in_ch), name="norm0")(x, skip)
            h = SplitConv3x3(out_ch, name="conv0")(self.act(na), self.act(nb))
        if temb is not None:
            proj = nn.Dense(
                out_ch,
                kernel_init=default_init(),
                bias_init=jax.nn.initializers.zeros,
                name="temb_proj",
            )(self.act(temb))
            h = h + proj[:, None, None, :]
        h = gn_act_conv_tail(
            h, out_ch, default_num_groups(out_ch), self.act, train,
            self.dropout, init_scale=self.init_scale,
        )
        if in_ch != out_ch:
            if self.conv_shortcut:
                if skip is not None:
                    x = SplitConv3x3(out_ch, name="shortcut")(x, skip)
                    skip = None
                else:
                    x = conv3x3(out_ch, name="shortcut")(x)
            elif skip is not None:
                x = SplitNIN(out_ch, name="shortcut")(x, skip)
                skip = None
            else:
                x = NIN(out_ch, name="shortcut")(x)
        elif skip is not None:  # identity residual needs the real concat
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None
        if not self.skip_rescale:
            return x + h
        return (x + h) * _INV_SQRT2


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style NCSN++ resblock with in-block up/down sampling
    (reference `layerspp.py:212-274`)."""

    act: Callable
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    split_skip: bool = False  # see layers.ResnetBlockDDPM.split_skip

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False, skip=None):
        # In-block resampling reshapes both paths; the virtual-concat split
        # only applies to the plain (decoder skip-concat) case.
        if skip is not None and not (self.split_skip and not self.up and not self.down):
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        out_ch = self.out_ch if self.out_ch is not None else in_ch
        if (
            not self.up
            and not self.down
            and fused_block_applicable(x, temb, self.act, train, skip, 2, out_ch)
        ):
            return fused_resblock(
                x, temb, act=self.act, out_ch=out_ch,
                groups_in=default_num_groups(in_ch),
                groups_out=default_num_groups(out_ch),
                conv1_init_scale=self.init_scale,
                skip_rescale=self.skip_rescale, shortcut_kind="conv1x1",
            )
        if (
            not self.up
            and not self.down
            and fused_split_block_applicable(x, skip, self.act, train, 2, out_ch)
        ):
            return fused_resblock_split(
                x, skip, temb, act=self.act, out_ch=out_ch,
                groups_in=default_num_groups(in_ch),
                groups_out=default_num_groups(out_ch),
                conv1_init_scale=self.init_scale,
                skip_rescale=self.skip_rescale, shortcut_kind="conv1x1",
            )
        if skip is None:
            h = self.act(group_norm(in_ch, name="norm0")(x))
        else:
            na, nb = SplitGroupNorm(default_num_groups(in_ch), name="norm0")(x, skip)
            h = (self.act(na), self.act(nb))

        if self.up:
            if self.fir:
                h = upsample_2d(h, self.fir_kernel, factor=2)
                x = upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_upsample_2d(h, factor=2)
                x = naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = downsample_2d(h, self.fir_kernel, factor=2)
                x = downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_downsample_2d(h, factor=2)
                x = naive_downsample_2d(x, factor=2)

        if isinstance(h, tuple):
            h = SplitConv3x3(out_ch, name="conv0")(*h)
        else:
            h = conv3x3(out_ch, name="conv0")(h)
        if temb is not None:
            proj = nn.Dense(
                out_ch,
                kernel_init=default_init(),
                bias_init=jax.nn.initializers.zeros,
                name="temb_proj",
            )(self.act(temb))
            h = h + proj[:, None, None, :]
        h = gn_act_conv_tail(
            h, out_ch, default_num_groups(out_ch), self.act, train,
            self.dropout, init_scale=self.init_scale,
        )

        if in_ch != out_ch or self.up or self.down:
            if skip is not None:
                x = SplitConv3x3(out_ch, kernel_size=1, name="shortcut")(x, skip)
                skip = None
            else:
                x = conv1x1(out_ch, name="shortcut")(x)
        elif skip is not None:  # identity residual needs the real concat
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None

        if not self.skip_rescale:
            return x + h
        return (x + h) * _INV_SQRT2
