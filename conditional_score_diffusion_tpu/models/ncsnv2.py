"""NCSNv2 / NCSN RefineNet-based score networks (Flax, NHWC).

Reference: `models/ncsnv2.py` (`ncsnv2_64` `:43`, `ncsn` `:131`,
`ncsnv2_128` `:217`, `ncsnv2_256` `:306`) and the RefineNet machinery in
`models/layers.py:141-520` (CRP/RCU/MSF/Refine blocks, ResidualBlock,
ConvMeanPool/MeanPoolConv/UpsampleConv).

Weight initialization follows Flax defaults (the reference uses torch's
kaiming-uniform defaults); these nets are trained from scratch, not
weight-ported.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from .normalization import ConditionalInstanceNorm2dPlus, get_normalization

_ACTS = {"elu": jax.nn.elu, "relu": jax.nn.relu,
         "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2), "swish": jax.nn.silu}


def ncsn_conv(out_ch, kernel=3, stride=1, bias=True, dilation=1, name=None):
    pad = dilation if kernel == 3 else 0
    return nn.Conv(
        out_ch,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        name=name,
    )


def _pool5(x, kind: str):
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            [(0, 0), (2, 2), (2, 2), (0, 0)],
        )
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )
    # torch AvgPool2d(count_include_pad=True default)
    return summed / 25.0


def _bilinear_align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense resize matrix for F.interpolate(mode='bilinear',
    align_corners=True) — applied as matmuls (MXU) instead of gathers."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        M[0, 0] = 1.0
        return M
    for i in range(out_size):
        u = i * (in_size - 1) / (out_size - 1)
        lo = int(np.floor(u))
        hi = min(lo + 1, in_size - 1)
        w = u - lo
        M[i, lo] += 1 - w
        M[i, hi] += w
    return M


def bilinear_resize_align_corners(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    B, H, W, C = x.shape
    Mh = jnp.asarray(_bilinear_align_corners_matrix(H, shape[0]))
    Mw = jnp.asarray(_bilinear_align_corners_matrix(W, shape[1]))
    out = jnp.einsum("oh,bhwc->bowc", Mh, x)
    return jnp.einsum("pw,bowc->bopc", Mw, out)


def _mean_pool2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


class ConvMeanPool(nn.Module):
    """Reference `layers.py:359-377`."""

    out_ch: int
    kernel: int = 3
    bias: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = ncsn_conv(self.out_ch, self.kernel, bias=self.bias, name="conv")(x)
        return _mean_pool2(h)


class MeanPoolConv(nn.Module):
    """Reference `layers.py:380-389`."""

    out_ch: int
    kernel: int = 3
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        return ncsn_conv(self.out_ch, self.kernel, bias=self.bias, name="conv")(_mean_pool2(x))


class UpsampleConv(nn.Module):
    """Pixel-shuffle upsample + conv (reference `layers.py:392-402`)."""

    out_ch: int
    kernel: int = 3
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = jnp.tile(x[:, :, None, :, None, :], (1, 1, 2, 1, 2, 1)).reshape(
            B, 2 * H, 2 * W, C
        )
        return ncsn_conv(self.out_ch, self.kernel, bias=self.bias, name="conv")(h)


class CRPBlock(nn.Module):
    """Chained residual pooling (reference `layers.py:141-162`)."""

    features: int
    n_stages: int
    act: Callable
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, "max" if self.maxpool else "avg")
            path = ncsn_conv(self.features, bias=False, name=f"conv{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (reference `layers.py:191-213`)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv(self.features, bias=False, name=f"conv_{i}_{j}")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion (reference `layers.py:244-260`)."""

    features: int
    n_inputs: int

    @nn.compact
    def __call__(self, xs, shape):
        out = 0.0
        for i in range(self.n_inputs):
            h = ncsn_conv(self.features, bias=True, name=f"conv{i}")(xs[i])
            out = out + bilinear_resize_align_corners(h, shape)
        return out


class RefineBlock(nn.Module):
    """RefineNet block (reference `layers.py:289-325`)."""

    features: int
    n_inputs: int
    act: Callable
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs, shape):
        hs = []
        for i in range(self.n_inputs):
            h = RCUBlock(xs[i].shape[-1], 2, 2, self.act, name=f"adapt{i}")(xs[i])
            hs.append(h)
        if self.n_inputs > 1:
            h = MSFBlock(self.features, self.n_inputs, name="msf")(hs, shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool, name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act, name="out")(h)


class ResidualBlock(nn.Module):
    """NCSNv2 residual block (reference `layers.py:464-520`)."""

    out_ch: int
    norm: Callable
    act: Callable
    resample: Optional[str] = None
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = self.norm(in_ch, name="norm0")(x)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv(in_ch, dilation=self.dilation, name="conv0")(h)
                h = self.norm(in_ch, name="norm1")(h)
                h = self.act(h)
                h = ncsn_conv(self.out_ch, dilation=self.dilation, name="conv1")(h)
                shortcut = ncsn_conv(self.out_ch, dilation=self.dilation, name="shortcut")(x)
            else:
                h = ncsn_conv(in_ch, name="conv0")(h)
                h = self.norm(in_ch, name="norm1")(h)
                h = self.act(h)
                h = ConvMeanPool(self.out_ch, 3, adjust_padding=self.adjust_padding, name="conv1")(h)
                shortcut = ConvMeanPool(
                    self.out_ch, 1, adjust_padding=self.adjust_padding, name="shortcut"
                )(x)
        else:
            if self.dilation > 1:
                h = ncsn_conv(self.out_ch, dilation=self.dilation, name="conv0")(h)
                h = self.norm(self.out_ch, name="norm1")(h)
                h = self.act(h)
                h = ncsn_conv(self.out_ch, dilation=self.dilation, name="conv1")(h)
                shortcut = (
                    x if in_ch == self.out_ch
                    else ncsn_conv(self.out_ch, dilation=self.dilation, name="shortcut")(x)
                )
            else:
                h = ncsn_conv(self.out_ch, name="conv0")(h)
                h = self.norm(self.out_ch, name="norm1")(h)
                h = self.act(h)
                h = ncsn_conv(self.out_ch, name="conv1")(h)
                shortcut = x if in_ch == self.out_ch else ncsn_conv(self.out_ch, 1, name="shortcut")(x)
        return shortcut + h


class _NCSNv2Base(nn.Module):
    """Shared config fields + stem for the NCSNv2 family."""

    nf: int
    num_channels: int
    num_scales: int
    image_size: int
    centered: bool
    normalization: str
    nonlinearity: str

    @classmethod
    def from_config(cls, config):
        return cls(
            nf=config.model.nf,
            num_channels=config.data.num_channels,
            num_scales=config.model.num_scales,
            image_size=config.data.image_size,
            centered=config.data.centered,
            normalization=config.model.normalization,
            nonlinearity=config.model.nonlinearity.lower(),
        )

    def _norm(self):
        class _Cfg:
            model = type("m", (), {"normalization": self.normalization})

        return get_normalization(_Cfg)

    def _res_levels(self, h, act, norm, specs):
        layers = []
        for li, blocks in enumerate(specs):
            for bi, kwargs in enumerate(blocks):
                h = ResidualBlock(act=act, norm=norm, name=f"res{li}_{bi}", **kwargs)(h)
            layers.append(h)
        return layers


@register_model(name="ncsnv2_64")
class NCSNv2(_NCSNv2Base):
    """Reference `models/ncsnv2.py:43-128`."""

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        act = _ACTS[self.nonlinearity]
        norm = self._norm()
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        h = ncsn_conv(nf, name="begin_conv")(h)

        d4 = dict(out_ch=2 * nf, resample="down", dilation=4,
                  adjust_padding=self.image_size == 28)
        layers = self._res_levels(
            h, act, norm,
            [
                [dict(out_ch=nf), dict(out_ch=nf)],
                [dict(out_ch=2 * nf, resample="down"), dict(out_ch=2 * nf)],
                [dict(out_ch=2 * nf, resample="down", dilation=2), dict(out_ch=2 * nf, dilation=2)],
                [d4, dict(out_ch=2 * nf, dilation=4)],
            ],
        )
        l1, l2, l3, l4 = layers
        r1 = RefineBlock(2 * nf, 1, act, start=True, name="refine1")([l4], l4.shape[1:3])
        r2 = RefineBlock(2 * nf, 2, act, name="refine2")([l3, r1], l3.shape[1:3])
        r3 = RefineBlock(nf, 2, act, name="refine3")([l2, r2], l2.shape[1:3])
        out = RefineBlock(nf, 2, act, end=True, name="refine4")([l1, r3], l1.shape[1:3])

        out = norm(nf, name="normalizer")(out)
        out = act(out)
        return ncsn_conv(self.num_channels, name="end_conv")(out)


@register_model(name="ncsnv2_128")
class NCSNv2_128(_NCSNv2Base):
    """Reference `models/ncsnv2.py:217-303`."""

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        act = _ACTS[self.nonlinearity]
        norm = self._norm()
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        h = ncsn_conv(nf, name="begin_conv")(h)

        layers = self._res_levels(
            h, act, norm,
            [
                [dict(out_ch=nf), dict(out_ch=nf)],
                [dict(out_ch=2 * nf, resample="down"), dict(out_ch=2 * nf)],
                [dict(out_ch=2 * nf, resample="down"), dict(out_ch=2 * nf)],
                [dict(out_ch=4 * nf, resample="down", dilation=2), dict(out_ch=4 * nf, dilation=2)],
                [dict(out_ch=4 * nf, resample="down", dilation=4), dict(out_ch=4 * nf, dilation=4)],
            ],
        )
        l1, l2, l3, l4, l5 = layers
        r1 = RefineBlock(4 * nf, 1, act, start=True, name="refine1")([l5], l5.shape[1:3])
        r2 = RefineBlock(2 * nf, 2, act, name="refine2")([l4, r1], l4.shape[1:3])
        r3 = RefineBlock(2 * nf, 2, act, name="refine3")([l3, r2], l3.shape[1:3])
        r4 = RefineBlock(nf, 2, act, name="refine4")([l2, r3], l2.shape[1:3])
        out = RefineBlock(nf, 2, act, end=True, name="refine5")([l1, r4], l1.shape[1:3])

        out = norm(nf, name="normalizer")(out)
        out = act(out)
        return ncsn_conv(self.num_channels, name="end_conv")(out)


@register_model(name="ncsnv2_256")
class NCSNv2_256(_NCSNv2Base):
    """Reference `models/ncsnv2.py:306-401` (extra 2nf level + refine31)."""

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        act = _ACTS[self.nonlinearity]
        norm = self._norm()
        nf = self.nf
        h = x if self.centered else 2 * x - 1.0
        h = ncsn_conv(nf, name="begin_conv")(h)

        layers = self._res_levels(
            h, act, norm,
            [
                [dict(out_ch=nf), dict(out_ch=nf)],
                [dict(out_ch=2 * nf, resample="down"), dict(out_ch=2 * nf)],
                [dict(out_ch=2 * nf, resample="down"), dict(out_ch=2 * nf)],
                [dict(out_ch=2 * nf, resample="down"), dict(out_ch=2 * nf)],
                [dict(out_ch=4 * nf, resample="down", dilation=2), dict(out_ch=4 * nf, dilation=2)],
                [dict(out_ch=4 * nf, resample="down", dilation=4), dict(out_ch=4 * nf, dilation=4)],
            ],
        )
        l1, l2, l3, l31, l4, l5 = layers
        r1 = RefineBlock(4 * nf, 1, act, start=True, name="refine1")([l5], l5.shape[1:3])
        r2 = RefineBlock(2 * nf, 2, act, name="refine2")([l4, r1], l4.shape[1:3])
        r31 = RefineBlock(2 * nf, 2, act, name="refine31")([l31, r2], l31.shape[1:3])
        r3 = RefineBlock(2 * nf, 2, act, name="refine3")([l3, r31], l3.shape[1:3])
        r4 = RefineBlock(nf, 2, act, name="refine4")([l2, r3], l2.shape[1:3])
        out = RefineBlock(nf, 2, act, end=True, name="refine5")([l1, r4], l1.shape[1:3])

        out = norm(nf, name="normalizer")(out)
        out = act(out)
        return ncsn_conv(self.num_channels, name="end_conv")(out)


class CondResidualBlock(nn.Module):
    """Conditional NCSN residual block (reference `layers.py:405-461`)."""

    out_ch: int
    num_classes: int
    act: Callable
    resample: Optional[str] = None
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x, y):
        in_ch = x.shape[-1]
        norm = lambda ch, name: ConditionalInstanceNorm2dPlus(ch, self.num_classes, name=name)
        h = norm(in_ch, "norm0")(x, y)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv(in_ch, dilation=self.dilation, name="conv0")(h)
                h = norm(in_ch, "norm1")(h, y)
                h = self.act(h)
                h = ncsn_conv(self.out_ch, dilation=self.dilation, name="conv1")(h)
                shortcut = ncsn_conv(self.out_ch, dilation=self.dilation, name="shortcut")(x)
            else:
                h = ncsn_conv(in_ch, name="conv0")(h)
                h = norm(in_ch, "norm1")(h, y)
                h = self.act(h)
                h = ConvMeanPool(self.out_ch, 3, adjust_padding=self.adjust_padding, name="conv1")(h)
                shortcut = ConvMeanPool(
                    self.out_ch, 1, adjust_padding=self.adjust_padding, name="shortcut"
                )(x)
        else:
            h = ncsn_conv(self.out_ch, dilation=max(self.dilation, 1), name="conv0")(h)
            h = norm(self.out_ch, "norm1")(h, y)
            h = self.act(h)
            h = ncsn_conv(self.out_ch, dilation=max(self.dilation, 1), name="conv1")(h)
            shortcut = (
                x
                if in_ch == self.out_ch and self.resample is None
                else ncsn_conv(self.out_ch, 1, name="shortcut")(x)
            )
        return shortcut + h


class CondCRPBlock(nn.Module):
    features: int
    n_stages: int
    num_classes: int
    act: Callable

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = ConditionalInstanceNorm2dPlus(
                path.shape[-1], self.num_classes, name=f"norm{i}"
            )(path, y)
            path = _pool5(path, "avg")
            path = ncsn_conv(self.features, bias=False, name=f"conv{i}")(path)
            x = path + x
        return x


class CondRCUBlock(nn.Module):
    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    act: Callable

    @nn.compact
    def __call__(self, x, y):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = ConditionalInstanceNorm2dPlus(
                    x.shape[-1], self.num_classes, name=f"norm_{i}_{j}"
                )(x, y)
                x = self.act(x)
                x = ncsn_conv(self.features, bias=False, name=f"conv_{i}_{j}")(x)
            x = x + residual
        return x


class CondMSFBlock(nn.Module):
    features: int
    n_inputs: int
    num_classes: int

    @nn.compact
    def __call__(self, xs, y, shape):
        out = 0.0
        for i in range(self.n_inputs):
            h = ConditionalInstanceNorm2dPlus(
                xs[i].shape[-1], self.num_classes, name=f"norm{i}"
            )(xs[i], y)
            h = ncsn_conv(self.features, bias=True, name=f"conv{i}")(h)
            out = out + bilinear_resize_align_corners(h, shape)
        return out


class CondRefineBlock(nn.Module):
    features: int
    n_inputs: int
    num_classes: int
    act: Callable
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs, y, shape):
        hs = []
        for i in range(self.n_inputs):
            hs.append(
                CondRCUBlock(xs[i].shape[-1], 2, 2, self.num_classes, self.act, name=f"adapt{i}")(
                    xs[i], y
                )
            )
        if self.n_inputs > 1:
            h = CondMSFBlock(self.features, self.n_inputs, self.num_classes, name="msf")(hs, y, shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.num_classes, self.act, name="crp")(h, y)
        return CondRCUBlock(
            self.features, 3 if self.end else 1, 2, self.num_classes, self.act, name="out"
        )(h, y)


@register_model(name="ncsn")
class NCSN(_NCSNv2Base):
    """Original NCSN with conditional InstanceNorm++ (reference `ncsnv2.py:131-214`).

    ``cond`` is the integer noise-level label vector."""

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        act = _ACTS[self.nonlinearity]
        nf = self.nf
        y = cond.astype(jnp.int32)
        h = x if self.centered else 2 * x - 1.0
        h = ncsn_conv(nf, name="begin_conv")(h)

        def res(h, out_ch, name, **kw):
            return CondResidualBlock(
                out_ch, self.num_scales, act, name=name, **kw
            )(h, y)

        l1 = res(res(h, nf, "res0_0"), nf, "res0_1")
        l2 = res(res(l1, 2 * nf, "res1_0", resample="down"), 2 * nf, "res1_1")
        l3 = res(
            res(l2, 2 * nf, "res2_0", resample="down", dilation=2), 2 * nf, "res2_1", dilation=2
        )
        l4 = res(
            res(l3, 2 * nf, "res3_0", resample="down", dilation=4,
                adjust_padding=self.image_size == 28),
            2 * nf, "res3_1", dilation=4,
        )

        r1 = CondRefineBlock(2 * nf, 1, self.num_scales, act, start=True, name="refine1")(
            [l4], y, l4.shape[1:3]
        )
        r2 = CondRefineBlock(2 * nf, 2, self.num_scales, act, name="refine2")([l3, r1], y, l3.shape[1:3])
        r3 = CondRefineBlock(nf, 2, self.num_scales, act, name="refine3")([l2, r2], y, l2.shape[1:3])
        out = CondRefineBlock(nf, 2, self.num_scales, act, end=True, name="refine4")(
            [l1, r3], y, l1.shape[1:3]
        )

        out = ConditionalInstanceNorm2dPlus(nf, self.num_scales, name="normalizer")(out, y)
        out = act(out)
        return ncsn_conv(self.num_channels, name="end_conv")(out)
