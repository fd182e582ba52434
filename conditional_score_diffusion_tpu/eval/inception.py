"""InceptionV3 (FID variant) in Flax, for FID/Joint-FID activations.

Reference: `models/inception.py` (pytorch-fid's InceptionV3 with the
TF-FID patches: FIDInception{A,C,E1,E2} — avg-pool branches with
count_include_pad=False, and a max-pool pool-branch in the last Mixed_7c
block) with block-index feature taps {0:64, 1:192, 2:768, 3:2048}.

TPU design: inference-only, so every BasicConv2d's BatchNorm is folded into
the conv weights at load time (`fold_batchnorm`) — the network becomes pure
conv+bias+relu chains that XLA fuses aggressively.  NHWC layout.

Weights: the reference downloads `pt_inception-2015-12-05-6726825d.pth`
(`models/inception.py:14`).  In zero-egress environments, point
``CSDT_INCEPTION_WEIGHTS`` at a local copy of that file;
:func:`load_fid_inception_params` converts it (torch -> NHWC flax, BN
folded).  Without weights the architecture still builds (random init) so
shape/pipeline tests run.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}


class BasicConv2d(nn.Module):
    """Conv (+folded BN) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        # metric-path conv: force full f32 accumulation (TPU default
        # bf16-pass precision would perturb FID activations)
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=True,
            precision=jax.lax.Precision.HIGHEST,
            name="conv",
        )(x)
        return nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return p


def _avg_pool_nocount(x, window=3, stride=1, pad=1):
    """3x3 avg pool with count_include_pad=False (the FID patch)."""
    ones = jnp.ones_like(x[..., :1])
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return summed / counts


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # 'avg' (Mixed_7b / FIDInceptionE_1) | 'max' (Mixed_7c / E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_nocount(x)
        else:
            bp = _max_pool(x, window=3, stride=1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """FID InceptionV3 returning per-block feature taps."""

    output_blocks: Tuple[int, ...] = (3,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outputs = {}
        last = max(self.output_blocks)
        if self.resize_input:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 299, 299, C), method="bilinear")
        if self.normalize_input:
            x = 2 * x - 1

        # Block 0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        outputs[0] = x
        if last >= 1:
            x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = _max_pool(x)
            outputs[1] = x
        if last >= 2:
            x = InceptionA(32, name="Mixed_5b")(x)
            x = InceptionA(64, name="Mixed_5c")(x)
            x = InceptionA(64, name="Mixed_5d")(x)
            x = InceptionB(name="Mixed_6a")(x)
            x = InceptionC(128, name="Mixed_6b")(x)
            x = InceptionC(160, name="Mixed_6c")(x)
            x = InceptionC(160, name="Mixed_6d")(x)
            x = InceptionC(192, name="Mixed_6e")(x)
            outputs[2] = x
        if last >= 3:
            x = InceptionD(name="Mixed_7a")(x)
            x = InceptionE("avg", name="Mixed_7b")(x)
            x = InceptionE("max", name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2), keepdims=False)  # adaptive avg pool (1,1)
            outputs[3] = x
        return [outputs[i] for i in self.output_blocks]


def fold_batchnorm(w, gamma, beta, mean, var, eps=1e-3):
    """Fold BN(gamma,beta,mean,var) into conv (w HWIO, no bias)."""
    scale = gamma / np.sqrt(var + eps)
    return w * scale[None, None, None, :], beta - mean * scale


def load_fid_inception_params(path: Optional[str] = None) -> Dict:
    """Convert the pt_inception torch state dict to folded NHWC flax params.

    ``path`` defaults to $CSDT_INCEPTION_WEIGHTS.  Raises FileNotFoundError
    when no weights are available.
    """
    path = path or os.environ.get("CSDT_INCEPTION_WEIGHTS", "")
    if not path or not os.path.isfile(path):
        raise FileNotFoundError(
            "FID inception weights not found; set CSDT_INCEPTION_WEIGHTS to a "
            "local pt_inception-2015-12-05-6726825d.pth"
        )
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params: Dict = {}

    def put(flax_path: List[str], kernel: np.ndarray, bias: np.ndarray):
        node = params
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = {"conv": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}

    prefixes = set()
    for k in sd:
        if k.endswith("conv.weight"):
            prefixes.add(k[: -len(".conv.weight")])
    for prefix in prefixes:
        w = sd[f"{prefix}.conv.weight"].numpy()  # OIHW
        gamma = sd[f"{prefix}.bn.weight"].numpy()
        beta = sd[f"{prefix}.bn.bias"].numpy()
        mean = sd[f"{prefix}.bn.running_mean"].numpy()
        var = sd[f"{prefix}.bn.running_var"].numpy()
        w_hwio = np.transpose(w, (2, 3, 1, 0))
        w_f, b_f = fold_batchnorm(w_hwio, gamma, beta, mean, var)
        put(prefix.split("."), w_f, b_f)
    return params


def create_inception(output_blocks: Sequence[int] = (3,), params: Optional[Dict] = None):
    """Build the model (+random params when none given) and return
    ``(apply_fn, params)`` where ``apply_fn(params, images01_nhwc)`` yields
    the requested activation list."""
    module = InceptionV3FID(output_blocks=tuple(sorted(output_blocks)))
    if params is None:
        params = module.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))["params"]

    def apply_fn(p, x):
        return module.apply({"params": p}, x)

    return apply_fn, params
