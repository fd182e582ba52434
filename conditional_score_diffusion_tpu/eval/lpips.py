"""LPIPS (AlexNet) perceptual distance in Flax.

Reference: the `lpips.LPIPS(net='alex')` usage in
`lightning_callbacks/PairedCallback.py:155-156` and `evaluation.py` —
AlexNet feature taps (relu1..relu5), channel-unit-normalization, learned
non-negative 1x1 heads, spatial mean, summed over layers.

Weights: torchvision AlexNet + the lpips `alex.pth` linear heads.  In
zero-egress environments set ``CSDT_LPIPS_ALEXNET`` (alexnet state dict) and
``CSDT_LPIPS_LIN`` (lpips alex lin weights).  :func:`load_lpips` raises
FileNotFoundError otherwise — callers skip the metric.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, pad), maxpool after layers 0,1
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}
# ImageNet normalization used by lpips' scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _alex_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: NHWC in [-1, 1].  Returns the 5 relu taps."""
    h = (x - _SHIFT) / _SCALE
    taps = []
    for i, (out_ch, k, s, p) in enumerate(_ALEX_CONVS):
        w, b = params[f"conv{i}"]["kernel"], params[f"conv{i}"]["bias"]
        # metric-path conv: full f32 accumulation (see eval/metrics.py note)
        h = jax.lax.conv_general_dilated(
            h, w, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + b
        h = jax.nn.relu(h)
        taps.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (0, 0), (0, 0), (0, 0)],
            )
    return taps


def _normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance(params: Dict, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img1/img2: NHWC in [0, 1] (scaled to [-1,1] internally, matching the
    reference's ``2*x - 1`` at the call sites). Returns [B] distances."""
    x1 = 2 * img1 - 1
    x2 = 2 * img2 - 1
    f1 = _alex_features(params["alex"], x1)
    f2 = _alex_features(params["alex"], x2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_normalize(a) - _normalize(b)) ** 2
        lin = params["lin"][f"lin{i}"]  # [C] non-negative weights
        val = jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
        total = total + val
    return total


def load_lpips(
    alexnet_path: Optional[str] = None, lin_path: Optional[str] = None
) -> Callable:
    """Build an LPIPS fn from local weight files; raises if unavailable."""
    alexnet_path = alexnet_path or os.environ.get("CSDT_LPIPS_ALEXNET", "")
    lin_path = lin_path or os.environ.get("CSDT_LPIPS_LIN", "")
    if not (alexnet_path and os.path.isfile(alexnet_path)):
        raise FileNotFoundError(
            "LPIPS needs AlexNet weights; set CSDT_LPIPS_ALEXNET to a local "
            "torchvision alexnet state dict"
        )
    if not (lin_path and os.path.isfile(lin_path)):
        raise FileNotFoundError(
            "LPIPS needs linear-head weights; set CSDT_LPIPS_LIN to the lpips alex.pth"
        )
    import torch

    sd = torch.load(alexnet_path, map_location="cpu")
    alex = {}
    conv_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.startswith("features") and k.endswith(".weight")},
        key=lambda s: int(s.split(".")[1]),
    )
    for i, key in enumerate(conv_keys):
        w = sd[f"{key}.weight"].numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
        b = sd[f"{key}.bias"].numpy()
        alex[f"conv{i}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    lin_sd = torch.load(lin_path, map_location="cpu")
    lin = {}
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy()  # [1, C, 1, 1]
        lin[f"lin{i}"] = jnp.asarray(w.reshape(-1))
    params = {"alex": alex, "lin": lin}

    @jax.jit
    def fn(img1, img2):
        return lpips_distance(params, img1, img2)

    return fn
