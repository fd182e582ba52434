"""im2col-matmul formulation of the stride-1 3x3 conv for tiny spatial sizes.

The flagship sampler's low-resolution tail (5x5-20x20, C=288) runs XLA's
native conv lowering at 2.5-44 TF/s (BENCH_NOTES round 2 attribution) —
latency-bound, far from the MXU roofline.  At these sizes the whole
activation fits comfortably in VMEM, so materializing the 9 shifted taps
(9x activation traffic — trivial at 5x5) and issuing ONE large MXU matmul
``(B*H*W, 9C) @ (9C, K)`` can beat the conv lowering.

Exact math (float-associativity aside): this is the textbook im2col
unrolling, weights reshaped at call time, parameter layout untouched.

A 9-shift einsum variant was measured 4x SLOWER than the native conv at
160x160 in round 1 (BENCH_NOTES) — the matmul formulation only makes sense
in the small-spatial regime; see ``scripts/bench_lowres_conv.py`` for the
shape-gated evidence.
"""

from __future__ import annotations

import jax.numpy as jnp


def conv3x3_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 SAME conv (NHWC, HWIO weights) as one matmul."""
    B, H, W, C = x.shape
    K = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)
    ]
    p = jnp.concatenate(patches, axis=-1)  # (B, H, W, 9C), tap-major
    wm = w.reshape(9 * C, K).astype(x.dtype)
    y = p.reshape(B * H * W, 9 * C) @ wm
    return y.reshape(B, H, W, K)
