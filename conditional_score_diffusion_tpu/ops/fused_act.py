"""Fused bias + leaky-ReLU with gain.

Reference: `op/fused_bias_act_kernel.cu` / `op/fused_act.py:86-97` (CPU
fallback: ``scale * leaky_relu(x + bias)``).  On TPU this pattern is a pure
VPU elementwise chain that XLA fuses into the adjacent op for free, so the
default implementation is plain jnp; a Pallas version exists for parity /
benchmarking (see `ops/pallas_kernels.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = 2**0.5,
) -> jnp.ndarray:
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale
