"""Pallas TPU kernels for the StyleGAN2 FIR resampling hot path.

Reference native ops: `op/upfirdn2d_kernel.cu` (+ `op/fused_bias_act_kernel.cu`).

These kernels implement the two shapes that sit on NCSN++'s hot path when
``model.fir=True`` (reference `models/up_or_down_sampling.py:196-257`):

  * ``fir_upsample2``:   upfirdn2d(x, k2d * 4, up=2, pad=(2, 1))
  * ``fir_downsample2``: upfirdn2d(x, k2d,     down=2, pad=(1, 1))

with a separable 4-tap kernel (every config uses [1,3,3,1]).  The win over
the two-pass XLA formulation is memory traffic: both separable passes run
in VMEM on one tile, so HBM sees exactly one read of x and one write of y
instead of an intermediate round trip.

Taps enter the kernel as Python-float scalars (compile-time constants).

Math (polyphase, 4-tap c = normalized 1-D kernel, zero boundaries):
  up2:   out[2t]   = c3*x[t-1] + c1*x[t]
         out[2t+1] = c2*x[t]   + c0*x[t+1]
  down2 (with 1 left pad): out[t] = c3*x[2t-1] + c2*x[2t] + c1*x[2t+1] + c0*x[2t+2]

Tiles are DMA'd with a 1-row halo from HBM (inputs are pre-padded by one
pixel in XLA so the kernel is boundary-free).

STATUS: numerically validated against the XLA formulation in interpret mode
(tests/test_pallas_kernels.py).  On the current toolchain (axon remote
compile, libtpu of this image) the Mosaic-compiled kernels fault the TPU
worker on any W-axis (sublane) interleaving store — reshape-interleave,
stride-2 stores, and planar (W,2,C) writes all reproduce it, while the same
patterns on the H (major) axis work.  Until that compiler issue is resolved,
the production FIR path stays on `ops.upfirdn` (the lhs-dilated conv
formulation); these kernels are the drop-in replacements to re-enable.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_taps(k: Sequence[float], gain: float) -> np.ndarray:
    k = np.asarray(k, dtype=np.float32)
    assert k.ndim == 1 and k.shape[0] == 4, "pallas FIR path supports 4-tap separable kernels"
    return k / k.sum() * gain


def _up2_pass(x, c, axis):
    """Vertical/horizontal zero-stuffed upsample+FIR on an in-VMEM tile.

    x has a 1-element halo on each side along `axis`; output length is
    2*(n-2) for input length n.
    """
    n = x.shape[axis]

    def sl(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    core_prev = sl(0, n - 2)   # x[t-1]
    core = sl(1, n - 1)        # x[t]
    core_next = sl(2, n)       # x[t+1]
    even = c[3] * core_prev + c[1] * core
    odd = c[2] * core + c[0] * core_next
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] = shape[axis] * 2
    return out.reshape(shape)


def _down2_pass(x, c, axis):
    """Decimating 4-tap FIR along `axis`; input pre-padded by 1 on the left
    and 2 on the right (length 2m+3 for m outputs)."""
    n = x.shape[axis]
    m = (n - 3 + 1) // 2

    def sl(lo):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, lo + 2 * m, 2)
        return x[tuple(idx)]

    return c[3] * sl(0) + c[2] * sl(1) + c[1] * sl(2) + c[0] * sl(3)


def _up_kernel(x_hbm, out_ref, scratch, sem, *, taps, tile_h, W, C):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, tile_h + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    y = _up2_pass(scratch[...], taps, axis=0)   # (2*tile_h, W+2, C)
    y = _up2_pass(y, taps, axis=1)              # (2*tile_h, 2W, C)
    out_ref[0] = y


def _down_kernel(x_hbm, out_ref, scratch, sem, *, taps, tile_h, W, C):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * 2 * tile_h, 2 * tile_h + 3)], scratch, sem
    )
    dma.start()
    dma.wait()
    y = _down2_pass(scratch[...], taps, axis=0)  # (tile_h, 2W+3, C)
    y = _down2_pass(y, taps, axis=1)             # (tile_h, W, C)
    out_ref[0] = y


def _pick_tile(H: int, W: int, C: int, itemsize: int) -> int:
    """Largest divisor of H whose working set (input tile + both pass
    intermediates + output tile, ~12 tile-sized buffers after upsampling)
    stays well under the ~16 MB VMEM scoped limit."""
    budget = 4 * 2**20  # bytes for one (tile_h, W, C) plane, x12 expansion
    cap = max(1, budget // max(1, W * C * itemsize * 12))
    for t in range(min(cap, H), 0, -1):
        if H % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fir_upsample2(x: jnp.ndarray, k: tuple = (1, 3, 3, 1), interpret: bool = False):
    """Pallas equivalent of `ops.upfirdn.upsample_2d(x, k, factor=2)`."""
    B, H, W, C = x.shape
    taps = tuple(float(v) for v in _norm_taps(k, gain=2.0))  # per-axis sqrt(4)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tile_h = _pick_tile(H, W, C, x.dtype.itemsize)
    grid = (B, H // tile_h)
    kernel = functools.partial(_up_kernel, taps=taps, tile_h=tile_h, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * tile_h, 2 * W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fir_downsample2(x: jnp.ndarray, k: tuple = (1, 3, 3, 1), interpret: bool = False):
    """Pallas equivalent of `ops.upfirdn.downsample_2d(x, k, factor=2)`."""
    B, H, W, C = x.shape
    taps = tuple(float(v) for v in _norm_taps(k, gain=1.0))
    # pad 1 left / 2 right so the 4-tap window never leaves the buffer
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    Ho, Wo = H // 2, W // 2
    tile_h = _pick_tile(Ho, W, C, x.dtype.itemsize)
    grid = (B, Ho // tile_h)
    kernel = functools.partial(_down_kernel, taps=taps, tile_h=tile_h, W=Wo, C=C)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, Wo, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * tile_h + 3, W + 3, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)


def _bias_act_kernel(x_ref, b_ref, out_ref, *, negative_slope, scale):
    h = x_ref[...] + b_ref[...]
    out_ref[...] = jnp.where(h >= 0, h, negative_slope * h) * scale


@functools.partial(jax.jit, static_argnames=("negative_slope", "scale", "interpret"))
def fused_leaky_relu_pallas(
    x: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.2,
    scale: float = 2**0.5,
    interpret: bool = False,
):
    """Pallas `fused_bias_act` (reference `op/fused_bias_act_kernel.cu`).

    XLA fuses this chain anyway (SURVEY.md §2.4) — kept for capability
    parity and as the benchmark counterpart of the CUDA kernel.
    """
    kernel = functools.partial(
        _bias_act_kernel, negative_slope=negative_slope, scale=scale
    )
    b = jnp.broadcast_to(bias.reshape((1,) * (x.ndim - 1) + (-1,)), x.shape)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, b)
