"""upfirdn2d and StyleGAN2-style FIR resampling, TPU-native.

Reference semantics: `op/upfirdn2d.py:145-200` (`upfirdn2d_native` is the
spec: zero-stuff upsample -> pad -> correlate with the flipped kernel ->
stride-slice downsample) and `models/up_or_down_sampling.py` (the
`upsample_2d` / `downsample_2d` / fused conv variants with their gain and
padding conventions).

TPU design: instead of a CUDA gather/scatter kernel, the whole op is one
`lax.conv_general_dilated` — `lhs_dilation` implements the zero-stuffed
upsample, `window_strides` the downsample, and the FIR tap becomes a
depthwise correlation kernel.  XLA lowers this to fused VPU code adjacent to
the surrounding convs.  Separable kernels (every `fir_kernel` the reference
configs use, e.g. [1,3,3,1]) run as two rank-1 passes, halving the work.

Layout is NHWC (TPU-native).  All functions are differentiable through XLA's
conv transpose rules — no hand-written double-backward needed (the reference
wires grad/grad-grad manually in `op/upfirdn2d.py:19-142`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Kernel = Union[Sequence[float], np.ndarray]


def setup_kernel(k: Kernel, gain: float = 1.0) -> np.ndarray:
    """Normalize a FIR kernel to sum 1 and apply gain.

    1-D inputs become separable 2-D kernels (outer product), matching
    `models/up_or_down_sampling.py:_setup_kernel`.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k * gain


def _separable_factors(kernel: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Return rank-1 factors (col, row) with kernel == outer(col, row), or None."""
    u, s, vt = np.linalg.svd(kernel.astype(np.float64))
    if kernel.shape[0] > 1 and s[1] > 1e-10 * s[0]:
        return None
    col = u[:, 0] * s[0]
    row = vt[0, :]
    # fold the sign so both factors are mostly-positive
    if col.sum() < 0:
        col, row = -col, -row
    return col.astype(np.float32), row.astype(np.float32)


def _depthwise_fir(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: Tuple[int, int],
    down: Tuple[int, int],
    pad: Tuple[Tuple[int, int], Tuple[int, int]],
) -> jnp.ndarray:
    """One dilated depthwise conv implementing pad->upfir->down in NHWC."""
    C = x.shape[-1]
    kh, kw = kernel.shape
    # Correlate with the flipped kernel == convolve with the kernel
    # (reference flips before F.conv2d at op/upfirdn2d.py:186).
    rhs = jnp.flip(kernel, (0, 1)).reshape(kh, kw, 1, 1)
    rhs = jnp.tile(rhs, (1, 1, 1, C)).astype(x.dtype)
    # lhs_dilation yields length in*up - (up - 1); the reference zero-pads to
    # in*up (trailing zeros), so fold the extra (up - 1) into pad-high.
    pady = (pad[0][0], pad[0][1] + up[0] - 1)
    padx = (pad[1][0], pad[1][1] + up[1] - 1)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=down,
        padding=(pady, padx),
        lhs_dilation=up,
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upfirdn2d(
    x: jnp.ndarray,
    kernel: Kernel,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Upsample (zero-stuff) -> FIR filter -> downsample, fused.

    Args:
      x: NHWC input.
      kernel: 2-D FIR tap (already gain-scaled), or 1-D (made separable).
      up/down: integer resampling factors.
      pad: (pad_before, pad_after) applied to both spatial dims after
        upsampling, exactly as the reference CUDA op.

    Matches `op/upfirdn2d.py:upfirdn2d_native` on NCHW inputs transposed to
    NHWC (see tests/test_ops.py oracle).
    """
    kernel = np.asarray(kernel, dtype=np.float32)
    if kernel.ndim == 1:
        kernel = np.outer(kernel, kernel)

    factors = _separable_factors(kernel)
    if factors is not None and kernel.shape[0] > 1:
        col, row = factors
        # Vertical pass: rows only.
        y = _depthwise_fir(
            x,
            jnp.asarray(col).reshape(-1, 1),
            up=(up, 1),
            down=(down, 1),
            pad=((pad[0], pad[1]), (0, 0)),
        )
        # Horizontal pass: cols only.
        return _depthwise_fir(
            y,
            jnp.asarray(row).reshape(1, -1),
            up=(1, up),
            down=(1, down),
            pad=((0, 0), (pad[0], pad[1])),
        )

    return _depthwise_fir(
        x,
        jnp.asarray(kernel),
        up=(up, up),
        down=(down, down),
        pad=((pad[0], pad[1]), (pad[0], pad[1])),
    )


def upsample_2d(x: jnp.ndarray, k: Optional[Kernel] = None, factor: int = 2, gain: float = 1.0):
    """FIR upsample (reference `up_or_down_sampling.py:196-223`)."""
    assert factor >= 1
    if k is None:
        k = [1] * factor
    kernel = setup_kernel(k, gain * (factor**2))
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jnp.ndarray, k: Optional[Kernel] = None, factor: int = 2, gain: float = 1.0):
    """FIR downsample (reference `up_or_down_sampling.py:226-257`)."""
    assert factor >= 1
    if k is None:
        k = [1] * factor
    kernel = setup_kernel(k, gain)
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k: Optional[Kernel] = None,
    factor: int = 2,
    gain: float = 1.0,
):
    """Fused upsample + conv (reference `up_or_down_sampling.py:72-142`).

    ``w`` is an HWIO conv kernel (as used by the surrounding Flax convs).
    Implemented as a stride-``factor`` transposed conv followed by the FIR
    tap — the transposed conv maps straight onto the MXU.
    """
    assert factor >= 1
    kh, kw, _, _ = w.shape
    assert kh == kw
    if k is None:
        k = [1] * factor
    kernel = setup_kernel(k, gain * (factor**2))
    p = (kernel.shape[0] - factor) - (kw - 1)

    # Zero-stuff x by `factor` with full (k-1) padding and correlate with w:
    # exactly a stride-`factor` transposed convolution, expressed directly as
    # one lhs-dilated conv (lowers straight onto the MXU).
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(y, kernel, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k: Optional[Kernel] = None,
    factor: int = 2,
    gain: float = 1.0,
):
    """Fused conv + downsample (reference `up_or_down_sampling.py:145-180`)."""
    assert factor >= 1
    kh, kw, _, _ = w.shape
    assert kh == kw
    if k is None:
        k = [1] * factor
    kernel = setup_kernel(k, gain)
    p = (kernel.shape[0] - factor) + (kw - 1)
    y = upfirdn2d(x, kernel, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        y,
        w.astype(x.dtype),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample (reference `up_or_down_sampling.py:59-64`)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, 1, W, 1, C)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(B, H * factor, W * factor, C)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Mean-pool downsample (reference `up_or_down_sampling.py:67-70`)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    return jnp.mean(x, axis=(2, 4))
