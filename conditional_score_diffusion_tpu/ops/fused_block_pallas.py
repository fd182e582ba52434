"""Fused GroupNorm+SiLU+3x3-conv Pallas kernel (H-major layout).

Motivation (BENCH_NOTES.md round 2): the sampler's remaining gap to the MXU
roofline sits in (a) HBM round trips between GN / SiLU / conv at high
resolution and (b) the latency-bound low-resolution tail where each small
XLA conv runs at 2.5-44 TF/s.  A score-network resblock evaluates

    h   = conv3x3(silu(GN(x))) + bias + temb        (x2 per block)

This kernel performs normalize -> SiLU -> 9-tap MXU conv -> (+bias +temb)
in ONE VMEM pass over the input tile: HBM sees one read of x (the GN
statistics are a cheap XLA reduction outside) and one write of the output,
instead of XLA's read(stats) + read/write(normalized) + read(conv input) +
write(conv out) + read/write(temb add).

Layout: (H, W, B, C) — batch x channels is the (sublane, lane) tile, so the
3x3 tap shifts land on untiled major axes (the Mosaic W-axis sublane fault
documented in `ops/conv_pallas.py` is never triggered).

Numerics match `conv3x3(silu(gn(x)))` with SAME zero padding applied to the
*activated* tensor (the reference applies conv padding after the
nonlinearity): the kernel zeroes the activated halo at image borders.

Reference behavior being fused: `models/layers.py:567-641` /
`models/layerspp.py:166-274` resblock bodies (GroupNorm -> SiLU -> conv ->
+temb), reimplemented TPU-first rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def group_norm_stats(x_hwbc: jnp.ndarray, num_groups: int):
    """Per-(batch, channel) scale/shift for GroupNorm on (H, W, B, C) data.

    Returns ``(mean_bc, rstd_bc)`` broadcast from per-(B, G) statistics to
    per-(B, C) arrays, so the kernel applies GN as an elementwise affine.
    """
    H, W, B, C = x_hwbc.shape
    G = num_groups
    # f32 statistics regardless of input dtype, matching the XLA reference
    # path (gn_silu_conv3x3_reference) the kernel replaces.
    xg = x_hwbc.reshape(H, W, B, G, C // G).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(0, 1, 4))  # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(0, 1, 4)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + 1e-6)  # GroupNorm eps=1e-6 (layerspp.py:67)
    mean_bc = jnp.repeat(mean, C // G, axis=1)
    rstd_bc = jnp.repeat(rstd, C // G, axis=1)
    return mean_bc, rstd_bc


def _fused_kernel(
    x_hbm, scale_ref, shift_ref, w_ref, out_bias_ref, out_ref, scratch, sem,
    *, tile_h, W, B, Cin, n_tiles,
):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * tile_h, tile_h + 2)], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[...].astype(jnp.float32)  # (tile_h+2, W+2, B, Cin)

    # GN as elementwise affine (stats precomputed) + SiLU, on the VPU
    act = x * scale_ref[...] + shift_ref[...]
    act = act * jax.nn.sigmoid(act)

    # zero the activated halo where it corresponds to SAME zero padding of
    # the *activation* (borders of the full image); W borders are static
    # major-axis positions, H borders depend on the tile index
    col = jax.lax.broadcasted_iota(jnp.int32, act.shape, 1)
    mask = (col >= 1) & (col <= W)
    row = jax.lax.broadcasted_iota(jnp.int32, act.shape, 0)
    mask &= ~((row == 0) & (i == 0))
    mask &= ~((row == tile_h + 1) & (i == n_tiles - 1))
    act = jnp.where(mask, act, 0.0).astype(w_ref.dtype)

    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = act[dy : dy + tile_h, dx : dx + W].reshape(tile_h * W * B, Cin)
            term = jnp.dot(lhs, w_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    acc = acc.reshape(tile_h, W, B, -1) + out_bias_ref[...]
    out_ref[...] = acc.astype(out_ref.dtype)


def _pick_tile(H: int, W: int, B: int, Cin: int, Cout: int, itemsize: int) -> int:
    budget = 6 * 2**20
    per_row = (W + 2) * B * (Cin * (itemsize + 4 + 2) + Cout * 4)
    cap = max(1, budget // max(1, per_row))
    for t in range(min(cap, H), 0, -1):
        if H % t == 0:
            return t
    return 1


def gn_silu_conv3x3_hmajor(
    xt: jnp.ndarray,
    w: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    bias: jnp.ndarray | None = None,
    temb: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``conv3x3(silu(GN(x))) (+bias) (+temb)`` on (H, W, B, C) data.

    ``xt``: (H, W, B, Cin); ``w``: (3, 3, Cin, Cout); ``gamma``/``beta``:
    (Cin,); ``bias``: (Cout,) or None; ``temb``: (B, Cout) or None.
    """
    H, W, B, Cin0 = xt.shape
    Cout0 = w.shape[-1]

    mean_bc, rstd_bc = group_norm_stats(xt, num_groups)
    # fold GN affine into one scale/shift per (B, C):
    #   (x - mean) * rstd * gamma + beta = x * (rstd*gamma) + (beta - mean*rstd*gamma)
    scale = rstd_bc * gamma[None, :]
    shift = beta[None, :] - mean_bc * scale

    out_bias = jnp.zeros((B, Cout0), jnp.float32)
    if bias is not None:
        out_bias = out_bias + bias[None, :].astype(jnp.float32)
    if temb is not None:
        out_bias = out_bias + temb.astype(jnp.float32)

    Cin = _round_up(Cin0, 128) if not interpret else Cin0
    Cout = _round_up(Cout0, 128) if not interpret else Cout0
    if Cin != Cin0:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, Cin - Cin0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cin - Cin0), (0, 0)))
        # padded channels: scale 0 / shift 0 -> act = silu(0) = 0, no effect
        scale = jnp.pad(scale, ((0, 0), (0, Cin - Cin0)))
        shift = jnp.pad(shift, ((0, 0), (0, Cin - Cin0)))
    if Cout != Cout0:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Cout - Cout0)))
        out_bias = jnp.pad(out_bias, ((0, 0), (0, Cout - Cout0)))

    xp = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, 0)))
    tile_h = _pick_tile(H, W, B, Cin, Cout, xt.dtype.itemsize)
    n_tiles = H // tile_h
    kernel = functools.partial(
        _fused_kernel, tile_h=tile_h, W=W, B=B, Cin=Cin, n_tiles=n_tiles
    )
    flops = 2 * 9 * H * W * B * Cin * Cout
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((B, Cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, Cout), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, W, B, Cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W, B, Cout), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W + 2, B, Cin), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize + H * W * B * Cout * xt.dtype.itemsize,
            transcendentals=xp.size,
        ),
        interpret=interpret,
    )(xp, scale.astype(jnp.float32), shift.astype(jnp.float32), w, out_bias)
    return out[..., :Cout0]


def gn_silu_conv3x3_nhwc(
    x: jnp.ndarray,
    w: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    bias: jnp.ndarray | None = None,
    temb: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """NHWC wrapper (transposes at the edges) — for tests/benchmarks; full
    networks should stay batch-minor between fused calls."""
    xt = jnp.transpose(x, (1, 2, 0, 3))
    yt = gn_silu_conv3x3_hmajor(
        xt, w, gamma, beta, num_groups, bias=bias, temb=temb, interpret=interpret
    )
    return jnp.transpose(yt, (2, 0, 1, 3))


def gn_silu_conv3x3_reference(x, w, gamma, beta, num_groups, bias=None, temb=None):
    """XLA reference composition (NHWC) for correctness tests and the
    fused-vs-unfused benchmark."""
    B, H, W, C = x.shape
    G = num_groups
    xg = x.reshape(B, H, W, G, C // G).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    h = ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(B, H, W, C)
    h = h * gamma + beta
    h = (h * jax.nn.sigmoid(h)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bias is not None:
        y = y + bias
    if temb is not None:
        y = y + temb[:, None, None, :]
    return y
