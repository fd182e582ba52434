"""Pallas 3x3 SAME conv for the score-network hot path.

Motivation (BENCH_NOTES.md): the sampler is conv-bound and XLA's
`conv_general_dilated` reaches only ~43-90 TFLOP/s at the model's shapes —
its implicit im2col streams the input multiple times.  This kernel keeps an
input tile resident in VMEM and accumulates the nine tap matmuls
(``x_shifted @ w[dy,dx]``) on the MXU in f32, so HBM sees one read of x and
one write of y per tile.

Forward-only Pallas; the backward pass is defined via `jax.custom_vjp`
using the XLA conv transpose rules (training correctness without a
hand-written backward kernel).

Stores are plain tiled writes (no sublane interleaving — see the Mosaic
fault note in `ops/pallas_kernels.py`).

STATUS: numerically validated (forward + custom-vjp backward) in interpret
mode.  The Mosaic toolchain in this image faults the TPU worker on every
W-axis (sublane) tile manipulation tried — offset slices AND pltpu.roll —
so the compiled path is disabled pending a toolchain fix; production convs
stay on `lax.conv_general_dilated`.  The kernel structure (halo DMA +
9 accumulated MXU dots) is the intended drop-in once Mosaic cooperates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, out_ref, scratch, sem, *, tile_h, W, Cin):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, tile_h + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[...]  # (tile_h+2, W+2, Cin)
    acc = None
    for dy in range(3):
        # H is a major dim: offset slices are cheap and alignment-free.
        x_dy = x[dy : dy + tile_h]
        for dx in range(3):
            # W is the sublane dim: offset slices fault this Mosaic
            # toolchain, so realize the shift with pltpu.roll + an
            # offset-0 slice instead.
            shifted = pltpu.roll(x_dy, x_dy.shape[1] - dx, axis=1) if dx else x_dy
            lhs = shifted[:, :W, :].reshape(tile_h * W, Cin)
            term = jnp.dot(
                lhs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
            acc = term if acc is None else acc + term
    out_ref[0] = acc.reshape(tile_h, W, -1).astype(out_ref.dtype)


def _pick_tile(H: int, W: int, Cin: int, Cout: int, itemsize: int) -> int:
    # budget: x tile + f32 accumulator + per-term operand copies
    budget = 8 * 2**20
    per_row = W * (Cin * itemsize + Cout * 4) * 3
    cap = max(1, budget // max(1, per_row))
    for t in range(min(cap, H), 0, -1):
        if H % t == 0:
            return t
    return 1


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _conv3x3_pallas_fwd_impl(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    B, H, W, Cin0 = x.shape
    _, _, _, Cout0 = w.shape
    # HBM DMA slices need 128-aligned lane dims: zero-pad channels (zero
    # weight rows/cols leave the valid outputs untouched).
    Cin = _round_up(Cin0, 128) if not interpret else Cin0
    Cout = _round_up(Cout0, 128) if not interpret else Cout0
    if Cin != Cin0 or Cout != Cout0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cin - Cin0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cin - Cin0), (0, Cout - Cout0)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tile_h = _pick_tile(H, W, Cin, Cout, x.dtype.itemsize)
    grid = (B, H // tile_h)
    kernel = functools.partial(_conv_kernel, tile_h=tile_h, W=W, Cin=Cin)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, 3, Cin, Cout), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, Cout), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W + 2, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w)[..., :Cout0]


def _hmajor_kernel(x_hbm, w_ref, out_ref, scratch, sem, *, tile_h, W, B, Cin):
    """3x3 conv on an (H, W, B, C) layout.

    With batch x channels as the (sublane, lane) tile, BOTH spatial shifts
    land on untiled major axes, so the per-tap offset slices are
    tile-granular — none of the W-axis sublane manipulations that fault
    this image's Mosaic toolchain (see module docstring).
    """
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * tile_h, tile_h + 2)], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[...]  # (tile_h+2, W+2, B, Cin)
    acc = None
    for dy in range(3):
        for dx in range(3):
            # both offsets index major (untiled) axes
            lhs = x[dy : dy + tile_h, dx : dx + W].reshape(tile_h * W * B, Cin)
            term = jnp.dot(lhs, w_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    out_ref[...] = acc.reshape(tile_h, W, B, -1).astype(out_ref.dtype)


def _pick_tile_hmajor(H: int, W: int, B: int, Cin: int, Cout: int, itemsize: int) -> int:
    # the TPU scoped-vmem limit is 16M; leave room for the f32 accumulator,
    # one materialized lhs copy, and the weight block
    budget = 6 * 2**20
    per_row = (W + 2) * B * (Cin * (itemsize + 2) + Cout * 4)
    cap = max(1, budget // max(1, per_row))
    for t in range(min(cap, H), 0, -1):
        if H % t == 0:
            return t
    return 1


def conv3x3_hmajor(xt: jnp.ndarray, w: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """3x3 SAME stride-1 conv on an (H, W, B, C) batch-minor layout.

    ``xt``: (H, W, B, Cin); ``w``: (3, 3, Cin, Cout) -> (H, W, B, Cout).
    """
    H, W, B, Cin0 = xt.shape
    _, _, _, Cout0 = w.shape
    Cin = _round_up(Cin0, 128) if not interpret else Cin0
    Cout = _round_up(Cout0, 128) if not interpret else Cout0
    if Cin != Cin0 or Cout != Cout0:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, Cin - Cin0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cin - Cin0), (0, Cout - Cout0)))
    xp = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, 0)))
    tile_h = _pick_tile_hmajor(H, W, B, Cin, Cout, xt.dtype.itemsize)
    kernel = functools.partial(_hmajor_kernel, tile_h=tile_h, W=W, B=B, Cin=Cin)
    out = pl.pallas_call(
        kernel,
        grid=(H // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, Cin, Cout), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, W, B, Cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W, B, Cout), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W + 2, B, Cin), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w)
    return out[..., :Cout0]


def conv3x3_pallas_hmajor(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """NHWC wrapper around :func:`conv3x3_hmajor` (transposes at the edges).

    For a full network the intended use is to keep activations batch-minor
    end-to-end and transpose once at the boundaries; this wrapper exists for
    drop-in correctness tests and per-op benchmarking.
    """
    xt = jnp.transpose(x, (1, 2, 0, 3))
    yt = conv3x3_hmajor(xt, w, interpret=interpret)
    return jnp.transpose(yt, (2, 0, 1, 3))


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """3x3 SAME stride-1 conv (NHWC/HWIO) with a Pallas forward."""
    return _conv3x3_pallas_fwd_impl(x, w, interpret)


def _fwd(x, w, interpret):
    return _conv3x3_pallas_fwd_impl(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    # standard conv VJPs via XLA (correct; backward perf is a training
    # concern handled separately)
    _, vjp = jax.vjp(lambda xx, ww: _xla_conv(xx, ww), x, w)
    return vjp(g)


conv3x3_pallas.defvjp(_fwd, _bwd)
