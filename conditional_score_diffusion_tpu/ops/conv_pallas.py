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
