"""Exact space-to-depth recasts of the stride-1 3x3 convolution.

Motivation (BENCH_NOTES.md round 2): 90% of flagship sampler device time is
conv-rooted fusions dominated by 160x160 C=96 stride-1 3x3 convs — C=96
occupies only 75% of the 128-wide TPU lanes.  A 2x2 space-to-depth recast
moves the same convolution to (H/2, W/2, 4C) where 4C=384 is an exact
multiple of 128 (100% lane occupancy) at the price of extra MACs:

- ``conv3x3_s2d_dense``: one 3x3 conv over (H/2, W/2, 4C)->(H/2, W/2, 4K).
  The block-space kernel is 25% dense (36 of 144 C*K sub-blocks non-zero),
  so the dense recast executes 4x the MACs of the direct conv.
- ``conv3x3_s2d_4way``: four 2x2 convs (one per output sub-position, each
  with its own asymmetric padding) over (H/2, W/2, 4C)->(H/2, W/2, K),
  concatenated on channels.  9 of 16 sub-taps are non-zero per conv, so
  this executes 16/9 ~= 1.78x the MACs.

Both are *mathematically exact* rewrites (kernel entries are rearranged,
never approximated): checkpoints and parameter layouts are untouched, the
transform is applied to the weight at call time.  Whether the occupancy win
pays for the extra MACs is an empirical question — see
``scripts/bench_space_to_depth.py`` and BENCH_NOTES.md round 3.

Reference behavior being recast: the stride-1 3x3 convs of
`/root/reference/models/ddpm.py:149-213` (`conv3x3` at every resolution).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (sy*2+sx)*C + c."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(
            f"space_to_depth needs even spatial dims, got H={H}, W={W}; "
            "the s2d conv dispatch policies must gate on evenness"
        )
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, H2, W2, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, H2, W2, 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H2 * 2, W2 * 2, C)


def _tap_split(dy: int, u: int) -> tuple[int, int]:
    """Full-res tap row 2i+dy+u-1 -> (block delta, sub-row)."""
    e = dy + u - 1
    return e // 2, e % 2  # floor division / non-negative mod


def s2d_dense_kernel(w) -> np.ndarray:
    """(3, 3, C, K) HWIO kernel -> (3, 3, 4C, 4K) block-space kernel."""
    w = np.asarray(w)
    _, _, C, K = w.shape
    w2 = np.zeros((3, 3, 4 * C, 4 * K), w.dtype)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    dby, sy = _tap_split(dy, u)
                    dbx, sx = _tap_split(dx, v)
                    ci = (sy * 2 + sx) * C
                    co = (dy * 2 + dx) * K
                    w2[dby + 1, dbx + 1, ci : ci + C, co : co + K] += w[u, v]
    return w2


def conv3x3_s2d_dense(x2: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv in block space: (B, H/2, W/2, 4C) -> (B, H/2, W/2, 4K)."""
    return lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d_subgrid_kernels(w) -> list[tuple[np.ndarray, tuple, tuple]]:
    """(3, 3, C, K) -> four ((2, 2, 4C, K) kernel, pad_y, pad_x) triples,
    ordered by output sub-position (dy, dx) = (0,0), (0,1), (1,0), (1,1)."""
    w = np.asarray(w)
    _, _, C, K = w.shape
    out = []
    for dy in range(2):
        for dx in range(2):
            k = np.zeros((2, 2, 4 * C, K), w.dtype)
            for u in range(3):
                for v in range(3):
                    dby, sy = _tap_split(dy, u)
                    dbx, sx = _tap_split(dx, v)
                    ci = (sy * 2 + sx) * C
                    ty = dby + (1 if dy == 0 else 0)
                    tx = dbx + (1 if dx == 0 else 0)
                    k[ty, tx, ci : ci + C, :] += w[u, v]
            pad_y = (1, 0) if dy == 0 else (0, 1)
            pad_x = (1, 0) if dx == 0 else (0, 1)
            out.append((k, pad_y, pad_x))
    return out


def conv3x3_s2d_4way(x2: jnp.ndarray, kernels) -> jnp.ndarray:
    """Four 2x2 convs -> (B, H/2, W/2, 4K) in s2d channel order."""
    outs = []
    for k, pad_y, pad_x in kernels:
        outs.append(
            lax.conv_general_dilated(
                x2, k, (1, 1), [pad_y, pad_x],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return jnp.concatenate(outs, axis=-1)


def conv3x3_via_s2d_dense(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Drop-in stride-1 3x3 SAME conv (NHWC) through the dense s2d domain."""
    w2 = jnp.asarray(s2d_dense_kernel(w)) if isinstance(w, np.ndarray) else _dense_kernel_jnp(w)
    return depth_to_space(conv3x3_s2d_dense(space_to_depth(x), w2))


def _dense_kernel_jnp(w: jnp.ndarray) -> jnp.ndarray:
    """Traceable (jnp) version of :func:`s2d_dense_kernel`."""
    _, _, C, K = w.shape
    rows = []
    for dby in (-1, 0, 1):
        cols = []
        for dbx in (-1, 0, 1):
            block = jnp.zeros((4 * C, 4 * K), w.dtype)
            for dy in range(2):
                for dx in range(2):
                    for u in range(3):
                        for v in range(3):
                            by, sy = _tap_split(dy, u)
                            bx, sx = _tap_split(dx, v)
                            if by != dby or bx != dbx:
                                continue
                            ci = (sy * 2 + sx) * C
                            co = (dy * 2 + dx) * K
                            block = block.at[ci : ci + C, co : co + K].add(w[u, v])
            cols.append(block)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _subgrid_kernels_jnp(w: jnp.ndarray):
    """Traceable (jnp) version of :func:`s2d_subgrid_kernels`."""
    _, _, C, K = w.shape
    out = []
    for dy in range(2):
        for dx in range(2):
            k = jnp.zeros((2, 2, 4 * C, K), w.dtype)
            for u in range(3):
                for v in range(3):
                    dby, sy = _tap_split(dy, u)
                    dbx, sx = _tap_split(dx, v)
                    ci = (sy * 2 + sx) * C
                    ty = dby + (1 if dy == 0 else 0)
                    tx = dbx + (1 if dx == 0 else 0)
                    k = k.at[ty, tx, ci : ci + C, :].add(w[u, v])
            pad_y = (1, 0) if dy == 0 else (0, 1)
            pad_x = (1, 0) if dx == 0 else (0, 1)
            out.append((k, pad_y, pad_x))
    return out


def conv3x3_via_s2d_4way(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Drop-in stride-1 3x3 SAME conv (NHWC) through the 4-way s2d domain."""
    kernels = s2d_subgrid_kernels(w) if isinstance(w, np.ndarray) else _subgrid_kernels_jnp(w)
    return depth_to_space(conv3x3_s2d_4way(space_to_depth(x), kernels))
