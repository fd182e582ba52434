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


def _group_matrices(C_pad: int, C_real: int, num_groups: int, n_spatial: int):
    """Trace-time constants for in-kernel GroupNorm statistics.

    ``mg`` (C_pad, G): x_sum @ mg gives per-(B, group) means (entries
    1/(n_spatial*gs) for real channels, 0 for lane-padding).  ``mb``
    (G, C_pad): broadcast per-group values back to per-channel (0 columns
    for padding, so padded channels see mean=var=0 and stay exactly 0
    through the activation).
    """
    G = num_groups
    gs = C_real // G
    mg = np.zeros((C_pad, G), np.float32)
    mb = np.zeros((G, C_pad), np.float32)
    for c in range(C_real):
        g = c // gs
        mg[c, g] = 1.0 / (n_spatial * gs)
        mb[g, c] = 1.0
    return jnp.asarray(mg), jnp.asarray(mb)


def _resblock_kernel(
    x_ref, g0_ref, b0_ref, mg0_ref, mb0_ref, w0_ref, bt_ref,
    g1_ref, b1_ref, mg1_ref, mb1_ref, w1_ref, bias1_ref, ws_ref,
    out_ref, *, H, W, Bc, Cin, Cout, shortcut, res_scale,
):
    """One whole resblock (eval) in a single VMEM pass; grid over B chunks.

    GN statistics are computed in-kernel: spatial sums on the VPU, then the
    group reduce/broadcast as two tiny MXU matmuls with the constant
    matrices from `_group_matrices` — no lane-axis reshapes (the Mosaic
    relayout hazard documented in `conv_pallas.py`).
    """
    f32 = jnp.float32
    x = x_ref[...]  # (H+2, W+2, Bc, Cin), input dtype
    xi = x[1 : H + 1, 1 : W + 1].astype(f32)  # interior

    def gn_scale_shift(xin, mg, mb, gamma, beta):
        s = jnp.sum(xin, axis=(0, 1))  # (Bc, C)
        q = jnp.sum(xin * xin, axis=(0, 1))
        mean_g = jnp.dot(s, mg, preferred_element_type=f32)  # (Bc, G)
        msq_g = jnp.dot(q, mg, preferred_element_type=f32)
        var_g = msq_g - mean_g * mean_g
        mean_c = jnp.dot(mean_g, mb, preferred_element_type=f32)  # (Bc, C)
        var_c = jnp.dot(var_g, mb, preferred_element_type=f32)
        inv = jax.lax.rsqrt(var_c + 1e-6)
        scale = inv * gamma
        return scale, beta - mean_c * scale

    def conv9(act_pad, w_ref_):
        acc = None
        for dy in range(3):
            for dx in range(3):
                lhs = act_pad[dy : dy + H, dx : dx + W].reshape(H * W * Bc, -1)
                term = jnp.dot(lhs, w_ref_[dy, dx], preferred_element_type=f32)
                acc = term if acc is None else acc + term
        return acc.reshape(H, W, Bc, -1)

    # --- GN0 -> SiLU -> conv0 (+bias +temb) ---
    scale0, shift0 = gn_scale_shift(xi, mg0_ref[...], mb0_ref[...], g0_ref[...], b0_ref[...])
    a = xi * scale0 + shift0
    a = a * jax.nn.sigmoid(a)
    a_pad = jnp.zeros((H + 2, W + 2, Bc, Cin), w0_ref.dtype)
    a_pad = a_pad.at[1 : H + 1, 1 : W + 1].set(a.astype(w0_ref.dtype))
    h = conv9(a_pad, w0_ref) + bt_ref[...]  # (H, W, Bc, Cout) f32

    # --- GN1 -> SiLU -> conv1 (+bias) ---
    scale1, shift1 = gn_scale_shift(h, mg1_ref[...], mb1_ref[...], g1_ref[...], b1_ref[...])
    a1 = h * scale1 + shift1
    a1 = a1 * jax.nn.sigmoid(a1)
    a1_pad = jnp.zeros((H + 2, W + 2, Bc, Cout), w1_ref.dtype)
    a1_pad = a1_pad.at[1 : H + 1, 1 : W + 1].set(a1.astype(w1_ref.dtype))
    h1 = conv9(a1_pad, w1_ref) + bias1_ref[...]

    # --- shortcut + residual ---
    if shortcut == "identity":
        res = xi
    else:  # channel-mix shortcut (NIN / 1x1 conv); bias folded into bias1
        res = jnp.dot(
            xi.reshape(H * W * Bc, Cin).astype(ws_ref.dtype),
            ws_ref[...],
            preferred_element_type=f32,
        ).reshape(H, W, Bc, Cout)
    out_ref[...] = ((res + h1) * res_scale).astype(out_ref.dtype)


def resblock_fused_lowres(
    x: jnp.ndarray,
    *,
    gamma0, beta0, num_groups0: int,
    w0, b0, temb_proj,
    gamma1, beta1, num_groups1: int,
    w1, b1,
    shortcut_w=None, shortcut_b=None,
    skip_rescale: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """An ENTIRE eval resblock in one Pallas call (NHWC in/out).

    Computes (reference `models/layers.py:631-674` / `layerspp.py:166-209`,
    eval mode so dropout is identity):

        h   = conv3x3(silu(GN0(x)), w0) + b0 + temb_proj[:, None, None]
        h   = conv3x3(silu(GN1(h)), w1) + b1
        out = shortcut(x) + h            # identity or channel-mix (+bias)
        out *= 1/sqrt(2)                 # if skip_rescale

    with both GroupNorm statistics computed inside the kernel, so HBM sees
    one read of x and one write of out.  Intended for the latency-bound
    5x5-20x20 tail where the whole block fits in VMEM; batch is chunked on
    the grid (GN statistics are per-sample, so chunking is exact).

    ``temb_proj``: (B, Cout) — the Dense(act(temb)) projection, computed in
    XLA by the caller (it is a per-batch vector, negligible FLOPs).
    ``shortcut_w``: (Cin, Cout) channel-mix matrix (NIN kernel or a
    squeezed 1x1-conv kernel) or None for the identity shortcut.
    """
    B, H, W, Cin0 = x.shape
    Cout0 = w0.shape[-1]
    f32 = jnp.float32

    Cin = _round_up(Cin0, 128) if not interpret else Cin0
    Cout = _round_up(Cout0, 128) if not interpret else Cout0

    def padc(v, c):  # pad a per-channel vector
        return jnp.pad(v.astype(f32), (0, c - v.shape[0]))

    xt = jnp.transpose(x, (1, 2, 0, 3))  # (H, W, B, Cin0)
    xt = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, Cin - Cin0)))
    w0p = jnp.pad(w0, ((0, 0), (0, 0), (0, Cin - Cin0), (0, Cout - Cout0)))
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, Cout - Cout0), (0, Cout - Cout0)))

    mg0, mb0 = _group_matrices(Cin, Cin0, num_groups0, H * W)
    mg1, mb1 = _group_matrices(Cout, Cout0, num_groups1, H * W)

    if temb_proj is None:
        temb_proj = jnp.zeros((B, Cout0), f32)
    bt = b0.astype(f32)[None, :] + temb_proj.astype(f32)  # (B, Cout0)
    bt = jnp.pad(bt, ((0, 0), (0, Cout - Cout0)))
    bias1 = b1.astype(f32)
    if shortcut_w is None:
        assert Cin0 == Cout0, "identity shortcut needs Cin == Cout"
        shortcut = "identity"
        wsp = jnp.zeros((Cin, Cout), w0p.dtype)  # unused placeholder
    else:
        shortcut = "mix"
        wsp = jnp.pad(
            shortcut_w, ((0, Cin - Cin0), (0, Cout - Cout0))
        ).astype(w0p.dtype)
        if shortcut_b is not None:
            bias1 = bias1 + shortcut_b.astype(f32)
    bias1 = jnp.pad(bias1, (0, Cout - Cout0))[None, :]  # (1, Cout)

    # batch chunk: largest divisor of B fitting a ~10MB working set
    per_b = (H + 2) * (W + 2) * (Cin + Cout) * (2 * x.dtype.itemsize + 4 + 4)
    cap = max(1, (10 * 2**20) // max(1, per_b))
    Bc = 1
    for t in range(min(B, cap), 0, -1):
        if B % t == 0:
            Bc = t
            break

    kernel = functools.partial(
        _resblock_kernel,
        H=H, W=W, Bc=Bc, Cin=Cin, Cout=Cout,
        shortcut=shortcut,
        res_scale=float(1.0 / np.sqrt(2.0)) if skip_rescale else 1.0,
    )
    vec = lambda c: pl.BlockSpec((1, c), lambda b: (0, 0))  # noqa: E731
    full = lambda *s: pl.BlockSpec(s, lambda b: tuple(0 for _ in s))  # noqa: E731
    flops = 2 * 9 * H * W * B * (Cin + Cout) * Cout
    out = pl.pallas_call(
        kernel,
        grid=(B // Bc,),
        in_specs=[
            pl.BlockSpec((H + 2, W + 2, Bc, Cin), lambda b: (0, 0, b, 0)),
            vec(Cin), vec(Cin), full(Cin, num_groups0), full(num_groups0, Cin),
            full(3, 3, Cin, Cout),
            pl.BlockSpec((Bc, Cout), lambda b: (b, 0)),
            vec(Cout), vec(Cout), full(Cout, num_groups1), full(num_groups1, Cout),
            full(3, 3, Cout, Cout), vec(Cout), full(Cin, Cout),
        ],
        out_specs=pl.BlockSpec((H, W, Bc, Cout), lambda b: (0, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W, B, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xt.size * xt.dtype.itemsize
            + H * W * B * Cout * x.dtype.itemsize,
            transcendentals=2 * H * W * B * (Cin + Cout),
        ),
        interpret=interpret,
    )(
        xt,
        padc(gamma0, Cin)[None, :], padc(beta0, Cin)[None, :], mg0, mb0,
        w0p, bt,
        padc(gamma1, Cout)[None, :], padc(beta1, Cout)[None, :], mg1, mb1,
        w1p, bias1, wsp,
    )
    return jnp.transpose(out[..., :Cout0], (2, 0, 1, 3))


def _resblock_split_kernel(
    xa_ref, xb_ref,
    gA_ref, bA_ref, gB_ref, bB_ref, mgA_ref, mgB_ref, mbA_ref, mbB_ref,
    w0A_ref, w0B_ref, bt_ref,
    g1_ref, b1_ref, mg1_ref, mb1_ref, w1_ref, bias1_ref,
    wsA_ref, wsB_ref,
    out_ref, *, H, W, Bc, Ca, Cb, Cout, res_scale,
):
    """Split-skip variant: the block runs on the VIRTUAL concat cat(x, skip)
    without ever materializing it — GN0 statistics are assembled across the
    concat boundary from per-half moments (exact even when a group straddles
    it), conv0 and the shortcut distribute over the channel split as two
    MXU accumulations.  The residual (identity or channel-mix) is always a
    channel-mix matmul (identity passes constant identity blocks)."""
    f32 = jnp.float32
    xa = xa_ref[...]
    xb = xb_ref[...]
    ia = xa[1 : H + 1, 1 : W + 1].astype(f32)
    ib = xb[1 : H + 1, 1 : W + 1].astype(f32)

    # joint GN0 statistics over the virtual concat
    sa = jnp.sum(ia, axis=(0, 1))
    qa = jnp.sum(ia * ia, axis=(0, 1))
    sb = jnp.sum(ib, axis=(0, 1))
    qb = jnp.sum(ib * ib, axis=(0, 1))
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)  # noqa: E731
    mean_g = dot(sa, mgA_ref[...]) + dot(sb, mgB_ref[...])  # (Bc, G)
    msq_g = dot(qa, mgA_ref[...]) + dot(qb, mgB_ref[...])
    var_g = msq_g - mean_g * mean_g

    def half_act(xi, x_pad_shape, mb, gamma, beta, wdtype):
        mean_c = dot(mean_g, mb)
        var_c = dot(var_g, mb)
        inv = jax.lax.rsqrt(var_c + 1e-6)
        scale = inv * gamma
        shift = beta - mean_c * scale
        a = xi * scale + shift
        a = a * jax.nn.sigmoid(a)
        pad = jnp.zeros(x_pad_shape, wdtype)
        return pad.at[1 : H + 1, 1 : W + 1].set(a.astype(wdtype))

    def conv9(act_pad, w_ref_):
        acc = None
        for dy in range(3):
            for dx in range(3):
                lhs = act_pad[dy : dy + H, dx : dx + W].reshape(H * W * Bc, -1)
                term = dot(lhs, w_ref_[dy, dx])
                acc = term if acc is None else acc + term
        return acc.reshape(H, W, Bc, -1)

    aA = half_act(ia, (H + 2, W + 2, Bc, Ca), mbA_ref[...], gA_ref[...], bA_ref[...], w0A_ref.dtype)
    aB = half_act(ib, (H + 2, W + 2, Bc, Cb), mbB_ref[...], gB_ref[...], bB_ref[...], w0B_ref.dtype)
    h = conv9(aA, w0A_ref) + conv9(aB, w0B_ref) + bt_ref[...]

    # GN1 -> SiLU -> conv1 (joint tensor now)
    s1 = jnp.sum(h, axis=(0, 1))
    q1 = jnp.sum(h * h, axis=(0, 1))
    mean1_g = dot(s1, mg1_ref[...])
    msq1_g = dot(q1, mg1_ref[...])
    var1_g = msq1_g - mean1_g * mean1_g
    mean1_c = dot(mean1_g, mb1_ref[...])
    var1_c = dot(var1_g, mb1_ref[...])
    inv1 = jax.lax.rsqrt(var1_c + 1e-6)
    scale1 = inv1 * g1_ref[...]
    shift1 = b1_ref[...] - mean1_c * scale1
    a1 = h * scale1 + shift1
    a1 = a1 * jax.nn.sigmoid(a1)
    a1_pad = jnp.zeros((H + 2, W + 2, Bc, Cout), w1_ref.dtype)
    a1_pad = a1_pad.at[1 : H + 1, 1 : W + 1].set(a1.astype(w1_ref.dtype))
    h1 = conv9(a1_pad, w1_ref) + bias1_ref[...]

    res = (
        dot(ia.reshape(H * W * Bc, Ca).astype(wsA_ref.dtype), wsA_ref[...])
        + dot(ib.reshape(H * W * Bc, Cb).astype(wsB_ref.dtype), wsB_ref[...])
    ).reshape(H, W, Bc, Cout)
    out_ref[...] = ((res + h1) * res_scale).astype(out_ref.dtype)


def resblock_fused_lowres_split(
    x: jnp.ndarray,
    skip: jnp.ndarray,
    *,
    gamma0, beta0, num_groups0: int,
    w0, b0, temb_proj,
    gamma1, beta1, num_groups1: int,
    w1, b1,
    shortcut_w=None, shortcut_b=None,
    skip_rescale: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Split-skip whole-resblock fusion (NHWC in/out): the decoder block on
    cat(x, skip) with the concat virtual even inside VMEM.

    ``gamma0``/``beta0``/``w0``/``shortcut_w`` are over the CONCAT width
    (identical layout to the unfused SplitGroupNorm/SplitConv3x3/SplitNIN
    parameters, reference `models/layers.py:631-674` decoder usage).
    ``shortcut_w=None`` means the identity residual over the concat
    (requires Ca+Cb == Cout), lowered as constant identity-block matmuls.
    """
    B, H, W, Ca0 = x.shape
    Cb0 = skip.shape[-1]
    Cin0 = Ca0 + Cb0
    Cout0 = w0.shape[-1]
    f32 = jnp.float32

    Ca = _round_up(Ca0, 128) if not interpret else Ca0
    Cb = _round_up(Cb0, 128) if not interpret else Cb0
    Cout = _round_up(Cout0, 128) if not interpret else Cout0

    def prep(v):  # NHWC -> padded (H+2, W+2, B, Cpad)
        t = jnp.transpose(v, (1, 2, 0, 3))
        cpad = (Ca if v is x else Cb) - v.shape[-1]
        return jnp.pad(t, ((1, 1), (1, 1), (0, 0), (0, cpad)))

    xat, xbt = prep(x), prep(skip)

    # group matrices over the CONCAT channel layout, split at the boundary
    G0 = num_groups0
    gs0 = Cin0 // G0
    mgA = np.zeros((Ca, G0), np.float32)
    mgB = np.zeros((Cb, G0), np.float32)
    mbA = np.zeros((G0, Ca), np.float32)
    mbB = np.zeros((G0, Cb), np.float32)
    for c in range(Cin0):
        g = c // gs0
        if c < Ca0:
            mgA[c, g] = 1.0 / (H * W * gs0)
            mbA[g, c] = 1.0
        else:
            mgB[c - Ca0, g] = 1.0 / (H * W * gs0)
            mbB[g, c - Ca0] = 1.0
    mg1, mb1 = _group_matrices(Cout, Cout0, num_groups1, H * W)

    def padc(v, c):
        return jnp.pad(v.astype(f32), (0, c - v.shape[0]))

    gA = padc(gamma0[:Ca0], Ca)[None, :]
    bA = padc(beta0[:Ca0], Ca)[None, :]
    gB = padc(gamma0[Ca0:], Cb)[None, :]
    bB = padc(beta0[Ca0:], Cb)[None, :]
    w0A = jnp.pad(w0[:, :, :Ca0], ((0, 0), (0, 0), (0, Ca - Ca0), (0, Cout - Cout0)))
    w0B = jnp.pad(w0[:, :, Ca0:], ((0, 0), (0, 0), (0, Cb - Cb0), (0, Cout - Cout0)))
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, Cout - Cout0), (0, Cout - Cout0)))

    if temb_proj is None:
        temb_proj = jnp.zeros((B, Cout0), f32)
    bt = b0.astype(f32)[None, :] + temb_proj.astype(f32)
    bt = jnp.pad(bt, ((0, 0), (0, Cout - Cout0)))
    bias1 = b1.astype(f32)
    if shortcut_w is None:
        assert Cin0 == Cout0, "identity residual needs Ca+Cb == Cout"
        ws = np.zeros((Cin0, Cout0), np.float32)
        ws[np.arange(Cin0), np.arange(Cin0)] = 1.0
        shortcut_w = jnp.asarray(ws)
    elif shortcut_b is not None:
        bias1 = bias1 + shortcut_b.astype(f32)
    wsA = jnp.pad(shortcut_w[:Ca0], ((0, Ca - Ca0), (0, Cout - Cout0))).astype(w0A.dtype)
    wsB = jnp.pad(shortcut_w[Ca0:], ((0, Cb - Cb0), (0, Cout - Cout0))).astype(w0B.dtype)
    bias1 = jnp.pad(bias1, (0, Cout - Cout0))[None, :]

    per_b = (H + 2) * (W + 2) * (Ca + Cb + Cout) * (2 * x.dtype.itemsize + 4 + 4)
    cap = max(1, (10 * 2**20) // max(1, per_b))
    Bc = 1
    for t in range(min(B, cap), 0, -1):
        if B % t == 0:
            Bc = t
            break

    kernel = functools.partial(
        _resblock_split_kernel,
        H=H, W=W, Bc=Bc, Ca=Ca, Cb=Cb, Cout=Cout,
        res_scale=float(1.0 / np.sqrt(2.0)) if skip_rescale else 1.0,
    )
    vec = lambda c: pl.BlockSpec((1, c), lambda b: (0, 0))  # noqa: E731
    full = lambda *s: pl.BlockSpec(s, lambda b: tuple(0 for _ in s))  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B // Bc,),
        in_specs=[
            pl.BlockSpec((H + 2, W + 2, Bc, Ca), lambda b: (0, 0, b, 0)),
            pl.BlockSpec((H + 2, W + 2, Bc, Cb), lambda b: (0, 0, b, 0)),
            vec(Ca), vec(Ca), vec(Cb), vec(Cb),
            full(Ca, G0), full(Cb, G0), full(G0, Ca), full(G0, Cb),
            full(3, 3, Ca, Cout), full(3, 3, Cb, Cout),
            pl.BlockSpec((Bc, Cout), lambda b: (b, 0)),
            vec(Cout), vec(Cout), full(Cout, num_groups1), full(num_groups1, Cout),
            full(3, 3, Cout, Cout), vec(Cout),
            full(Ca, Cout), full(Cb, Cout),
        ],
        out_specs=pl.BlockSpec((H, W, Bc, Cout), lambda b: (0, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W, B, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * H * W * B * (Ca + Cb + Cout) * Cout,
            bytes_accessed=(xat.size + xbt.size) * x.dtype.itemsize
            + H * W * B * Cout * x.dtype.itemsize,
            transcendentals=2 * H * W * B * (Ca + Cb + Cout),
        ),
        interpret=interpret,
    )(
        xat, xbt,
        gA, bA, gB, bB,
        jnp.asarray(mgA), jnp.asarray(mgB), jnp.asarray(mbA), jnp.asarray(mbB),
        w0A, w0B, bt,
        padc(gamma1, Cout)[None, :], padc(beta1, Cout)[None, :], mg1, mb1,
        w1p, bias1, wsA, wsB,
    )
    return jnp.transpose(out[..., :Cout0], (2, 0, 1, 3))


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
