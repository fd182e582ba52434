"""Microbenchmark: space-to-depth recasts of the flagship 3x3 conv vs XLA direct.

Protocol: K-chained timing in ONE dispatch (see scripts/bench_fused_kernel.py).

Populations per shape:
- direct:      lax conv at (H, W, C)->(H, W, C)          [1.00x MACs, 75% lanes @ C=96]
- s2d_dense:   3x3 conv at (H/2, W/2, 4C)->(H/2, W/2, 4C) [4.00x MACs, 100% lanes]
- s2d_4way:    four 2x2 convs at (H/2, W/2, 4C)->(.., C)  [1.78x MACs, aligned input]
Both s2d variants are timed *resident* (activations stay in the s2d domain
across the chain; weights pre-transformed outside the loop) — the intended
wiring keeps a whole resolution stage in s2d space.
Calibration rows: raw aligned conv throughput at (H/2, W/2, 384)->384 (3x3)
and ->96 (2x2), to separate XLA-scheduling effects from the recast itself.

Usage: python scripts/bench_space_to_depth.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from conditional_score_diffusion_tpu.ops.space_to_depth import (  # noqa: E402
    conv3x3_s2d_4way,
    conv3x3_s2d_dense,
    s2d_dense_kernel,
    s2d_subgrid_kernels,
    space_to_depth,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def bench(fn, *args, k=K):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    float(jnp.asarray(out).ravel()[0])  # force sync on the tunneled backend
    t1 = time.perf_counter()
    return (t1 - t0) / k


def chain(step, x0, *consts):
    @jax.jit
    def run(x, *cs):
        def body(h, _):
            return step(h, *cs), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h
    return run


# B16 single-conv scan chains are pathological on this toolchain
# (~1.27 s/conv vs ~0.3 ms inside the model — BENCH_NOTES round 3);
# microbench at B8 and take B16 evidence from end-to-end eval deltas.
SHAPES = [(8, 160, 160, 96), (8, 80, 80, 192)]
DTYPE = jnp.bfloat16

for B, H, W, C in SHAPES:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.1, DTYPE)
    w = rng.randn(3, 3, C, C).astype(np.float32) * 0.05
    wj = jnp.asarray(w, DTYPE)
    w2 = jnp.asarray(s2d_dense_kernel(w), DTYPE)
    kernels = [(jnp.asarray(k, DTYPE), py, px) for k, py, px in s2d_subgrid_kernels(w)]
    x2 = space_to_depth(x)

    direct = chain(
        lambda h, wk: lax.conv_general_dilated(
            h, wk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        x, wj,
    )
    dense = chain(lambda h, wk: conv3x3_s2d_dense(h, wk), x2, w2)
    fourway = chain(lambda h: conv3x3_s2d_4way(h, kernels), x2)

    flops = 2 * 9 * H * W * B * C * C  # useful MACs (direct formulation)
    t_direct = bench(direct, x, wj)
    t_dense = bench(dense, x2, w2)
    t_4way = bench(fourway, x2)
    print(
        f"B{B} {H}x{W}x{C}: direct {t_direct*1e3:.3f} ms ({flops/t_direct/1e12:.1f} TF/s) | "
        f"s2d_dense {t_dense*1e3:.3f} ms ({t_direct/t_dense:.2f}x) | "
        f"s2d_4way {t_4way*1e3:.3f} ms ({t_direct/t_4way:.2f}x)",
        flush=True,
    )

# calibration: raw aligned-shape conv throughput
print("--- calibration (raw aligned convs) ---", flush=True)
for B, H2, W2, Cin, Cout, ksz in [
    (16, 80, 80, 384, 384, 3),
    (16, 80, 80, 384, 96, 2),
    (16, 80, 80, 384, 384, 1),
    (16, 160, 160, 128, 128, 3),
]:
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H2, W2, Cin).astype(np.float32) * 0.1, DTYPE)
    w = jnp.asarray(rng.randn(ksz, ksz, Cin, Cout).astype(np.float32) * 0.02, DTYPE)
    pad = (ksz - 1) // 2
    run = chain(
        lambda h, wk: lax.conv_general_dilated(
            h, wk, (1, 1), [(pad, ksz - 1 - pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) if Cin == Cout else lax.conv_general_dilated(
            h[..., :Cin], wk, (1, 1), [(pad, ksz - 1 - pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x, w,
    )
    if Cin != Cout:
        # can't chain shape-changing convs; time K independent convs instead
        @jax.jit
        def run(x, wk):
            def body(acc, _):
                y = lax.conv_general_dilated(
                    x, wk, (1, 1), [(pad, ksz - 1 - pad)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                # full-tensor reduction so XLA cannot slice-through the conv
                return acc + jnp.sum(y.astype(jnp.float32)) * 1e-12, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return acc
    t = bench(run, x, w)
    fl = 2 * ksz * ksz * H2 * W2 * B * Cin * Cout
    print(f"B{B} {H2}x{W2}x{Cin}->{Cout} k{ksz}: {t*1e3:.3f} ms ({fl/t/1e12:.1f} TF/s)", flush=True)
