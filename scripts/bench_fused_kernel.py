"""Benchmark the fused GN+SiLU+conv3x3 Pallas kernel vs the XLA composition
on the real TPU, at the score-network's shape classes.

K-chained timing in ONE dispatch (BENCH_NOTES.md round 2: per-dispatch
overhead on the tunneled backend is ~25-30 ms, so per-op timing must chain).

Usage: python scripts/bench_fused_kernel.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from conditional_score_diffusion_tpu.ops.fused_block_pallas import (  # noqa: E402
    gn_silu_conv3x3_hmajor,
    gn_silu_conv3x3_reference,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def bench(fn, *args, k=K):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    return (t1 - t0) / k, out


# (B, H, W, C) classes from the flagship celebA-160 CMDE network (nf=96)
SHAPES = [
    (8, 160, 160, 96),
    (8, 80, 80, 192),
    (8, 40, 40, 192),
    (8, 20, 20, 288),
    (8, 10, 10, 288),
    (16, 160, 160, 96),
    (16, 20, 20, 288),
]

for B, H, W, C in SHAPES:
    for dtype in (jnp.bfloat16,):
        rng = np.random.RandomState(0)
        xt = jnp.asarray(rng.randn(H, W, B, C).astype(np.float32), dtype)
        w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05, dtype)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        temb = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
        groups = min(C // 4, 32)

        @jax.jit
        def fused_chain(xt, w):
            def body(h, _):
                h = gn_silu_conv3x3_hmajor(h, w, gamma, beta, groups, bias=bias, temb=temb)
                return h, None
            h, _ = jax.lax.scan(body, xt, None, length=K)
            return h

        @jax.jit
        def xla_chain(x_nhwc, w):
            def body(h, _):
                h = gn_silu_conv3x3_reference(h, w, gamma, beta, groups, bias=bias, temb=temb)
                return h.astype(x_nhwc.dtype), None
            h, _ = jax.lax.scan(body, x_nhwc, None, length=K)
            return h

        flops = 2 * 9 * H * W * B * C * C
        try:
            t_fused, out_f = bench(fused_chain, xt, w)
        except Exception as e:  # noqa: BLE001
            print(f"B{B} {H}x{W}x{C} {dtype.__name__}: FUSED FAILED {type(e).__name__}: {e}")
            t_fused, out_f = float("nan"), None
        x_nhwc = jnp.transpose(xt, (2, 0, 1, 3))
        t_xla, out_x = bench(xla_chain, x_nhwc, w)
        if out_f is not None:
            err = float(
                jnp.max(
                    jnp.abs(
                        jnp.transpose(out_f, (2, 0, 1, 3)).astype(jnp.float32)
                        - out_x.astype(jnp.float32)
                    )
                )
            )
        else:
            err = float("nan")
        print(
            f"B{B} {H}x{W}x{C}: fused {t_fused*1e3:.3f} ms ({flops/t_fused/1e12:.1f} TF/s) | "
            f"xla {t_xla*1e3:.3f} ms ({flops/t_xla/1e12:.1f} TF/s) | "
            f"speedup {t_xla/t_fused:.2f}x | maxerr {err:.2e}",
            flush=True,
        )
