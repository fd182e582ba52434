"""Benchmark the fused GN+SiLU+conv3x3 Pallas kernel vs the XLA composition
on the real TPU, at the score-network's shape classes.

K-chained timing in ONE dispatch (BENCH_NOTES.md round 2: per-dispatch
overhead on the tunneled backend is ~25-30 ms, so per-op timing must chain).

Usage: python scripts/bench_fused_kernel.py [K]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

# the axon sitecustomize can override JAX_PLATFORMS at interpreter startup;
# re-assert it so JAX_PLATFORMS=cpu smoke runs don't touch the TPU tunnel
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from conditional_score_diffusion_tpu.ops.fused_block_pallas import (  # noqa: E402
    gn_silu_conv3x3_hmajor,
    gn_silu_conv3x3_reference,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
INTERP = jax.default_backend() == "cpu"  # Pallas interpret mode off-TPU


def bench(fn, *args, k=K):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    return (t1 - t0) / k, out


SMOKE = os.environ.get("BENCH_FUSED_SMOKE") == "1"

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
if SMOKE:
    SHAPES = [(2, 10, 10, 64)]

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
                h = gn_silu_conv3x3_hmajor(h, w, gamma, beta, groups, bias=bias, temb=temb, interpret=INTERP)
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


# ---------------------------------------------------------------------------
# WHOLE-resblock kernel per-shape grid (VERDICT round-3 item 7): confirm the
# analytic VMEM gate (layers.fused_block_candidate_policy, max(H,W)<=10)
# empirically, including that the 20x20 shapes fail gracefully rather than
# faulting the chip.  Identity shortcut, skip_rescale, eval semantics.
# ---------------------------------------------------------------------------
from conditional_score_diffusion_tpu.ops.fused_block_pallas import (  # noqa: E402
    gn_silu_conv3x3_reference,
    resblock_fused_lowres,
)

print("\n== whole-resblock kernel grid ==", flush=True)
# In-gate shapes first, ALL beyond-gate (20x20, expected VMEM overflow) last:
# if the overflow faults the chip fatally instead of raising, the in-gate
# measurements have already printed.
BLOCK_SHAPES = [
    (B, H, H, C)
    for H in (5, 10, 20)
    for B in (8, 16)
    for C in (192, 288, 384)
]
if SMOKE:
    BLOCK_SHAPES = [(2, 5, 5, 64), (2, 10, 10, 64)]

for B, H, W, C in BLOCK_SHAPES:
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5, dtype)
    w0 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05, dtype)
    w1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05, dtype)
    b0 = jnp.zeros((C,), jnp.float32)
    b1 = jnp.zeros((C,), jnp.float32)
    gamma0 = jnp.ones((C,), jnp.float32)
    beta0 = jnp.zeros((C,), jnp.float32)
    gamma1 = jnp.ones((C,), jnp.float32)
    beta1 = jnp.zeros((C,), jnp.float32)
    temb = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    groups = min(C // 4, 32)

    @jax.jit
    def fused_chain(x):
        def body(h, _):
            h = resblock_fused_lowres(
                h,
                gamma0=gamma0, beta0=beta0, num_groups0=groups,
                w0=w0, b0=b0, temb_proj=temb,
                gamma1=gamma1, beta1=beta1, num_groups1=groups,
                w1=w1, b1=b1,
                skip_rescale=True, interpret=INTERP,
            )
            return h, None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h

    @jax.jit
    def xla_chain(x):
        def body(h, _):
            t = gn_silu_conv3x3_reference(h, w0, gamma0, beta0, groups, bias=b0, temb=temb)
            t = gn_silu_conv3x3_reference(t.astype(h.dtype), w1, gamma1, beta1, groups, bias=b1)
            out = (h.astype(jnp.float32) + t) / np.sqrt(2.0)
            return out.astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h

    flops = 2 * 9 * H * W * B * (2 * C) * C
    try:
        t_fused, out_f = bench(fused_chain, x)
    except Exception as e:  # noqa: BLE001
        print(f"B{B} {H}x{W}x{C}: FUSED FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        t_fused, out_f = float("nan"), None
    t_xla, out_x = bench(xla_chain, x)
    err = (
        float(jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_x.astype(jnp.float32))))
        if out_f is not None
        else float("nan")
    )
    gate = "IN-GATE" if max(H, W) <= 10 else "beyond-gate"
    print(
        f"B{B} {H}x{W}x{C} [{gate}]: fused {t_fused*1e3:.3f} ms ({flops/t_fused/1e12:.1f} TF/s) | "
        f"xla {t_xla*1e3:.3f} ms ({flops/t_xla/1e12:.1f} TF/s) | "
        f"speedup {t_xla/t_fused:.2f}x | maxerr {err:.2e}",
        flush=True,
    )
