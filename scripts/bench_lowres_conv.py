"""Low-resolution-tail conv microbenchmark (VERDICT round-2 item 2).

Compares, at the flagship sampler's low-res shapes (C=288 at 20/10/5 px):

- direct:   XLA native conv (production today)
- im2col:   one (B*H*W, 9C) @ (9C, K) MXU matmul (`ops/im2col.py`)
- fused:    Pallas GN+SiLU+conv H-major kernel incl. NHWC boundary
            transposes (`ops/fused_block_pallas.py`)
- xla_gn:   XLA GN+SiLU+conv composite (production composite today)
- im2col_gn: XLA GN+SiLU + im2col conv

K-chained in one dispatch; every stage prints as it completes so partial
runs still carry evidence (the tunneled worker can stall mid-script).

Usage: python scripts/bench_lowres_conv.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from conditional_score_diffusion_tpu.ops.fused_block_pallas import (  # noqa: E402
    gn_silu_conv3x3_nhwc,
    gn_silu_conv3x3_reference,
)
from conditional_score_diffusion_tpu.ops.im2col import conv3x3_im2col  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 200
DTYPE = jnp.bfloat16


def chain(step):
    @jax.jit
    def run(x, *cs):
        def body(h, _):
            return step(h, *cs), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h
    return run


def bench(name, fn, *args, flops=None):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        per = (time.perf_counter() - t0) / K
        tf = f" ({flops/per/1e12:.1f} TF/s)" if flops else ""
        print(f"  {name}: {per*1e3:.3f} ms{tf} [warm {warm:.1f}s]", flush=True)
        return per
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return float("nan")


def _gn_silu_im2col(h, wk, gamma, beta, groups):
    B, H, W, C = h.shape
    xg = h.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    a = ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(B, H, W, C)
    a = a * gamma + beta
    a = (a * jax.nn.sigmoid(a)).astype(h.dtype)
    return conv3x3_im2col(a, wk)


SHAPES = [(16, 20, 20, 288), (16, 10, 10, 288), (16, 5, 5, 288), (8, 20, 20, 288)]

for B, H, W, C in SHAPES:
    print(f"B{B} {H}x{W}x{C}:", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.1, DTYPE)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05, DTYPE)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    groups = min(C // 4, 32)
    flops = 2 * 9 * H * W * B * C * C

    direct = chain(
        lambda h, wk: lax.conv_general_dilated(
            h, wk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    im2col = chain(conv3x3_im2col)
    t_direct = bench("direct ", direct, x, w, flops=flops)
    t_im2col = bench("im2col ", im2col, x, w, flops=flops)

    xla_gn = chain(
        lambda h, wk: gn_silu_conv3x3_reference(h, wk, gamma, beta, groups).astype(h.dtype)
    )
    im2col_gn = chain(
        lambda h, wk: _gn_silu_im2col(h, wk, gamma, beta, groups)
    )
    fused = chain(
        lambda h, wk: gn_silu_conv3x3_nhwc(h, wk, gamma, beta, groups)
    )
    t_xla_gn = bench("xla_gn ", xla_gn, x, w, flops=flops)
    t_i2c_gn = bench("i2c_gn ", im2col_gn, x, w, flops=flops)
    t_fused = bench("fused  ", fused, x, w, flops=flops)
    if np.isfinite(t_direct) and np.isfinite(t_im2col):
        print(f"  -> conv speedup im2col {t_direct/t_im2col:.2f}x", flush=True)
    if np.isfinite(t_xla_gn):
        for nm, t in (("i2c_gn", t_i2c_gn), ("fused", t_fused)):
            if np.isfinite(t):
                print(f"  -> composite speedup {nm} {t_xla_gn/t:.2f}x", flush=True)
