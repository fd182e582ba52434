"""End-to-end flagship score-network eval time under conv dispatch policies.

Measures one `ddpm_paired` nf=96 160px eval (the headline sampler's inner
op) at B16 bf16, K-chained in one dispatch, for each named policy:

  xla      : production today (policy None)
  im2col20 : im2col for the 5x5-20x20 tail
  s2d160   : s2d_4way at H>=80 stride-1 convs
  both     : im2col tail + s2d high-res

Usage: python scripts/bench_eval_policy.py [K] [policy ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from conditional_score_diffusion_tpu.models import init_model_shapes_only  # noqa: E402
from conditional_score_diffusion_tpu.models import layers  # noqa: E402

import os  # noqa: E402

# the axon sitecustomize can override JAX_PLATFORMS at interpreter startup;
# re-assert it so `JAX_PLATFORMS=cpu` smoke runs don't touch the TPU tunnel
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# argv only belongs to this script when run directly (the winner-writer is
# also imported by its test, where argv is pytest's)
_IS_MAIN = __name__ == "__main__"
K = int(sys.argv[1]) if _IS_MAIN and len(sys.argv) > 1 else 20
ONLY = set(sys.argv[2:]) if _IS_MAIN else set()
# smoke mode for pre-flighting the script itself without a TPU:
#   BENCH_POLICY_SIZE=40 BENCH_POLICY_B=2 python scripts/bench_eval_policy.py 2
SIZE = int(os.environ.get("BENCH_POLICY_SIZE", "160"))
BATCH = int(os.environ.get("BENCH_POLICY_B", "16"))

_LOWRES = lambda s, o: s[1] * s[2] <= 400  # noqa: E731
_S2D = lambda s, o: "s2d4" if s[1] >= 80 and s[1] == s[2] and s[1] % 2 == 0 else "xla"  # noqa: E731
_FBLOCK = None  # filled in main (the canonical VMEM-safe gate from layers)

# name -> (conv lowering policy, fused tail policy, fused whole-block policy)
POLICIES = {
    "xla": (None, None, None),
    "im2col20": (lambda s, o: "im2col" if _LOWRES(s, o) else "xla", None, None),
    "s2d160": (_S2D, None, None),
    "both": (
        lambda s, o: ("im2col" if _LOWRES(s, o) else _S2D(s, o)),
        None,
        None,
    ),
    # fused Pallas tail on the 5x5-20x20 blocks (BENCH_NOTES round-2 lever 4)
    "fused20": (None, _LOWRES, None),
    "fused20+s2d": (_S2D, _LOWRES, None),
    # fused tail at EVERY resolution (the kernel tiles H, so 160px is legal;
    # measures whether one-VMEM-pass GN+SiLU+conv beats XLA's fusions there)
    "fusedall": (None, lambda s, o: True, None),
    # WHOLE-resblock Pallas kernel (encoder/mid joint blocks AND decoder
    # split-skip blocks via the split variant).  fblock10 = the canonical
    # VMEM-safe gate (layers.fused_block_candidate_policy: max(H,W)<=10;
    # 20x20 keeps the fused tail); fblock20 stresses the 20x20 level too
    # (expected to OOM VMEM — measure to confirm graceful failure).
    "fblock10": (None, _LOWRES, "canonical"),
    "fblock10+s2d": (_S2D, _LOWRES, "canonical"),
    "fblock20": (None, _LOWRES, _LOWRES),
}

# Rows expressible as production config knobs (layers.apply_dispatch_config):
# the fastest of these is written to artifacts/measured_policy.json, which
# layers.measured_policy_default() serves as the production default for every
# recipe without explicit knobs.  The gates match exactly: _LOWRES ==
# fused_tail_candidate_policy (H*W<=400), "canonical" ==
# fused_block_candidate_policy.  fusedall/fblock20 are stress rows with no
# production equivalent and never become the default.
PRODUCTION_KNOBS = {
    "xla": {"conv_dispatch": "none", "fused_tail": False, "fused_block": False},
    "im2col20": {"conv_dispatch": "lowres_im2col", "fused_tail": False, "fused_block": False},
    "s2d160": {"conv_dispatch": "s2d_highres", "fused_tail": False, "fused_block": False},
    "both": {"conv_dispatch": "tuned", "fused_tail": False, "fused_block": False},
    "fused20": {"conv_dispatch": "none", "fused_tail": True, "fused_block": False},
    "fused20+s2d": {"conv_dispatch": "s2d_highres", "fused_tail": True, "fused_block": False},
    "fblock10": {"conv_dispatch": "none", "fused_tail": True, "fused_block": True},
    "fblock10+s2d": {"conv_dispatch": "s2d_highres", "fused_tail": True, "fused_block": True},
}


def main():
    from __graft_entry__ import _flagship_config

    config = _flagship_config(image_size=SIZE)
    B = BATCH
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, SIZE, SIZE, 3).astype(np.float32), jnp.bfloat16)
    y = jnp.asarray(rng.rand(B, SIZE, SIZE, 3).astype(np.float32), jnp.bfloat16)
    t = jnp.full((B,), 100.0, jnp.bfloat16)

    results = {}
    for name, (policy, fused_policy, block_policy) in POLICIES.items():
        if ONLY and name not in ONLY:
            continue
        # create the model FIRST: create_model applies the config's dispatch
        # knobs (default none), which would clobber an earlier explicit set.
        # The policy is read at trace time, so setting it before the jitted
        # apply below is what matters.
        module, params = init_model_shapes_only(config, jax.random.key(0))
        if block_policy == "canonical":
            block_policy = layers.fused_block_candidate_policy
        layers.set_conv_dispatch(policy)
        layers.set_fused_gn_conv_dispatch(fused_policy)
        layers.set_fused_block_dispatch(block_policy)
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

        @jax.jit
        def evals(p, x, y, t):
            def body(h, _):
                out = module.apply({"params": p}, {"x": h, "y": y}, t)
                return out["x"].astype(h.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=K)
            return h

        try:
            t0 = time.perf_counter()
            out = evals(params, x, y, t)
            float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = evals(params, x, y, t)
            float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
            per = (time.perf_counter() - t0) / K
            results[name] = per
            print(f"{name}: {per*1e3:.2f} ms/eval [warm {warm:.0f}s]", flush=True)
            # update the winner file after EVERY row: a timeout that cuts
            # the ladder short must not discard the rows that did finish
            _write_measured_policy(results)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            layers.set_conv_dispatch(None)
            layers.set_fused_gn_conv_dispatch(None)
            layers.set_fused_block_dispatch(None)

    if "xla" in results:
        base = results["xla"]
        for name, per in results.items():
            if name != "xla":
                print(f"  {name} vs xla: {base/per:.3f}x", flush=True)

    _write_measured_policy(results)


def _write_measured_policy(results):
    """Record the fastest production-expressible row as the framework's
    measured lowering default (consumed by layers.measured_policy_default).

    Only written from a real-accelerator run at the flagship shape — a CPU
    smoke or reduced-shape ladder must not set production policy.  Force
    with BENCH_POLICY_WRITE=1 (used by the fallback's own test).
    """
    import json

    forced = os.environ.get("BENCH_POLICY_WRITE") == "1"
    on_accel = jax.devices()[0].platform != "cpu"
    flagship_shape = SIZE == 160 and BATCH == 16
    if not forced and not (on_accel and flagship_shape):
        print("# measured_policy.json not written (CPU smoke or non-flagship shape)",
              flush=True)
        return
    prod = {n: per for n, per in results.items() if n in PRODUCTION_KNOBS}
    if "xla" not in prod or len(prod) < 2:
        print("# measured_policy.json not written (need xla + >=1 candidate row)",
              flush=True)
        return
    winner = min(prod, key=prod.get)
    payload = dict(
        PRODUCTION_KNOBS[winner],
        winner=winner,
        ms_per_eval=round(prod[winner] * 1e3, 4),
        speedup_vs_xla=round(prod["xla"] / prod[winner], 4),
        platform=jax.devices()[0].platform,
        shape=f"{SIZE}px B{BATCH} bf16 K{K}",
        results_ms={n: round(p * 1e3, 4) for n, p in prod.items()},
    )
    path = os.environ.get("CSDT_POLICY_FILE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "measured_policy.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# measured_policy.json written: winner={winner} "
          f"({payload['speedup_vs_xla']}x vs xla) -> {path}", flush=True)


if __name__ == "__main__":
    main()
