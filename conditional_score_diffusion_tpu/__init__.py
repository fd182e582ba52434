"""TPU-native conditional score-SDE diffusion framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
GBATZOLIS/conditional_score_diffusion (PyTorch + Lightning): conditional
score-based generative modeling with multi-speed SDE diffusion (CDE, CDiffE,
CMDE, VS-CMDE estimators), predictor-corrector sampling compiled to a single
`jax.lax.scan`, Haar multi-scale generation, and an evaluation stack —
all built for TPU: NHWC layouts, bfloat16 matmuls on the MXU, pjit/shard_map
data parallelism over a device mesh, and Pallas kernels for the
StyleGAN2-style FIR resampling hot path.

Layer map (mirrors reference SURVEY.md §1):
  run_lib / main        — CLI + orchestration  (reference: main.py, run_lib.py)
  configs               — ml_collections config system (reference: configs/**)
  training              — train state/steps/trainer  (reference: lightning_modules/ + callbacks)
  sampling              — PC/ODE samplers (reference: sampling/)
  sde, losses           — diffusion math core (reference: sde_lib.py, losses.py)
  models                — score networks + EMA (reference: models/)
  ops                   — TPU kernels: upfirdn2d, fused bias-act, Haar DWT, bicubic
                          (reference: op/*.cu CUDA kernels)
  data                  — input pipelines + on-device degradations
                          (reference: lightning_data_modules/)
  parallel              — mesh/sharding utilities (reference: Lightning DDP)
  eval                  — PSNR/SSIM/LPIPS/FID metrics (reference: evaluation.py)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the 160px U-Net sampler scan takes minutes to
# compile; caching makes every subsequent process start warm.  Opt out with
# CSDT_NO_COMPILE_CACHE=1.
if not _os.environ.get("CSDT_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "CSDT_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
