"""Trace capture + attribution tooling (aux subsystem: profiling/tracing).

The reference relies on PyTorch-Lightning's profiler flag
(`/root/reference/lightning_modules/BaseSdeGenerativeModel.py` via trainer
args) for coarse timing.  The TPU-native equivalent is richer: JAX traces
(captured around training steps via ``CSDT_PROFILE_DIR``, see
``training/trainer.py``) serialize to TensorFlow XSpace protos
(``*.xplane.pb``).  This package parses those protos WITHOUT a tensorflow
dependency and attributes device time to HLO op families — the tool that
produced the per-eval attribution tables in BENCH_NOTES.md.

CLI: ``python -m conditional_score_diffusion_tpu.profiling.xplane <trace>``.
"""

from conditional_score_diffusion_tpu.profiling.xplane import (  # noqa: F401
    attribute,
    device_op_table,
    find_xplane_files,
    parse_xspace,
)
