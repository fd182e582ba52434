"""Config system (ml_collections).

Reference: `configs/**` — 142 per-experiment files each defining
``get_config() -> ConfigDict`` with sections
``training/sampling/eval/data/model/optim`` plus ``seed``
(`configs/ve/inverse_problems/super_resolution/celebA_ours_NDV_160.py`).

This framework keeps the same section schema and CLI binding
(`--config path/to/file.py` via ml_collections config_flags) but composes
configs from shared builders instead of 142 near-copies: `base.py` defines
the defaults, experiment files override.
"""

from .base import base_config

__all__ = ["base_config"]
