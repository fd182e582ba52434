"""Default LSUN config shim (reference `configs/default_lsun_configs.py`).

Kept at this path so reference-style configs that do
`from configs.default_lsun_configs import get_default_configs` load unchanged.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs as _defaults


def get_default_configs():
    return _defaults("lsun")
