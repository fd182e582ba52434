"""Data layer: datamodule registry + input pipelines.

Reference: `lightning_data_modules/` (registry at
`lightning_data_modules/utils.py:6-30`).  Datamodules here yield numpy
batches in NHWC; paired tasks yield ``{'x': ..., 'y': ...}`` dicts (the
reference's ``(y, x)`` tuples normalized).  Heavy degradations (bicubic,
masking, grayscale, Haar) run on device as fused XLA transforms
(`degradations.py`), not in Python workers.
"""

from .. import registry

register_datamodule = registry.datamodules.register
get_datamodule = registry.datamodules.get


def create_datamodule(config):
    """Reference `lightning_data_modules/utils.py:28-30`."""
    cls = get_datamodule(config.data.datamodule)
    return cls(config)


from . import synthetic  # noqa: E402,F401
from . import pkl_datasets  # noqa: E402,F401
from . import image_folder  # noqa: E402,F401
from . import paired  # noqa: E402,F401
from . import sr_multiscale  # noqa: E402,F401

__all__ = ["register_datamodule", "get_datamodule", "create_datamodule"]
