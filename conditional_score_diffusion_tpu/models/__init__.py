"""Score-network models (Flax linen, NHWC) + registry.

Reference: `models/` — registry (`models/utils.py:24-47`), NCSN++
(`ncsnpp.py`), DDPM (`ddpm.py`), DDPM3D, NCSNv2, FCN, EMA.

Models are registered under the same names as the reference so configs run
unchanged (`ncsnpp`, `ddpm`, `ddpm_paired`, `ddpm_paired_SR3`, ...).  Every
model class provides ``from_config(config)``; use :func:`create_model` /
:func:`init_model`.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import registry
from .ema import EMAState, ema_update

register_model = registry.models.register
get_model = registry.models.get


def create_model(config):
    """Instantiate the model module named by ``config.model.name``
    (reference `models/utils.py:114-120`)."""
    cls = get_model(config.model.name)
    return cls.from_config(config)


def _chw_to_hwc_shape(shape):
    c, *spatial = shape
    return tuple(spatial) + (c,)


def example_inputs(config, batch: int = 1):
    """Build dummy inputs matching the model's expected structure.

    Reference configs carry CHW ``data.shape_x``/``shape_y``/``shape``; this
    framework is NHWC throughout.
    """
    data = config.data
    cond = jnp.zeros((batch,), dtype=jnp.float32)
    if "shape_y" in data and "conditioning_approach" in config.training:
        sx = (batch,) + _chw_to_hwc_shape(tuple(data.shape_x))
        sy = (batch,) + _chw_to_hwc_shape(tuple(data.shape_y))
        return {"x": jnp.zeros(sx), "y": jnp.zeros(sy)}, cond
    if "shape" in data:
        s = (batch,) + _chw_to_hwc_shape(tuple(data.shape))
        return jnp.zeros(s), cond
    s = (batch,) + _chw_to_hwc_shape(tuple(data.shape_x))
    return jnp.zeros(s), cond


def init_model(config, rng) -> Tuple[Any, Dict]:
    """Create the module and initialize its parameters."""
    module = create_model(config)
    inputs, cond = example_inputs(config)
    params_rng, dropout_rng = jax.random.split(rng)
    variables = module.init(
        {"params": params_rng, "dropout": dropout_rng}, inputs, cond, train=False
    )
    return module, variables["params"]


# Side-effect imports populate the registry (reference `run_lib.py:1-16`).
from . import fcn  # noqa: E402,F401
from . import ddpm  # noqa: E402,F401
from . import ncsnpp  # noqa: E402,F401

__all__ = [
    "register_model",
    "get_model",
    "create_model",
    "init_model",
    "example_inputs",
    "EMAState",
    "ema_update",
]
