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
    (reference `models/utils.py:114-120`).

    Also applies the recipe's conv-lowering knobs
    (``model.conv_dispatch`` / ``model.fused_tail`` — see
    `layers.apply_dispatch_config`) so measured dispatch winners are
    config-selectable in every mode."""
    from .layers import apply_dispatch_config

    apply_dispatch_config(config.model)
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
    # Conditional (paired-input) models take {'x','y'} dicts.  The reliable
    # signal is the task (lightning_module) being conditional — reference
    # srflow recipes set `lightning_module = 'conditional_decreasing_variance'`
    # without any `conditioning_approach` key (e.g. reference
    # `configs/ve/srflow/celebAHQ160/sequential/bicubic/config_160.py:29`).
    from ..sde.factory import is_conditional_config

    if "shape_y" in data and is_conditional_config(config):
        sx = (batch,) + _chw_to_hwc_shape(tuple(data.shape_x))
        sy = (batch,) + _chw_to_hwc_shape(tuple(data.shape_y))
        return {"x": jnp.zeros(sx), "y": jnp.zeros(sy)}, cond
    if "shape" in data:
        s = (batch,) + _chw_to_hwc_shape(tuple(data.shape))
        return jnp.zeros(s), cond
    s = (batch,) + _chw_to_hwc_shape(tuple(data.shape_x))
    return jnp.zeros(s), cond


def init_model(config, rng) -> Tuple[Any, Dict]:
    """Create the module and initialize its parameters.

    The whole init is one jitted program: un-jitted `module.init` dispatches
    thousands of tiny ops (minutes over a remote-device tunnel), while the
    jitted version is a single cached executable.
    """
    module = create_model(config)
    inputs, cond = example_inputs(config)
    params_rng, dropout_rng = jax.random.split(rng)

    @jax.jit
    def do_init():
        return module.init(
            {"params": params_rng, "dropout": dropout_rng}, inputs, cond, train=False
        )

    return module, do_init()["params"]


def init_model_shapes_only(config, rng, scale: float = 0.02) -> Tuple[Any, Dict]:
    """Module + host-initialized params from `jax.eval_shape` (no device
    compile at all).

    For benchmarking and compile checks the parameter *values* are
    irrelevant; this skips the (remote-)compile of the init program.  Heads
    named 'scale' get ones, 'bias'/'b' zeros, everything else small normal.
    """
    import numpy as np

    module = create_model(config)
    inputs, cond = example_inputs(config)
    shapes = jax.eval_shape(
        lambda: module.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            inputs,
            cond,
            train=False,
        )
    )["params"]
    host_rng = np.random.default_rng(0)

    def make(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale":
            return jnp.ones(leaf.shape, leaf.dtype)
        if name in ("bias", "b"):
            return jnp.zeros(leaf.shape, leaf.dtype)
        return jnp.asarray(
            host_rng.normal(0.0, scale, size=leaf.shape).astype(np.float32)
        ).astype(leaf.dtype)

    params = jax.tree_util.tree_map_with_path(make, shapes)
    return module, params


# Side-effect imports populate the registry (reference `run_lib.py:1-16`).
from . import fcn  # noqa: E402,F401
from . import ddpm  # noqa: E402,F401
from . import ncsnpp  # noqa: E402,F401
from . import ncsnv2  # noqa: E402,F401
from . import ddpm3d  # noqa: E402,F401

__all__ = [
    "register_model",
    "get_model",
    "create_model",
    "init_model",
    "example_inputs",
    "EMAState",
    "ema_update",
]
