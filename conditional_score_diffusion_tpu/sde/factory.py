"""Build SDEs from an ml_collections config.

Reference: `lightning_modules/BaseSdeGenerativeModel.py:23-40` (unconditional)
and `lightning_modules/ConditionalSdeGenerativeModel.py:18-42` (conditional:
single cVESDE for the SR3/CDE estimator, or the multi-speed dict
``{'x': cVESDE(sigma_max_x), 'y': VESDE(sigma_max_y)}`` for CDiffE/CMDE/VS-CMDE).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax.numpy as jnp

from .ve import VESDE
from .vp import VPSDE, subVPSDE

SDELike = Union[VESDE, VPSDE, subVPSDE, Dict[str, Any]]


def is_multispeed(sde: SDELike) -> bool:
    """True for a multi-speed (dict) SDE — the reference's ``isinstance(sde, dict)``."""
    return isinstance(sde, dict)


def conditioning_approach(config) -> Optional[str]:
    training = config.training
    if "conditioning_approach" in training:
        return training.conditioning_approach
    return None


def is_conditional_config(config) -> bool:
    """A config drives a conditional (dict-SDE) model if it names a
    conditional approach OR a conditional lightning module: the reference
    srflow recipes set ``lightning_module = 'conditional_decreasing_variance'``
    with no ``conditioning_approach`` key, and the reference module builds
    the dict SDE unconditionally for VE (reference
    `ConditionalSdeGenerativeModel.py:143-176`)."""
    if conditioning_approach(config) is not None:
        return True
    task = config.training.get("lightning_module", "base")
    return "conditional" in task and not task.startswith("haar_multiscale")


def build_sde(
    config,
    data_mean: Optional[jnp.ndarray] = None,
    sigma_min_y: Optional[float] = None,
    sigma_max_y: Optional[float] = None,
) -> Tuple[SDELike, float]:
    """Return ``(sde, sampling_eps)`` for a config.

    ``sigma_min_y`` / ``sigma_max_y`` override the config values — used both
    by the VS-CMDE schedule (traced values inside jit) and by test-time
    restoration from checkpointed buffers (reference
    `lightning_callbacks/callbacks.py:75-78`).
    """
    name = config.training.sde.lower()
    model = config.model
    conditional = is_conditional_config(config)

    if name == "vpsde":
        sde = VPSDE(beta_0=model.beta_min, beta_1=model.beta_max, N=model.num_scales)
        return sde, 1e-3
    if name == "subvpsde":
        sde = subVPSDE(beta_0=model.beta_min, beta_1=model.beta_max, N=model.num_scales)
        return sde, 1e-3
    if name != "vesde":
        raise NotImplementedError(f"SDE {config.training.sde!r} unknown.")

    if not conditional:
        sde = VESDE(
            sigma_min=model.sigma_min,
            sigma_max=model.sigma_max,
            data_mean=data_mean,
            N=model.num_scales,
        )
        return sde, 1e-5

    sde_x = VESDE(
        sigma_min=model.sigma_min_x,
        sigma_max=model.sigma_max_x,
        data_mean=data_mean,
        N=model.num_scales,
    )
    if conditioning_approach(config) == "sr3":
        return sde_x, 1e-5

    smin_y = sigma_min_y if sigma_min_y is not None else model.sigma_min_y
    smax_y = sigma_max_y if sigma_max_y is not None else model.sigma_max_y
    sde_y = VESDE(sigma_min=smin_y, sigma_max=smax_y, N=model.num_scales)
    return {"x": sde_x, "y": sde_y}, 1e-5
