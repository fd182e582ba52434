"""Select the right loss for a config.

Reference: `lightning_modules/BaseSdeGenerativeModel.py:42-55` and
`ConditionalSdeGenerativeModel.py:44-67` (continuous -> general SDE loss;
discrete -> SMLD/DDPM/inverse-problem variants).
"""

from __future__ import annotations

from typing import Callable

from ..sde import VESDE, VPSDE, is_multispeed
from .continuous import get_general_sde_loss_fn
from .discrete import get_ddpm_loss_fn, get_inverse_problem_smld_loss_fn, get_smld_loss_fn


def build_loss_fn(config, module, sde_template, train: bool) -> Callable:
    """Return ``loss_fn(params, sde, batch, rng) -> scalar``.

    ``sde_template`` is only inspected for its *type* (dict / VE / VP) to pick
    the branch; the live SDE (possibly carrying traced sigma_y) is passed to
    the returned function at call time.
    """
    conditional = "conditioning_approach" in config.training

    if config.training.continuous:
        return get_general_sde_loss_fn(
            module,
            conditional=conditional,
            train=train,
            reduce_mean=config.training.reduce_mean,
            likelihood_weighting=config.training.likelihood_weighting,
        )

    if is_multispeed(sde_template):
        return get_inverse_problem_smld_loss_fn(
            module,
            train=train,
            reduce_mean=config.training.reduce_mean,
            likelihood_weighting=config.training.likelihood_weighting,
        )
    if isinstance(sde_template, VESDE):
        return get_smld_loss_fn(
            module, train=train, reduce_mean=config.training.reduce_mean
        )
    if isinstance(sde_template, VPSDE):
        return get_ddpm_loss_fn(module, train=train, reduce_mean=config.training.reduce_mean)
    raise ValueError(
        f"Discrete training for {type(sde_template).__name__} is not supported."
    )
