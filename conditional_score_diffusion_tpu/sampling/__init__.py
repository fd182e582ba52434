"""Sampling engines (reference: `sampling/`).

Predictors/correctors are pure step functions; the whole PC loop compiles to
a single `jax.lax.scan` (SURVEY.md §3.2: the reference's Python loop of
p_steps x (c_steps+1) network evals is the inference hot path).
"""

from .predictors import get_predictor, register_predictor
from .correctors import get_corrector, register_corrector
from .pc import (
    get_conditional_sampling_fn,
    get_inpainting_fn,
    get_pc_conditional_sampler,
    get_pc_inpainter,
    get_pc_sampler,
    get_sampling_fn,
)
from .controllable import get_pc_colorizer
from .ode import get_ode_sampler
from .likelihood import get_likelihood_fn

__all__ = [
    "get_predictor",
    "register_predictor",
    "get_corrector",
    "register_corrector",
    "get_pc_sampler",
    "get_pc_conditional_sampler",
    "get_pc_inpainter",
    "get_sampling_fn",
    "get_conditional_sampling_fn",
    "get_inpainting_fn",
    "get_pc_colorizer",
    "get_ode_sampler",
    "get_likelihood_fn",
]
