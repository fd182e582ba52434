"""Loss factories (reference: `losses.py`)."""

from .continuous import get_general_sde_loss_fn
from .discrete import get_ddpm_loss_fn, get_inverse_problem_smld_loss_fn, get_smld_loss_fn
from .factory import build_loss_fn

__all__ = [
    "get_general_sde_loss_fn",
    "get_smld_loss_fn",
    "get_inverse_problem_smld_loss_fn",
    "get_ddpm_loss_fn",
    "build_loss_fn",
]
