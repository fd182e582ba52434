"""Diffusion SDE library (pure-functional, pytree-registered).

Reference: `sde_lib.py` (SDE/cSDE ABCs, VPSDE, subVPSDE, VESDE and their
conditional twins).  In this framework an SDE is a `flax.struct` dataclass of
pure functions whose hyperparameters (sigma_min/sigma_max/beta_0/beta_1) are
*pytree leaves*, so they may be traced values inside `jit` — this is what lets
the VS-CMDE decreasing-variance schedule update sigma_y every step without
rebuilding any Python objects (reference rebuilt the SDE + loss fns per batch
in `lightning_callbacks/callbacks.py:66-73`).

A *multi-speed* SDE is simply a dict pytree `{'x': VESDE(...), 'y': VESDE(...)}`
(reference: `lightning_modules/ConditionalSdeGenerativeModel.py:38-39`).
"""

from .base import batch_mul, ReverseSDE
from .ve import VESDE
from .vp import VPSDE, subVPSDE
from .factory import build_sde, is_multispeed

# The reference distinguishes cVESDE/cVPSDE from VESDE/VPSDE only to drive
# isinstance-based dispatch (`sde_lib.py:104-142`); the math is identical.
# Conditioning here is a property of the score function, not the SDE.
cVESDE = VESDE
cVPSDE = VPSDE

__all__ = [
    "batch_mul",
    "ReverseSDE",
    "VESDE",
    "VPSDE",
    "subVPSDE",
    "cVESDE",
    "cVPSDE",
    "build_sde",
    "is_multispeed",
]
