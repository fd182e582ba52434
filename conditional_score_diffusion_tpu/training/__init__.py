"""Training system.

Reference equivalent: `lightning_modules/` + `lightning_callbacks/` +
`pl.Trainer` — replaced by a pure train state (`state.py`), jitted train/eval
steps (`steps.py`, with the VS-CMDE schedule evaluated *inside* the step),
orbax checkpointing (`checkpoint.py`) and a host-side loop (`trainer.py`).
"""

from .state import TrainState, create_train_state, make_optimizer
from .schedules import reduction_fn, sigma_y_at_step
from .steps import make_eval_step, make_sde_for_step, make_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "reduction_fn",
    "sigma_y_at_step",
    "make_train_step",
    "make_eval_step",
    "make_sde_for_step",
]
