"""Bits/dim evaluation over a data split.

Reference: the `eval.enable_bpd` / `eval.bpd_dataset` knobs
(`configs/default_cifar10_configs.py:37-38`) backed by `likelihood.py`'s
probability-flow ODE estimator.  Here the estimator runs fully on device
(`sampling/likelihood.py`), jitted once and iterated over the split.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wrappers import get_score_fn
from ..sampling import get_likelihood_fn
from ..sde import build_sde


def evaluate_bpd(
    config,
    module,
    params,
    datamodule,
    split: Optional[str] = None,
    max_batches: int = 8,
) -> float:
    """Mean bits/dim of the model on a data split."""
    sde, _ = build_sde(config)
    score_fn = get_score_fn(
        sde, module, params, conditional=False, train=False,
        continuous=config.training.continuous,
    )
    likelihood_fn = get_likelihood_fn(sde)
    split = split or config.eval.get("bpd_dataset", "test")
    it = (
        datamodule.test_iterator() if split == "test" else datamodule.val_iterator()
    )
    rng = jax.random.key(config.seed + 3)
    bpds = []
    for i, batch in enumerate(it):
        if i >= max_batches:
            break
        x = jnp.asarray(batch["x"] if isinstance(batch, dict) else batch)
        rng, r = jax.random.split(rng)
        bpd, _, _ = likelihood_fn(r, score_fn, x)
        bpds.append(np.asarray(bpd))
    assert bpds, "empty split"
    mean_bpd = float(np.concatenate(bpds).mean())
    print(f"[bpd] {split}: {mean_bpd:.4f} bits/dim over {len(bpds)} batches")
    return mean_bpd
