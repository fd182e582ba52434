"""Dataset statistics: Haar HF-coefficient mean for the VE prior shift.

Reference: `compute_dataset_statistics.py:24-220` — computes the mean of the
Haar detail coefficients over the train split, saved to
``datasets_mean/{dataset}_{image_size}/mean.npy`` (the reference saves
``mean.pt``), consumed by VESDE's ``data_mean`` prior shift
(`sde_lib.py:341-347`); plus simple per-batch intensity-range analysis for
volume datasets.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import create_datamodule
from ..ops.haar import get_hf_coefficients


def compute_dataset_statistics(config, max_batches: int = 200) -> np.ndarray:
    """Mean of Haar HF coefficients over the train set -> mean.npy."""
    datamodule = create_datamodule(config)
    datamodule.setup()

    total = None
    count = 0
    for i, batch in enumerate(datamodule.train_iterator()):
        if i >= max_batches:
            break
        x = batch["x"] if isinstance(batch, dict) else batch
        hf = np.asarray(get_hf_coefficients(jnp.asarray(x)))
        total = hf.sum(axis=0) if total is None else total + hf.sum(axis=0)
        count += hf.shape[0]
    assert count > 0, "empty train iterator"
    mean = (total / count).astype(np.float32)

    out_dir = os.path.join(
        config.data.base_dir,
        "datasets_mean",
        f"{config.data.dataset}_{config.data.image_size}",
    )
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    np.save(os.path.join(out_dir, "mean.npy"), mean)
    print(f"[stats] HF mean over {count} images -> {out_dir}/mean.npy "
          f"range [{mean.min():.4f}, {mean.max():.4f}]")
    return mean


def load_data_mean(config) -> Optional[jnp.ndarray]:
    """Load the precomputed mean if ``data.use_data_mean`` is set
    (reference `BaseSdeGenerativeModel.py:32-38`)."""
    if not config.data.get("use_data_mean", False):
        return None
    path = os.path.join(
        config.data.base_dir,
        "datasets_mean",
        f"{config.data.dataset}_{config.data.image_size}",
        "mean.npy",
    )
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"data.use_data_mean=True but {path} not found; run "
            f"--mode compute_dataset_statistics first"
        )
    return jnp.asarray(np.load(path))
