"""Autoregressive multi-scale generation across per-scale models.

Reference: `run_lib.multi_scale_test` (`run_lib.py:113-332`): a master
config holds one sub-config per scale; each scale's model is loaded from its
checkpoint; generation chains scales autoregressively in either coordinate
space:

  * ``bicubic``: the previous scale's sample (upscaled LR) conditions the
    next conditional SR model (`run_lib.py:149-163`);
  * ``haar``: the previous scale's image is the DC band; the model samples
    the HF detail bands; inverse Haar yields the next-scale image
    (`run_lib.py:165-215`).

Outputs are concatenated sample-vs-GT pyramids logged to TensorBoard and
saved as PNGs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_datamodule
from ..models import init_model
from ..ops.haar import haar_backward
from ..training.checkpoint import CheckpointManager
from ..training.state import create_train_state
from ..training.tasks import create_task


def _load_scale(config, checkpoint_path: Optional[str] = None):
    module, params = init_model(config, jax.random.key(config.seed))
    state = create_train_state(config, params)
    ckpt = checkpoint_path or config.model.get("checkpoint_path", "")
    if ckpt and os.path.isdir(ckpt):
        mgr = CheckpointManager(ckpt)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
        mgr.close()
    task = create_task(config, module)
    if hasattr(task, "reconfigure"):
        task.reconfigure(int(state.step))
    return task, state


def _nearest_up(x, factor):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * factor, W * factor, C), method="nearest")


def run_multi_scale_test(
    master_config,
    log_path: str,
    p_steps: int = 2000,
    corrector: str = "conditional_none",
    num_batches: int = 1,
) -> List[np.ndarray]:
    """Returns the list of final-scale sample batches (also saved as PNGs)."""
    coord_space = master_config.get("coordinate_space", "haar")
    scale_keys = [k for k in master_config.keys() if k.startswith(("scale", "config"))]
    if not scale_keys:
        scale_keys = [
            k for k, v in master_config.items()
            if hasattr(v, "get") and "training" in v
        ]
    scale_keys = sorted(scale_keys)
    assert scale_keys, "master config has no per-scale sub-configs"

    scales = []
    for k in scale_keys:
        config = master_config[k]
        task, state = _load_scale(config)
        scales.append((config, task, state))

    # Lowest-scale conditioning data comes from the first config's test split.
    base_config = scales[0][0]
    dm = create_datamodule(base_config)
    dm.setup()

    out_dir = os.path.join(log_path, "multi_scale")
    Path(out_dir).mkdir(parents=True, exist_ok=True)

    results = []
    rng = jax.random.key(master_config.get("seed", 42))
    for batch_idx, batch in enumerate(dm.test_iterator()):
        if batch_idx >= num_batches:
            break
        current = jnp.asarray(batch["y"] if isinstance(batch, dict) else batch)
        pyramid = [np.asarray(current)]

        for config, task, state in scales:
            rng, sample_rng = jax.random.split(rng)
            c, h, w = config.data.shape_x
            shape = (current.shape[0], h, w, c)
            fn = task.sampling_fn(shape, p_steps=p_steps, corrector=corrector)
            if task.conditional:
                samples, _ = fn(sample_rng, state.ema.params, current)
            else:
                samples, _ = fn(sample_rng, state.ema.params)

            if coord_space == "haar":
                # samples are the HF detail bands; current is the DC band
                full = jnp.concatenate([current, samples], axis=-1)
                current = haar_backward(full)
            else:  # bicubic: the sample becomes the next scale's conditioning
                current = jnp.clip(samples, 0.0, 1.0)
            pyramid.append(np.asarray(current))

        results.append(pyramid[-1])
        from PIL import Image

        for i in range(pyramid[-1].shape[0]):
            arr = np.clip(pyramid[-1][i], 0, 1)
            arr = (arr * 255).astype(np.uint8)
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
            Image.fromarray(arr).save(
                os.path.join(out_dir, f"batch{batch_idx}_{i}.png")
            )
        print(f"[multi_scale] batch {batch_idx}: final {pyramid[-1].shape}", flush=True)
    return results
