"""Multi-scale autoregressive generation e2e on tiny models + pklv4 fixtures
(`--mode multi_scale_test`, reference `run_lib.py:113-332`)."""

import glob
import os
import pickle
import sys

import ml_collections
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_pklv4(path, n, size):
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (size, size, 3), dtype=np.uint8) for _ in range(n)]
    with open(path, "wb") as f:
        pickle.dump(images, f)


def _tiny_haar_scale_config(base_dir, image_size):
    from conditional_score_diffusion_tpu.configs.extra import haar_conditional_config

    c = haar_conditional_config(image_size, target_resolution=image_size)
    c.data.base_dir = base_dir
    c.data.level = 0
    half = image_size // 2
    c.data.shape_x = [9, half, half]
    c.data.shape_y = [3, half, half]
    c.data.effective_image_size = half
    c.model.nf = 8
    c.model.ch_mult = (1, 2)
    c.model.num_res_blocks = 1
    c.model.attn_resolutions = (half // 2,)
    c.model.num_scales = 10
    c.model.sigma_max_x = float(np.sqrt(np.prod(c.data.shape_x)))
    c.model.sigma_max_y = float(np.sqrt(np.prod(c.data.shape_y)))
    c.eval.batch_size = 2
    c.training.batch_size = 2
    return c


def test_multi_scale_haar_chain(tmp_path):
    """Two haar scales (8px -> 16px -> 32px images): each scale's model
    samples HF bands conditioned on the DC band; inverse Haar chains up."""
    ds_dir = tmp_path / "celebA-HQ-160"
    ds_dir.mkdir()
    # GT at 16 (for scale-1's datamodule; y comes from its test split DC)
    for f, size in [
        ("CelebAHq_160_MBic_tr.pklv4", 16),
        ("CelebAHq_160_MBic_va.pklv4", 16),
        ("CelebAHq_160_MBic_tr_X8.pklv4", 8),
        ("CelebAHq_160_MBic_va_X8.pklv4", 8),
    ]:
        _write_pklv4(str(ds_dir / f), 8, size)

    master = ml_collections.ConfigDict()
    master.coordinate_space = "haar"
    master.seed = 0
    master.scale_16 = _tiny_haar_scale_config(str(tmp_path), 16)
    master.scale_32 = _tiny_haar_scale_config(str(tmp_path), 32)

    from conditional_score_diffusion_tpu.eval.multiscale import run_multi_scale_test

    results = run_multi_scale_test(
        master, str(tmp_path / "logs"), p_steps=10, num_batches=1
    )
    assert len(results) == 1
    final = results[0]
    # lowest scale y is the 8px DC band -> after 2 haar inversions: 32px? No:
    # each scale doubles the spatial size of `current` (8 -> 16 -> 32).
    assert final.shape == (2, 32, 32, 3)
    assert np.isfinite(final).all()
    assert glob.glob(os.path.join(str(tmp_path / "logs"), "multi_scale", "*.png"))
