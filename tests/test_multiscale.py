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
    samples HF bands conditioned on the DC band; inverse Haar chains up.
    Each scale's datamodule reads GT at that scale's resolution (the GT
    pyramid comes from the max-scale datamodule, reference
    `run_lib.py:301-320`)."""
    for scale_dir, size in [("s16", 16), ("s32", 32)]:
        ds_dir = tmp_path / scale_dir / "celebA-HQ-160"
        ds_dir.mkdir(parents=True)
        for f, s in [
            ("CelebAHq_160_MBic_tr.pklv4", size),
            ("CelebAHq_160_MBic_va.pklv4", size),
            ("CelebAHq_160_MBic_tr_X8.pklv4", size // 2),
            ("CelebAHq_160_MBic_va_X8.pklv4", size // 2),
        ]:
            _write_pklv4(str(ds_dir / f), 8, s)

    master = ml_collections.ConfigDict()
    master.coordinate_space = "haar"
    master.seed = 0
    master.scale_16 = _tiny_haar_scale_config(str(tmp_path / "s16"), 16)
    master.scale_32 = _tiny_haar_scale_config(str(tmp_path / "s32"), 32)

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
    # reference fidelity (run_lib.py:224-239,323-329): concatenated
    # pyramid|GT image + per-band supergrids logged to TensorBoard
    assert glob.glob(
        os.path.join(str(tmp_path / "logs"), "multi_scale", "pyramid_batch*.png")
    )
    assert glob.glob(
        os.path.join(str(tmp_path / "logs"), "autoregressive_samples", "events.*")
    )
    # chain metrics are recorded (PSNR/SSIM of final scale vs GT)
    import json

    with open(os.path.join(str(tmp_path / "logs"), "multi_scale", "metrics.json")) as f:
        m = json.load(f)
    assert m["per_batch"] and np.isfinite(m["mean_psnr"]) and np.isfinite(m["mean_ssim"])
    assert -1.0 <= m["mean_ssim"] <= 1.0
    # the zero-detail DC-only control is recorded alongside (the bar the
    # trained chain must beat for its detail models to add fidelity)
    assert np.isfinite(m["dc_only_mean_psnr"])
    assert -1.0 <= m["dc_only_mean_ssim"] <= 1.0


def test_rescale_and_concatenate_pyramid_shapes():
    """Reference `rescale_and_concatenate` (`run_lib.py:224-239`): every level
    NN-upsampled to the final resolution, per-image normalized, width-concat."""
    from conditional_score_diffusion_tpu.eval.multiscale import rescale_and_concatenate

    rng = np.random.RandomState(0)
    pyramid = [rng.rand(2, s, s, 3).astype(np.float32) * 7 - 3 for s in (8, 16, 32)]
    out = rescale_and_concatenate(pyramid)
    assert out.shape == (2, 32, 32 * 3, 3)
    # per-image normalization puts each level's slice in [0, 1]
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    for j in range(3):
        sl = out[:, :, j * 32 : (j + 1) * 32]
        assert sl.max() > 0.9  # each slice individually min-max normalized
    # NN upsampling of the 8px level: 4x4 constant blocks
    blk = out[:, :4, :4, :]
    assert np.allclose(blk, blk[:, :1, :1, :])


def _tiny_bicubic_scale_config(base_dir, dataset, image_size):
    from conditional_score_diffusion_tpu.configs.srflow import hq160_sequential_config

    c = hq160_sequential_config(40, "bicubic")
    c.data.base_dir = base_dir
    c.data.dataset = dataset
    c.data.image_size = image_size
    c.data.effective_image_size = image_size // 2
    c.data.shape_x = [3, image_size, image_size]
    c.data.shape_y = [3, image_size // 2, image_size // 2]
    c.model.sigma_max_x = float(np.sqrt(np.prod(c.data.shape_x)))
    c.model.sigma_max_y = float(np.sqrt(np.prod(c.data.shape_y)))
    c.model.sigma_max_y_target = c.model.sigma_max_y / 2
    c.model.nf = 8
    c.model.ch_mult = (1, 2)
    c.model.num_res_blocks = 1
    c.model.attn_resolutions = (image_size // 4,)
    c.model.num_scales = 10
    c.eval.batch_size = 2
    c.training.batch_size = 2
    return c


def test_multi_scale_bicubic_chain(tmp_path):
    """Two bicubic SR scales (8px lr -> 16px -> 32px): each scale's 2xSR model
    samples the next resolution conditioned on the previous sample
    (reference `run_lib.py:149-163`)."""
    for name, size in [("toybic16", 16), ("toybic32", 32)]:
        d = tmp_path / name
        d.mkdir()
        for phase in ("train", "val", "test"):
            _write_pklv4(str(d / f"{name}-{phase}.pklv4"), 6, size)
            _write_pklv4(str(d / f"{name}-{phase}_X2.pklv4"), 6, size // 2)

    master = ml_collections.ConfigDict()
    master.coordinate_space = "bicubic"
    master.seed = 0
    master.scale_16 = _tiny_bicubic_scale_config(str(tmp_path), "toybic16", 16)
    master.scale_32 = _tiny_bicubic_scale_config(str(tmp_path), "toybic32", 32)

    from conditional_score_diffusion_tpu.eval.multiscale import run_multi_scale_test

    results = run_multi_scale_test(
        master, str(tmp_path / "logs"), p_steps=5, num_batches=1
    )
    final = results[0]
    assert final.shape == (2, 32, 32, 3)
    assert np.isfinite(final).all()
    assert glob.glob(
        os.path.join(str(tmp_path / "logs"), "multi_scale", "pyramid_batch*.png")
    )
    assert glob.glob(
        os.path.join(str(tmp_path / "logs"), "autoregressive_samples", "events.*")
    )
