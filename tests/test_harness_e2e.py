"""End-to-end `--mode test` + offline evaluation_pipeline over synthetic
.pklv4 fixtures (the full reference test flow, SURVEY.md §3.3/§3.5, on a
tiny CMDE model)."""

import glob
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_pklv4(path, n, size):
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (size, size, 3), dtype=np.uint8) for _ in range(n)]
    with open(path, "wb") as f:
        pickle.dump(images, f)


@pytest.fixture(scope="module")
def tiny_sr_config(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    ds_dir = base / "celebA-HQ-160"
    ds_dir.mkdir()
    for fname in [
        "CelebAHq_160_MBic_tr.pklv4",
        "CelebAHq_160_MBic_va.pklv4",
    ]:
        _write_pklv4(str(ds_dir / fname), 12, 16)
    for fname in [
        "CelebAHq_160_MBic_tr_X8.pklv4",
        "CelebAHq_160_MBic_va_X8.pklv4",
    ]:
        _write_pklv4(str(ds_dir / fname), 12, 8)

    from conditional_score_diffusion_tpu.configs.inverse_problems import (
        inverse_problem_config,
    )

    config = inverse_problem_config("inpainting", "ours_NDV")
    config.data.base_dir = str(base)
    config.data.image_size = 16
    config.data.effective_image_size = 16
    config.data.target_resolution = 16
    config.data.shape_x = [3, 16, 16]
    config.data.shape_y = [3, 16, 16]
    config.data.num_channels = 6
    config.model.nf = 8
    config.model.ch_mult = (1, 2)
    config.model.num_res_blocks = 1
    config.model.attn_resolutions = (8,)
    config.model.num_scales = 20
    config.model.sigma_max_x = float(np.sqrt(3 * 16 * 16))
    config.model.input_channels = 6
    config.model.output_channels = 6
    config.training.batch_size = 4
    config.eval.batch_size = 4
    config.eval.first_test_batch = 0
    config.eval.last_test_batch = 2
    config.eval.draws = [1, 2]
    config.eval.p_steps = 20
    config.eval.evaluation_metrics = ["psnr", "ssim", "consistency", "diversity"]
    config.eval.use_seed = True
    return config


def test_mode_test_writes_png_tree_and_metrics(tiny_sr_config, tmp_path):
    config = tiny_sr_config
    config.eval.base_log_dir = str(tmp_path / "evaluation")

    import run_lib

    results = run_lib.test(config, str(tmp_path / "logs"))

    base = os.path.join(
        config.eval.base_log_dir, config.data.task, config.data.dataset, "ours_NDV"
    )
    # PNG tree layout (reference PairedCallback.py:174-181)
    assert glob.glob(os.path.join(base, "images", "x_gt", "*.png"))
    assert glob.glob(os.path.join(base, "images", "y_gt", "*.png"))
    samples = glob.glob(
        os.path.join(base, "images", "samples", "snr_0.150", "draw_1", "*.png")
    )
    assert len(samples) == 8  # 2 batches x 4 images
    # pickled metrics
    pkl = os.path.join(base, "test_metrics", "0_2.pkl")
    assert os.path.isfile(pkl)
    with open(pkl, "rb") as f:
        saved = pickle.load(f)
    assert 0.15 in saved
    for m in ["psnr", "ssim", "diversity"]:
        assert saved[0.15][m], f"metric {m} empty"
        assert np.isfinite(saved[0.15][m]).all()


def test_evaluation_pipeline_over_saved_tree(tiny_sr_config):
    """Offline pipeline over the tree produced by the previous test."""
    config = tiny_sr_config
    base = os.path.join(
        config.eval.base_log_dir, config.data.task, config.data.dataset, "ours_NDV"
    )
    if not os.path.isdir(base):
        pytest.skip("run after test_mode_test")

    from conditional_score_diffusion_tpu.eval.pipeline import run_evaluation_pipeline

    results = run_evaluation_pipeline(config.data.task, base, snr=0.15)
    assert results["n_images"] == 8
    assert "draw_1" in results["per_draw"] and "draw_2" in results["per_draw"]
    assert np.isfinite(results["per_draw"]["draw_1"]["psnr"])
    assert "diversity" in results
    # FID/LPIPS gated on unavailable weights -> recorded as skipped
    assert any("fid" in s for s in results["skipped"])
    assert os.path.isfile(os.path.join(base, "evaluation_info.pkl"))


def test_evaluation_pipeline_master_config(tiny_sr_config):
    """Master-config semantics: iterate sub-configs (reference
    `run_lib.py:106-111`), incl. seeded-mask inpainting consistency."""
    config = tiny_sr_config
    base = os.path.join(
        config.eval.base_log_dir, config.data.task, config.data.dataset, "ours_NDV"
    )
    if not os.path.isdir(base):
        pytest.skip("run after test_mode_test")

    import run_lib

    master = ml_collections.ConfigDict()
    master.first = config
    master.second = config
    results = run_lib.evaluation_pipeline(master)
    assert set(results) == {"first", "second"}
    for sub in results.values():
        per_draw = sub[0.15]["per_draw"]
        assert "draw_1" in per_draw
        # the seeded mask re-roll makes the masked-region consistency real
        assert "consistency" in per_draw["draw_1"]
        assert np.isfinite(per_draw["draw_1"]["consistency"])
        assert per_draw["draw_1"]["consistency"] > per_draw["draw_1"]["psnr"]

    # the re-rolled masks must equal the real test-time masks: y_gt is
    # x * (1 - mask), so the re-rolled square must cover exactly the pixels
    # where y_gt was zeroed
    from PIL import Image

    from conditional_score_diffusion_tpu.data.degradations import random_square_mask

    ygt = np.asarray(
        Image.open(os.path.join(base, "images", "y_gt", "1.png")).convert("RGB"),
        dtype=np.float32,
    )
    xgt = np.asarray(
        Image.open(os.path.join(base, "images", "x_gt", "1.png")).convert("RGB"),
        dtype=np.float32,
    )
    mask = random_square_mask(
        (1,) + ygt.shape[:2] + (1,), config.data.mask_coverage,
        np.random.default_rng(0), seeds=np.asarray([0]),
    )[0, :, :, 0]
    # inside the re-rolled square y is zeroed; outside it matches x
    assert np.all(ygt[mask > 0.5] == 0)
    assert np.array_equal(ygt[mask < 0.5], xgt[mask < 0.5])
