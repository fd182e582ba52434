"""Offline dataset builders + statistics round trips."""

import glob
import os

import numpy as np
import pytest
from PIL import Image


def _make_images(d, n=12, size=16):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(
            os.path.join(d, f"{i:03d}.png")
        )


def test_haar_builder_and_datamodule_roundtrip(tmp_path):
    """create_haar_dataset -> HaarDecomposedDataModule reads every level."""
    src = str(tmp_path / "raw")
    _make_images(src, n=12, size=16)

    from conditional_score_diffusion_tpu.data.builder import create_haar_dataset

    ranges = create_haar_dataset(
        src_dir=src, out_base=str(tmp_path), dataset_name="toy",
        image_size=16, max_depth=2, split=(0.5, 0.25, 0.25), seed=0,
    )
    assert set(ranges) == {0, 1, 2}
    # level-0 pngs and level-1/2 npys exist per phase
    assert glob.glob(str(tmp_path / "toy_16" / "train" / "*.png"))
    assert glob.glob(str(tmp_path / "toy_8" / "train" / "*.npy"))
    assert glob.glob(str(tmp_path / "toy_4" / "val" / "*.npy"))

    import ml_collections

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.training = ml_collections.ConfigDict(dict(batch_size=2))
    c.eval = ml_collections.ConfigDict(dict(batch_size=2))
    c.data = ml_collections.ConfigDict(
        dict(base_dir=str(tmp_path), dataset="toy", datamodule="haar_multiscale",
             image_size=8, level=1)
    )
    from conditional_score_diffusion_tpu.data import create_datamodule

    dm = create_datamodule(c)
    dm.setup()
    batch = next(dm.train_iterator())
    assert batch.shape == (2, 8, 8, 3)  # level-1 approx coefficients
    assert np.isfinite(batch).all()


def test_compute_dataset_statistics(tmp_path):
    """--mode compute_dataset_statistics writes the HF mean consumed by the
    VE prior shift."""
    src = str(tmp_path / "imgs")
    _make_images(src, n=8, size=16)

    import ml_collections

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.training = ml_collections.ConfigDict(dict(batch_size=4))
    c.eval = ml_collections.ConfigDict(dict(batch_size=4))
    c.data = ml_collections.ConfigDict(
        dict(base_dir=str(tmp_path), dataset="imgs", datamodule="image",
             split=[0.75, 0.125, 0.125], image_size=16,
             shape=[3, 16, 16], use_data_mean=True)
    )
    from conditional_score_diffusion_tpu.data.statistics import (
        compute_dataset_statistics,
        load_data_mean,
    )

    mean = compute_dataset_statistics(c, max_batches=2)
    assert mean.shape == (8, 8, 9)  # HF bands of 16px images
    loaded = load_data_mean(c)
    np.testing.assert_allclose(np.asarray(loaded), mean, atol=1e-6)
