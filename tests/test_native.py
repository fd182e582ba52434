"""C++ host-data-path extension: build, correctness vs numpy, prefetch."""

import numpy as np
import pytest

from conditional_score_diffusion_tpu.data.native import (
    PrefetchIterator,
    assemble_batch,
    load_native,
)


def test_native_builds_and_loads():
    native = load_native()
    assert native is not None, "C++ extension failed to build (g++ expected in image)"


def test_assemble_batch_matches_numpy():
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (8, 6, 3), np.uint8) for _ in range(5)]
    flips = np.array([0, 1, 0, 1, 1], np.uint8)

    got = assemble_batch(images, up=2, flips=flips)
    assert got.shape == (5, 16, 12, 3)

    for i, im in enumerate(images):
        x = im.astype(np.float32) / 255.0
        if flips[i]:
            x = x[:, ::-1]
        x = x.repeat(2, axis=0).repeat(2, axis=1)
        np.testing.assert_allclose(got[i], x, atol=1e-7)


def test_assemble_batch_no_flip_no_up():
    rng = np.random.RandomState(1)
    images = [rng.randint(0, 255, (4, 4, 1), np.uint8) for _ in range(3)]
    got = assemble_batch(images)
    want = np.stack([im.astype(np.float32) / 255.0 for im in images])
    np.testing.assert_allclose(got, want)


def test_prefetch_iterator_order_and_exhaustion():
    it = PrefetchIterator(iter(range(10)), depth=3)
    assert list(it) == list(range(10))


def test_prefetch_iterator_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        for _ in it:
            pass
