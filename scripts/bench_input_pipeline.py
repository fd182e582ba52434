"""Measure sustained input-pipeline throughput vs the flagship train step.

VERDICT round-2 item 9: the flagship (celebA_ours_NDV_160-shape) train step
runs at ~118 ms/step at B16 (135 img/s/chip, BENCH_NOTES round 2).  The host
loader (numpy degradations + C++ batch assembly + depth-2 thread prefetch)
must sustain comfortably more than that (>=2x) or it becomes the binding
constraint under data parallelism.

This is a pure-host measurement (no TPU needed): it times the
General_PKLDataset SR path exactly as the trainer consumes it
(`training/trainer.py:112-114` PrefetchIterator depth=2).

Usage: python scripts/bench_input_pipeline.py [n_batches]
"""

import importlib.util
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conditional_score_diffusion_tpu.data import create_datamodule  # noqa: E402
from conditional_score_diffusion_tpu.data.native import PrefetchIterator, load_native  # noqa: E402


def load_config(path: str):
    spec = importlib.util.spec_from_file_location("cfg", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    config = load_config("configs/artifacts/texture160_sr_cmde.py")
    native = load_native()
    print(f"native extension: {'loaded' if native else 'numpy fallback'}")

    dm = create_datamodule(config)
    dm.setup()
    bs = config.training.batch_size

    it = PrefetchIterator(dm.train_iterator(), depth=2)
    # warm: first few batches pay pickle-page faults etc.
    for _ in range(10):
        batch = next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        batch = next(it)
    dt = time.perf_counter() - t0
    imgs_per_sec = n_batches * bs / dt
    ms_per_batch = dt / n_batches * 1e3
    shapes = {k: np.asarray(v).shape for k, v in batch.items()}
    print(f"batch shapes: {shapes}")
    print(
        f"loader: {ms_per_batch:.2f} ms/batch(B{bs}) = {imgs_per_sec:.1f} img/s "
        f"({n_batches} batches)"
    )
    step_ms = 118.4  # flagship B16 train step, BENCH_NOTES round 2
    print(
        f"vs flagship train step {step_ms} ms/step: loader headroom "
        f"{step_ms / ms_per_batch:.2f}x"
    )


if __name__ == "__main__":
    main()
