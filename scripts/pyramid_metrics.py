"""Score an existing multi_scale_test run: PSNR/SSIM of the saved chained
final-scale PNGs against the GT batch rebuilt from the master config.

New multi_scale_test runs record this automatically (eval/multiscale.py
writes multi_scale/metrics.json); this script back-fills the metric for runs
that predate it (the round-3 CPU-trained texture64 pyramid).

Usage:
  python scripts/pyramid_metrics.py \
      --config configs/artifacts/texture64_multiscale_master.py \
      --run_dir artifacts/texture64_pyramid/pyramid_test
"""

import argparse
import glob
import importlib.util
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_config(path):
    spec = importlib.util.spec_from_file_location("cfg", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--run_dir", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from conditional_score_diffusion_tpu.data import create_datamodule
    from conditional_score_diffusion_tpu.eval.metrics import mean_psnr, mean_ssim
    from conditional_score_diffusion_tpu.ops.haar import haar_backward

    master = load_config(args.config)
    coord_space = master.get("coordinate_space", "haar")
    scale_keys = sorted(k for k in master.keys() if k.startswith(("scale", "config")))
    configs = sorted(
        (master[k] for k in scale_keys), key=lambda c: int(c.data.image_size)
    )
    gt_dm = create_datamodule(configs[-1])
    gt_dm.setup()

    out_dir = os.path.join(args.run_dir, "multi_scale")
    per_batch = []
    it = iter(gt_dm.test_iterator())
    for batch_idx in range(1000):
        paths = sorted(
            glob.glob(os.path.join(out_dir, f"batch{batch_idx}_*.png")),
            key=lambda p: int(re.search(r"_(\d+)\.png$", p).group(1)),
        )
        if not paths:
            break
        finals = np.stack(
            [np.asarray(Image.open(p), dtype=np.float32) / 255.0 for p in paths]
        )
        if finals.ndim == 3:
            finals = finals[..., None]
        gt_batch = next(it)
        if isinstance(gt_batch, dict):
            if coord_space == "haar":
                bands = np.concatenate(
                    [np.asarray(gt_batch["y"]), np.asarray(gt_batch["x"])], axis=-1
                )
                gt = np.asarray(haar_backward(bands))
            else:
                gt = np.asarray(gt_batch["x"])
        else:
            gt = np.asarray(gt_batch)
        # A batch-size or shuffle difference vs the original multi_scale_test
        # run would silently pair finals with the wrong GT images — fail loud.
        if len(gt) != len(finals):
            raise SystemExit(
                f"batch {batch_idx}: rebuilt GT batch has {len(gt)} images but "
                f"{len(finals)} final PNGs were saved — the datamodule's batch "
                "size/order no longer matches the original run; refusing to "
                "compute misaligned metrics."
            )
        n = len(finals)
        gt = np.clip(gt[:n].astype(np.float32), 0.0, 1.0)
        m = {
            "batch": batch_idx,
            "n": int(n),
            "psnr": mean_psnr(finals[:n], gt),
            "ssim": mean_ssim(finals[:n], gt),
        }
        print(m, flush=True)
        per_batch.append(m)

    assert per_batch, f"no batch*_*.png found under {out_dir}"
    summary = {
        "per_batch": per_batch,
        "mean_psnr": float(np.mean([m["psnr"] for m in per_batch])),
        "mean_ssim": float(np.mean([m["ssim"] for m in per_batch])),
        "coordinate_space": coord_space,
        "source": "scripts/pyramid_metrics.py backfill from saved PNGs (uint8-quantized)",
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in ("mean_psnr", "mean_ssim")}))


if __name__ == "__main__":
    main()
