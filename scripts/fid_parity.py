"""FID-parity runbook: this framework vs pytorch-fid semantics, one command.

North star: "FID within 1% of PyTorch" (reference `models/inception.py:17-204`,
`evaluation.py:390-449`).  The pt_inception weights are egress-gated in this
environment, so the parity number cannot be produced here — this script makes
it a one-command affair the moment weights land:

    CSDT_INCEPTION_WEIGHTS=/path/to/pt_inception-2015-12-05-6726825d.pth \
        python scripts/fid_parity.py [dir_real] [dir_fake]

Default image trees: the committed texture64 artifact's x_gt vs draw_2
samples.  The script computes

  1. torch FID: the reference's `InceptionV3` (imported from
     /root/reference, weights loaded from the local file instead of the URL)
     + scipy Frechet distance — i.e. exact pytorch-fid semantics; and
  2. framework FID: the Flax BN-folded InceptionV3 + `eval/fid.py`
     (`fid_from_activations`) over the same PNGs,

then asserts |fid_jax - fid_torch| / fid_torch < 1%.

Degradation ladder (each stage prints an explicit SKIPPED reason):
  - no CSDT_INCEPTION_WEIGHTS      -> everything skipped (exit 0)
  - weights but no torchvision     -> torch side skipped (the reference
    architecture builds on torchvision.models.inception_v3); the framework
    FID is still computed and printed
  - both available                 -> full parity assertion
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
DEFAULT_REAL = "artifacts/texture64_run/evaluation/super-resolution/texture64/ours_NDV/images/x_gt"
DEFAULT_FAKE = (
    "artifacts/texture64_run/evaluation/super-resolution/texture64/ours_NDV/"
    "images/samples/snr_0.150/draw_2"
)


def load_images01(d: str) -> np.ndarray:
    """All PNGs in a dir -> float32 [0,1] NHWC, sorted by filename."""
    from PIL import Image

    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.lower().endswith((".png", ".jpg"))
    )
    assert files, f"no images under {d}"
    imgs = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0 for f in files]
    return np.stack(imgs)


def torch_fid(real: np.ndarray, fake: np.ndarray, weights: str) -> float | None:
    """pytorch-fid semantics via the reference InceptionV3 on torch CPU."""
    try:
        import torchvision  # noqa: F401
    except ImportError:
        print("SKIPPED torch side: torchvision not installed (reference "
              "InceptionV3 builds on torchvision.models.inception_v3)")
        return None
    import torch

    sys.path.insert(0, REF)
    try:
        import models.inception as ref_inception
    finally:
        sys.path.pop(0)

    # redirect the URL download to the local weights file
    state = torch.load(weights, map_location="cpu")
    ref_inception.load_state_dict_from_url = lambda *a, **k: state
    model = ref_inception.InceptionV3([3], resize_input=True, normalize_input=True)
    model.eval()

    def acts(imgs01: np.ndarray) -> np.ndarray:
        out = []
        with torch.no_grad():
            for i in range(0, len(imgs01), 32):
                x = torch.from_numpy(imgs01[i : i + 32]).permute(0, 3, 1, 2)
                a = model(x)[0]  # (B, 2048, 1, 1)
                out.append(a.squeeze(-1).squeeze(-1).numpy())
        return np.concatenate(out)

    a_r, a_f = acts(real), acts(fake)

    # Frechet distance, pytorch-fid formula (reference fid.py:140-178)
    from scipy import linalg

    mu1, mu2 = a_r.mean(0), a_f.mean(0)
    s1 = np.cov(a_r, rowvar=False)
    s2 = np.cov(a_f, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        eps = 1e-6
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def jax_fid(real: np.ndarray, fake: np.ndarray, weights: str) -> float:
    from conditional_score_diffusion_tpu.eval.fid import fid_from_activations
    from conditional_score_diffusion_tpu.eval.inception import (
        create_inception,
        load_fid_inception_params,
    )
    from conditional_score_diffusion_tpu.eval.pipeline import _batched_activations

    params = load_fid_inception_params(weights)
    apply_fn, params = create_inception((3,), params=params)
    a_r = _batched_activations(apply_fn, params, real)
    a_f = _batched_activations(apply_fn, params, fake)
    return fid_from_activations(a_r, a_f)


def main() -> int:
    weights = os.environ.get("CSDT_INCEPTION_WEIGHTS", "")
    if not weights or not os.path.isfile(weights):
        print(
            "SKIPPED: CSDT_INCEPTION_WEIGHTS not set or file missing — "
            "point it at a local pt_inception-2015-12-05-6726825d.pth "
            "(egress-gated in this environment; see BENCH_NOTES.md)"
        )
        return 0

    real_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_REAL
    fake_dir = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_FAKE
    real, fake = load_images01(real_dir), load_images01(fake_dir)
    print(f"real: {len(real)} images from {real_dir}")
    print(f"fake: {len(fake)} images from {fake_dir}")

    fid_j = jax_fid(real, fake, weights)
    print(f"framework FID: {fid_j:.6f}")

    fid_t = torch_fid(real, fake, weights)
    if fid_t is None:
        return 0
    print(f"pytorch-fid   FID: {fid_t:.6f}")
    rel = abs(fid_j - fid_t) / max(abs(fid_t), 1e-12)
    print(f"relative difference: {rel:.4%}")
    assert rel < 0.01, f"FID parity FAILED: {rel:.4%} >= 1%"
    print("FID parity PASSED (<1%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
