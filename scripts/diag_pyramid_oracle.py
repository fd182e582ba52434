"""Pyramid-chain oracle diagnosis (VERDICT round-3 item 4 follow-up).

The trained 2-scale Haar VS-CMDE pyramid chains at PSNR 23.3 vs the DC-only
control's 35.3 — the CPU-budget detail models HURT fidelity (checkerboard).
Is that purely training budget, or is something in the chain itself
(datamodule Haar ranges, sigma restore, sampler, inverse Haar) broken?

Answer it the same way `diag_cmde_sampler_oracle.py` answered the h2h
question: run the EXACT production chain configuration — the same per-scale
configs (`configs/artifacts/texture64_haar_scales.py`), the same test-time
sigma_y restoration (`sigma_y_at_step(config, 8001)` + `build_sde`, the
path `tasks.reconfigure` uses), the same conditional PC sampler settings as
`run_multi_scale_test` (conditional_reverse_diffusion predictor, no
corrector, p_steps=2000) — but with the analytic score of the EMPIRICAL
TRAINING DISTRIBUTION under each scale's perturbation kernels (the global
optimum of the DSM objective).  Clean oracle chain => pipeline sound,
budget is the gap; artifacts in the oracle chain => real pipeline bug.

Usage:  JAX_PLATFORMS=cpu python scripts/diag_pyramid_oracle.py
Env:    ORACLE_NREF (default 2048), ORACLE_PSTEPS (default 2000)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from configs.artifacts.texture64_haar_scales import scale_config  # noqa: E402

from conditional_score_diffusion_tpu.data import create_datamodule  # noqa: E402
from conditional_score_diffusion_tpu.eval.metrics import mean_psnr, mean_ssim  # noqa: E402
from conditional_score_diffusion_tpu.ops.haar import haar_backward  # noqa: E402
from conditional_score_diffusion_tpu.sampling import get_pc_conditional_sampler  # noqa: E402
from conditional_score_diffusion_tpu.sde.factory import build_sde  # noqa: E402
from conditional_score_diffusion_tpu.training.schedules import sigma_y_at_step  # noqa: E402

NREF = int(os.environ.get("ORACLE_NREF", "2048"))
PSTEPS = int(os.environ.get("ORACLE_PSTEPS", "2000"))
CKPT_STEP = 8001  # the trained scales' final step (sets restored sigma_y)


def collect_bank(dm, batch_size: int = 64):
    xs, ys = [], []
    it = dm.train_iterator(batch_size=batch_size)
    n = 0
    for batch in it:
        xs.append(np.asarray(batch["x"]))
        ys.append(np.asarray(batch["y"]))
        n += len(batch["x"])
        if n >= NREF:
            break
    x = np.concatenate(xs)[:NREF]
    y = np.concatenate(ys)[:NREF]
    return (
        jnp.asarray(x.reshape(len(x), -1)),
        jnp.asarray(y.reshape(len(y), -1)),
    )


def make_oracle_score(x_bank, y_bank, sde):
    x_sq = jnp.sum(x_bank * x_bank, axis=1)
    y_sq = jnp.sum(y_bank * y_bank, axis=1)
    zx = jnp.zeros(())

    def score_fn(x, y, t):
        b = x.shape[0]
        t0 = t[0] if t.ndim else t
        _, sx = sde["x"].marginal_prob(zx, t0)
        _, sy = sde["y"].marginal_prob(zx, t0)
        xf = x.reshape(b, -1)
        yf = y.reshape(b, -1)
        logw = (2.0 * xf @ x_bank.T - x_sq[None, :]) / (2.0 * sx * sx) + (
            2.0 * yf @ y_bank.T - y_sq[None, :]
        ) / (2.0 * sy * sy)
        w = jax.nn.softmax(logw, axis=1)
        return ((w @ x_bank - xf) / (sx * sx)).reshape(x.shape)

    return score_fn


def main():
    scales = []
    for size in (32, 64):
        c = scale_config(size)
        dm = create_datamodule(c)
        dm.setup()
        smin_y, smax_y = sigma_y_at_step(c, CKPT_STEP)
        sde, eps = build_sde(c, sigma_min_y=float(smin_y), sigma_max_y=float(smax_y))
        scales.append((c, dm, sde, eps))

    rng = jax.random.key(42)
    # first test batch of the lowest scale conditions the chain; GT comes
    # from the highest scale (mirrors run_multi_scale_test)
    batch0 = next(scales[0][1].test_iterator())
    current = jnp.asarray(batch0["y"])
    gt_batch = next(scales[-1][1].test_iterator())
    gt = np.asarray(
        haar_backward(jnp.concatenate([jnp.asarray(gt_batch["y"]), jnp.asarray(gt_batch["x"])], -1))
    )

    dc_only = jnp.asarray(batch0["y"])
    pyramid = [np.asarray(current)]
    for c, dm, sde, eps in scales:
        x_bank, y_bank = collect_bank(dm)
        score_fn = make_oracle_score(x_bank, y_bank, sde)
        ch, h, w = c.data.shape_x
        shape = (current.shape[0], h, w, ch)
        sampler = get_pc_conditional_sampler(
            sde, shape, "conditional_reverse_diffusion", "conditional_none",
            snr=c.sampling.snr, p_steps=PSTEPS, c_steps=1, denoise=True, eps=eps,
        )
        rng, sub = jax.random.split(rng)
        fn = jax.jit(lambda r, y, s=sampler, sf=score_fn: s(r, sf, y)[0])
        samples = fn(sub, current)
        current = haar_backward(jnp.concatenate([current, samples], axis=-1))
        dc_only = haar_backward(
            jnp.concatenate([dc_only, jnp.zeros((dc_only.shape[0], h, w, ch))], axis=-1)
        )
        pyramid.append(np.asarray(current))
        print(f"scale {c.data.image_size}: chained -> {current.shape}", flush=True)

    n = min(len(gt), pyramid[-1].shape[0])
    final = np.clip(pyramid[-1][:n].astype(np.float32), 0, 1)
    dc = np.clip(np.asarray(dc_only)[:n].astype(np.float32), 0, 1)
    gt_img = np.clip(gt[:n].astype(np.float32), 0, 1)
    results = {
        "n_ref": NREF,
        "p_steps": PSTEPS,
        "oracle_chain": {"psnr": mean_psnr(final, gt_img), "ssim": mean_ssim(final, gt_img)},
        "dc_only_control": {"psnr": mean_psnr(dc, gt_img), "ssim": mean_ssim(dc, gt_img)},
        "trained_chain_round3": {"psnr": 23.32, "ssim": 0.284},
    }

    out_dir = os.path.join(REPO, "artifacts", "texture64_pyramid", "pyramid_test", "multi_scale")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "oracle_metrics.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), flush=True)

    # visual evidence: per-item row of (16px DC | 32px | 64px | GT)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nshow = min(8, n)
    cols = len(pyramid) + 1
    fig, axes = plt.subplots(nshow, cols, figsize=(cols * 1.5, nshow * 1.5))
    for i in range(nshow):
        for j, im in enumerate(pyramid + [gt_img]):
            a = im[i].astype(np.float32)
            a = (a - a.min()) / max(a.max() - a.min(), 1e-8)
            axes[i, j].imshow(a)
            axes[i, j].axis("off")
    for j, lab in enumerate(["dc16"] + [f"scale{c.data.image_size}" for c, *_ in scales] + ["GT"]):
        axes[0, j].set_title(lab, fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "oracle_pyramid.png"), dpi=150)


if __name__ == "__main__":
    main()
