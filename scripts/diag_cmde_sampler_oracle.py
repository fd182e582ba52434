"""Sampler-vs-training diagnosis for the CMDE head-to-head (VERDICT round-3
item 5 follow-up).

Both frameworks' 6000-step CMDE runs produce sample PSNR ~7 (noise level)
while eval loss keeps dropping — is the PC conditional sampler configuration
(p_steps=200, snr=0.15, sigma_max_x=sqrt(D)) capable of producing clean
samples at all, or is the result purely a training-budget effect?

This script answers it with an ANALYTIC ORACLE: the exact score of the
empirical training distribution under the dict SDE's Gaussian perturbation
kernels — the global optimum of the DSM objective both frameworks train
toward (reference `losses.py:115-146`):

    p_t(x_t, y_t) = mean_i N(x_t; x_i, s_x(t)^2 I) N(y_t; y_i, s_y(t)^2 I)
    score_x       = (sum_i w_i x_i - x_t) / s_x(t)^2,
    w_i           = softmax_i(-|x_t-x_i|^2/(2 s_x^2) - |y_t-y_i|^2/(2 s_y^2))

Sampling through the production `get_pc_conditional_sampler` with this
oracle isolates the sampler: clean oracle samples => the h2h PSNR gap is
training budget (tiny nf=32 net, 6k steps), not sampler config; noisy
oracle samples => the sampler hyperparameters are the problem.

Usage:  JAX_PLATFORMS=cpu python scripts/diag_cmde_sampler_oracle.py
Env:    ORACLE_NREF (default 2048 training pairs), ORACLE_NTEST (default 16)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from head_to_head_cmde import HP, _metrics, build_data  # noqa: E402

from conditional_score_diffusion_tpu.sampling import get_pc_conditional_sampler  # noqa: E402
from conditional_score_diffusion_tpu.sde import VESDE  # noqa: E402

NREF = int(os.environ.get("ORACLE_NREF", "2048"))
NTEST = int(os.environ.get("ORACLE_NTEST", str(HP["n_test"])))


def make_oracle_score(x_bank: jnp.ndarray, y_bank: jnp.ndarray):
    """Exact empirical-mixture score wrt x of the dict-SDE joint kernel."""
    n, d = x_bank.shape
    x_sq = jnp.sum(x_bank * x_bank, axis=1)
    y_sq = jnp.sum(y_bank * y_bank, axis=1)

    def sigma(t, lo, hi):
        return lo * (hi / lo) ** t

    def score_fn(x, y, t):
        b = x.shape[0]
        xf = x.reshape(b, -1)
        yf = y.reshape(b, -1)
        sx = sigma(t[0] if t.ndim else t, HP["sigma_min_x"], HP["sigma_max_x"])
        sy = sigma(t[0] if t.ndim else t, HP["sigma_min_y"], HP["sigma_max_y"])
        # -|a-b|^2 = 2 a.b - |a|^2 - |b|^2 ; the |a|^2 term is constant in i
        logw = (2.0 * xf @ x_bank.T - x_sq[None, :]) / (2.0 * sx * sx) + (
            2.0 * yf @ y_bank.T - y_sq[None, :]
        ) / (2.0 * sy * sy)
        w = jax.nn.softmax(logw, axis=1)
        post_mean = w @ x_bank
        return ((post_mean - xf) / (sx * sx)).reshape(x.shape)

    return score_fn


def main():
    train, _ev, test = build_data()
    x_tr, y_tr = train
    x_te, y_te = test
    x_te, y_te = x_te[:NTEST], y_te[:NTEST]

    rs = np.random.RandomState(0)
    idx = rs.choice(len(x_tr), size=min(NREF, len(x_tr)), replace=False)
    x_bank = jnp.asarray(x_tr[idx].reshape(len(idx), -1))
    y_bank = jnp.asarray(y_tr[idx].reshape(len(idx), -1))
    score_fn = make_oracle_score(x_bank, y_bank)

    sde = {
        "x": VESDE(sigma_min=HP["sigma_min_x"], sigma_max=HP["sigma_max_x"], N=HP["num_scales"]),
        "y": VESDE(sigma_min=HP["sigma_min_y"], sigma_max=HP["sigma_max_y"], N=HP["num_scales"]),
    }
    shape = (NTEST, HP["image_size"], HP["image_size"], 3)

    # memorization ceiling: best-matching training image per test item
    d2 = (
        jnp.sum(jnp.asarray(x_te.reshape(NTEST, -1) ** 2), 1)[:, None]
        - 2 * jnp.asarray(x_te.reshape(NTEST, -1)) @ x_bank.T
        + jnp.sum(x_bank * x_bank, 1)[None, :]
    )
    nn_imgs = np.asarray(x_bank[jnp.argmin(d2, axis=1)]).reshape(x_te.shape)
    results = {
        "n_ref": int(len(idx)),
        "nn_train_ceiling": _metrics(nn_imgs[None], x_te),
        "bicubic_y": _metrics(y_te[None], x_te),
    }

    for name, p_steps, snr in [
        ("h2h_config_200step_snr0.15", HP["sample_steps"], HP["snr"]),
        ("reference_1000step_snr0.16", 1000, 0.16),
    ]:
        sampler = get_pc_conditional_sampler(
            sde, shape, "conditional_reverse_diffusion", "conditional_langevin",
            snr=snr, p_steps=p_steps, c_steps=1, denoise=True, eps=HP["eps"],
        )
        fn = jax.jit(lambda r, y, s=sampler: s(r, score_fn, y)[0])
        samples = np.asarray(fn(jax.random.key(7), jnp.asarray(y_te)))
        results[name] = _metrics(samples[None], x_te)
        print(f"{name}: {results[name]}", flush=True)

        out_dir = os.path.join(REPO, "artifacts", "head_to_head")
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, f"oracle_samples_{p_steps}.npy"), samples)

    with open(os.path.join(REPO, "artifacts", "head_to_head", "oracle_sampler_diag.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
