"""Head-to-head trained parity: this framework vs the torch reference (CPU).

VERDICT round-2 item 3: train BOTH frameworks on the same task with matched
hyperparameters and data, compare convergence and sample quality — the
strongest quality-parity evidence obtainable in a weights-gated, single-chip
environment.

Task: 2-D GaussianBubbles (4 modes on the unit circle, sigma 0.2) + `fcn`
score net + VESDE, the reference's Synthetic path
(`lightning_data_modules/SyntheticDataset.py:34-126`, `models/fcn.py:6-59`).
Both sides train on the SAME fixed 100k-sample dataset with identical
hyperparameters (width/depth, lr, warmup, grad-clip, EMA rate, batch size,
loss: continuous DSM with likelihood weighting), then draw 4000 PC samples
(reverse_diffusion + langevin, 500 steps, snr 0.15) from EMA weights.

The torch side runs the reference's own code imported from /root/reference
(losses.get_sde_loss_fn, losses.get_optimizer/optimization_manager,
models.ema.ExponentialMovingAverage, sampling.unconditional.get_pc_sampler)
in a plain train loop (the reference's Lightning trainer is just a loop
around these same pieces; pytorch_lightning is not installed here, so
LightningModule is stubbed to nn.Module exactly as in
tests/test_reference_parity.py).

Outputs: artifacts/head_to_head/{results.json, loss_curves.png, scatter.png}

Usage: python scripts/head_to_head.py [--steps 10000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"

# ---------------------------------------------------------------- config

HP = dict(
    mixtures=4,
    mode_sigma=0.2,
    data_samples=100_000,
    batch_size=256,
    eval_batch=8192,
    lr=1e-3,
    warmup=100,
    grad_clip=1.0,
    ema_rate=0.999,
    hidden_layers=2,
    hidden_nodes=128,
    dropout=0.0,
    sigma_min=0.01,
    sigma_max=2.0,
    num_scales=500,
    snr=0.15,
    n_samples=4000,
    sample_steps=500,
    eps=1e-5,
)


def make_data(seed: int, n: int) -> np.ndarray:
    """4 Gaussian bubbles on the unit circle (reference SyntheticDataset)."""
    rng = np.random.default_rng(seed)
    k = HP["mixtures"]
    theta = 2 * np.pi * np.arange(k) / k
    centers = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    idx = rng.integers(0, k, size=n)
    return (centers[idx] + HP["mode_sigma"] * rng.standard_normal((n, 2))).astype(np.float32)


def sample_metrics(samples: np.ndarray, gt: np.ndarray) -> dict:
    k = HP["mixtures"]
    theta = 2 * np.pi * np.arange(k) / k
    centers = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    d = np.linalg.norm(samples[:, None, :] - centers[None], axis=-1)
    assign = d.argmin(1)
    mass = np.bincount(assign, minlength=k) / len(samples)
    resid = samples - centers[assign]
    per_mode_std = float(np.sqrt(np.mean(resid**2)))

    # energy distance vs ground-truth draws (subsampled for O(n^2) cost)
    a = samples[: 2000]
    b = gt[: 2000]
    def _mean_pdist(u, v):
        return float(np.mean(np.linalg.norm(u[:, None] - v[None], axis=-1)))
    e = 2 * _mean_pdist(a, b) - _mean_pdist(a, a) - _mean_pdist(b, b)
    return {
        "mode_mass": [float(m) for m in mass],
        "mode_mass_maxdev": float(np.abs(mass - 1 / k).max()),
        "per_mode_std": per_mode_std,
        "energy_distance_vs_gt": float(e),
    }


# ---------------------------------------------------------------- torch side


def run_torch(data: np.ndarray, eval_batch: np.ndarray, steps: int, log_every: int):
    import torch

    # stub the missing heavyweight deps exactly as tests/test_reference_parity.py
    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")
        pl_stub.LightningModule = torch.nn.Module
        pl_stub.LightningDataModule = object
        sys.modules["pytorch_lightning"] = pl_stub
    sys.path.insert(0, REF)
    try:
        import ml_collections
        import losses as ref_losses
        import sde_lib as ref_sde_lib
        from models import fcn as ref_fcn  # registers 'fcn'
        from models import utils as ref_mutils
        from models import ema as ref_ema
        from sampling import unconditional as ref_sampling
        from sampling.predictors import get_predictor
        from sampling.correctors import get_corrector

        torch.manual_seed(0)

        c = ml_collections.ConfigDict()
        c.model = ml_collections.ConfigDict(dict(
            name="fcn", state_size=2, hidden_layers=HP["hidden_layers"],
            hidden_nodes=HP["hidden_nodes"], dropout=HP["dropout"],
        ))
        c.optim = ml_collections.ConfigDict(dict(
            optimizer="Adam", lr=HP["lr"], beta1=0.9, eps=1e-8,
            weight_decay=0.0, warmup=HP["warmup"], grad_clip=HP["grad_clip"],
        ))

        model = ref_fcn.FCN(c)
        model.device = torch.device("cpu")
        # the reference's VE-continuous score wrapper reads
        # model.embedding_type (models/utils.py:251) which only NCSN++
        # defines — 'positional' means the net is fed sigma directly,
        # matching this framework's VE wrapper semantics
        model.embedding_type = "positional"
        sde = ref_sde_lib.VESDE(
            sigma_min=HP["sigma_min"], sigma_max=HP["sigma_max"], N=HP["num_scales"]
        )
        loss_fn = ref_losses.get_sde_loss_fn(
            sde, train=True, reduce_mean=True, continuous=True,
            likelihood_weighting=True, eps=HP["eps"],
        )
        eval_loss_fn = ref_losses.get_sde_loss_fn(
            sde, train=False, reduce_mean=True, continuous=True,
            likelihood_weighting=True, eps=HP["eps"],
        )
        optimizer = ref_losses.get_optimizer(c, model.parameters())
        optimize_fn = ref_losses.optimization_manager(c)
        ema = ref_ema.ExponentialMovingAverage(model.parameters(), decay=HP["ema_rate"])

        ev = torch.from_numpy(eval_batch)
        n = len(data)
        rng = np.random.default_rng(1)
        curve = []
        t_start = time.time()
        for step in range(1, steps + 1):
            idx = rng.integers(0, n, HP["batch_size"])
            batch = torch.from_numpy(data[idx])
            optimizer.zero_grad()
            loss = loss_fn(model, batch)
            loss.backward()
            optimize_fn(optimizer, model.parameters(), step)
            ema.update(model.parameters())
            if step % log_every == 0 or step == 1:
                model.eval()
                with torch.no_grad():
                    torch.manual_seed(4242 + step)  # shared eval noise stream
                    el = float(eval_loss_fn(model, ev))
                model.train()
                curve.append((step, el))
                print(f"[torch] step {step} eval_loss {el:.4f}", flush=True)
        train_time = time.time() - t_start

        # EMA weights for sampling (the reference's epoch-end copy_to)
        ema.copy_to(model.parameters())
        model.eval()
        sampler = ref_sampling.get_pc_sampler(
            sde, (HP["n_samples"], 2),
            get_predictor("reverse_diffusion"), get_corrector("langevin"),
            snr=HP["snr"], p_steps=HP["sample_steps"], c_steps=1,
            continuous=True, denoise=True, eps=HP["eps"],
        )
        t0 = time.time()
        samples, _ = sampler(model)
        sample_time = time.time() - t0
        return np.asarray(samples), curve, train_time, sample_time
    finally:
        sys.path.pop(0)


# ---------------------------------------------------------------- jax side


def run_jax(data: np.ndarray, eval_batch: np.ndarray, steps: int, log_every: int):
    import jax
    import jax.numpy as jnp
    import ml_collections

    from conditional_score_diffusion_tpu.models import init_model
    from conditional_score_diffusion_tpu.models.wrappers import get_score_fn
    from conditional_score_diffusion_tpu.sampling import get_pc_sampler
    from conditional_score_diffusion_tpu.sde import build_sde
    from conditional_score_diffusion_tpu.training.state import create_train_state
    from conditional_score_diffusion_tpu.training.steps import make_eval_step, make_train_step

    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(dict(
        sde="vesde", continuous=True, reduce_mean=True,
        likelihood_weighting=True, batch_size=HP["batch_size"],
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="fcn", state_size=2, hidden_layers=HP["hidden_layers"],
        hidden_nodes=HP["hidden_nodes"], dropout=HP["dropout"],
        sigma_min=HP["sigma_min"], sigma_max=HP["sigma_max"],
        num_scales=HP["num_scales"], ema_rate=HP["ema_rate"],
        beta_min=0.1, beta_max=20.0,
    ))
    c.optim = ml_collections.ConfigDict(dict(
        lr=HP["lr"], warmup=HP["warmup"], grad_clip=HP["grad_clip"],
        beta1=0.9, eps=1e-8, weight_decay=0.0, optimizer="Adam",
    ))
    c.data = ml_collections.ConfigDict(dict(shape=[2]))

    module, params = init_model(c, jax.random.key(0))
    state = create_train_state(c, params)
    train_step = jax.jit(make_train_step(c, module)[0])
    eval_step = jax.jit(make_eval_step(c, module, use_ema=False))

    sde, eps = build_sde(c)
    ev = jnp.asarray(eval_batch)
    n = len(data)
    rng = np.random.default_rng(1)
    key = jax.random.key(42)
    curve = []
    t_start = time.time()
    for step in range(1, steps + 1):
        idx = rng.integers(0, n, HP["batch_size"])
        batch = jnp.asarray(data[idx])
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if step % log_every == 0 or step == 1:
            el = float(eval_step(state, ev, jax.random.key(4242 + step))["eval_loss"])
            curve.append((step, el))
            print(f"[jax]   step {step} eval_loss {el:.4f}", flush=True)
    train_time = time.time() - t_start

    score_fn = get_score_fn(
        sde, module, state.ema.params, conditional=False, train=False, continuous=True
    )
    sampler = get_pc_sampler(
        sde, (HP["n_samples"], 2), "reverse_diffusion", "langevin",
        snr=HP["snr"], p_steps=HP["sample_steps"], c_steps=1, denoise=True, eps=HP["eps"],
    )
    fn = jax.jit(lambda r: sampler(r, score_fn)[0])
    t0 = time.time()
    samples = np.asarray(fn(jax.random.key(7)))
    sample_time = time.time() - t0
    return samples, curve, train_time, sample_time


# ---------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--log-every", type=int, default=250)
    ap.add_argument("--quick", action="store_true", help="200 steps smoke run")
    ap.add_argument("--out", default="artifacts/head_to_head")
    args = ap.parse_args()
    steps = 200 if args.quick else args.steps
    log_every = 50 if args.quick else args.log_every

    # CPU on both sides: the comparison is framework-vs-framework math, and
    # the torch reference only runs on CPU here.
    import jax

    jax.config.update("jax_platforms", "cpu")

    data = make_data(0, HP["data_samples"])
    eval_batch = make_data(123, HP["eval_batch"])
    gt = make_data(999, HP["n_samples"])

    jx = run_jax(data, eval_batch, steps, log_every)
    th = run_torch(data, eval_batch, steps, log_every)

    results = {
        "hyperparameters": HP,
        "steps": steps,
        "jax": {
            "final_eval_loss": jx[1][-1][1],
            "train_seconds": jx[2],
            "sample_seconds": jx[3],
            "metrics": sample_metrics(jx[0], gt),
            "curve": jx[1],
        },
        "torch": {
            "final_eval_loss": th[1][-1][1],
            "train_seconds": th[2],
            "sample_seconds": th[3],
            "metrics": sample_metrics(th[0], gt),
            "curve": th[1],
        },
        "gt_metrics": sample_metrics(make_data(555, HP["n_samples"]), gt),
    }

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(*zip(*jx[1]), label="this framework (JAX/TPU-native)", lw=1.5)
    ax.plot(*zip(*th[1]), label="torch reference", lw=1.5)
    ax.set_xlabel("step"); ax.set_ylabel("eval loss (likelihood-weighted DSM)")
    ax.set_title(f"GaussianBubbles FCN head-to-head ({steps} steps)")
    ax.legend(frameon=False); fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=150)

    fig, axes = plt.subplots(1, 3, figsize=(12, 4), sharex=True, sharey=True)
    for ax_, (s, title) in zip(
        axes, [(gt, "ground truth"), (jx[0], "this framework"), (th[0], "torch reference")]
    ):
        ax_.scatter(s[:, 0], s[:, 1], s=2, alpha=0.3)
        ax_.set_title(title); ax_.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "scatter.png"), dpi=150)

    print(json.dumps({k: v for k, v in results.items() if k != "hyperparameters"}, indent=2))


if __name__ == "__main__":
    main()
