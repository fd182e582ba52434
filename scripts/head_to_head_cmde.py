"""Head-to-head #2: conv CMDE (dict multi-speed SDE) — this framework vs the
torch reference, trained on the same 32px texture SR task (CPU both sides).

Complements `head_to_head.py` (FCN/GaussianBubbles): this one exercises the
flagship *estimator* — a `ddpm_paired` U-Net scoring {'x','y'} jointly under
a 2-key dict SDE (CMDE, ours_NDV) with likelihood weighting — end to end:
training (reference `losses.get_general_sde_loss_fn` 2-key branch,
`losses.py:115-146`) and conditional PC sampling (reference
`sampling/conditional.py:47-228`) against our jitted train step and scan
sampler.  Identical data (texture64 crops bicubic-resized to 32px, 4x SR
degradation precomputed with the same numpy code for both sides), identical
hyperparameters, each framework's own RNG.

Outputs: artifacts/head_to_head/cmde_results.json, cmde_loss_curves.png,
cmde_samples.png

Usage: python scripts/head_to_head_cmde.py [--steps 1500] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REF = "/root/reference"

HP = dict(
    image_size=32,
    scale=4,
    batch_size=16,
    eval_batch=64,
    lr=2e-4,
    warmup=100,
    grad_clip=1.0,
    ema_rate=0.999,
    nf=32,
    ch_mult=(1, 2),
    num_res_blocks=2,
    attn_resolutions=(8,),
    dropout=0.0,
    sigma_min_x=5e-3,
    sigma_max_x=55.42562584220407,  # sqrt(3*32*32)
    sigma_min_y=5e-3,
    sigma_max_y=0.1,
    num_scales=200,
    snr=0.15,
    sample_steps=200,
    n_test=16,
    n_draws=2,
    eps=1e-5,
)


def build_data():
    """32px GT + 4x-SR-degraded y from the committed texture64 pklv4."""
    from conditional_score_diffusion_tpu.data.degradations import (
        bicubic_resize_np,
        sr_degrade,
    )

    def prep(phase, n=None):
        with open(f"datasets/texture64/texture64-{phase}.pklv4", "rb") as f:
            items = pickle.load(f)
        if n is not None:
            items = items[:n]
        gt64 = np.stack([np.asarray(im) for im in items]).astype(np.float32) / 255.0
        x = bicubic_resize_np(gt64, HP["image_size"]).astype(np.float32)
        y = sr_degrade(x, HP["scale"]).astype(np.float32)
        return x, y

    x_tr, y_tr = prep("train")
    x_ev, y_ev = prep("val", HP["eval_batch"])
    x_te, y_te = prep("test", HP["n_test"])
    return (x_tr, y_tr), (x_ev, y_ev), (x_te, y_te)


def _metrics(samples: np.ndarray, gt: np.ndarray) -> dict:
    """samples: (draws, N, H, W, C) in [0,1]; gt: (N, H, W, C)."""
    import jax.numpy as jnp

    from conditional_score_diffusion_tpu.eval.metrics import mean_psnr, mean_ssim

    ps, ss = [], []
    for d in range(samples.shape[0]):
        s = jnp.asarray(np.clip(samples[d], 0, 1))
        ps.append(mean_psnr(s, jnp.asarray(gt)))
        ss.append(mean_ssim(s, jnp.asarray(gt)))
    return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}


# ---------------------------------------------------------------- torch side


def run_torch(train, ev, test, steps, log_every):
    import torch

    # pytorch_lightning / op / torchvision stubs, shared with the parity tests
    from test_reference_parity import _stub_modules

    _stub_modules()
    sys.path.insert(0, REF)
    try:
        import ml_collections
        import losses as ref_losses
        import sde_lib as ref_sde_lib
        from models import ddpm as ref_ddpm
        from models import ema as ref_ema
        from sampling import conditional as ref_cond
        from sampling.predictors import get_predictor
        from sampling.correctors import get_corrector

        torch.manual_seed(0)
        c = _shared_model_config(ml_collections)
        model = ref_ddpm.DDPM_paired(c)
        model.device = torch.device("cpu")

        sde = {
            "x": ref_sde_lib.cVESDE(
                sigma_min=HP["sigma_min_x"], sigma_max=HP["sigma_max_x"], N=HP["num_scales"]
            ),
            "y": ref_sde_lib.VESDE(
                sigma_min=HP["sigma_min_y"], sigma_max=HP["sigma_max_y"], N=HP["num_scales"]
            ),
        }
        loss_fn = ref_losses.get_general_sde_loss_fn(
            sde, train=True, conditional=True, reduce_mean=True,
            continuous=True, likelihood_weighting=True, eps=HP["eps"],
        )
        eval_loss_fn = ref_losses.get_general_sde_loss_fn(
            sde, train=False, conditional=True, reduce_mean=True,
            continuous=True, likelihood_weighting=True, eps=HP["eps"],
        )
        oc = ml_collections.ConfigDict()
        oc.optim = ml_collections.ConfigDict(dict(
            optimizer="Adam", lr=HP["lr"], beta1=0.9, eps=1e-8,
            weight_decay=0.0, warmup=HP["warmup"], grad_clip=HP["grad_clip"],
        ))
        optimizer = ref_losses.get_optimizer(oc, model.parameters())
        optimize_fn = ref_losses.optimization_manager(oc)
        ema = ref_ema.ExponentialMovingAverage(model.parameters(), decay=HP["ema_rate"])

        def to_nchw(a):
            return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))

        x_tr, y_tr = train
        ev_batch = (to_nchw(ev[1]), to_nchw(ev[0]))  # (y, x)
        n = len(x_tr)
        rng = np.random.default_rng(1)
        curve = []
        t_start = time.time()
        for step in range(1, steps + 1):
            idx = rng.integers(0, n, HP["batch_size"])
            batch = (to_nchw(y_tr[idx]), to_nchw(x_tr[idx]))
            optimizer.zero_grad()
            loss = loss_fn(model, batch)
            loss.backward()
            optimize_fn(optimizer, model.parameters(), step)
            ema.update(model.parameters())
            if step % log_every == 0 or step == 1:
                model.eval()
                with torch.no_grad():
                    torch.manual_seed(4242 + step)
                    el = float(eval_loss_fn(model, ev_batch))
                model.train()
                curve.append((step, el))
                print(f"[torch] step {step} eval_loss {el:.4f}", flush=True)
        train_time = time.time() - t_start

        ema.copy_to(model.parameters())
        model.eval()
        x_te, y_te = test
        sampler = ref_cond.get_pc_conditional_sampler(
            sde=sde, shape=(HP["n_test"], 3, HP["image_size"], HP["image_size"]),
            predictor=get_predictor("conditional_reverse_diffusion"),
            corrector=get_corrector("conditional_langevin"),
            snr=HP["snr"], p_steps=HP["sample_steps"], c_steps=1,
            probability_flow=False, continuous=True, denoise=True, eps=HP["eps"],
        )
        t0 = time.time()
        draws = []
        for d in range(HP["n_draws"]):
            torch.manual_seed(100 + d)
            with torch.no_grad():
                s, _ = sampler(model, to_nchw(y_te))
            draws.append(s.numpy().transpose(0, 2, 3, 1))
        sample_time = time.time() - t0
        return np.stack(draws), curve, train_time, sample_time
    finally:
        sys.path.pop(0)


def _shared_model_config(ml_collections):
    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(dict(continuous=True, sde="vesde"))
    c.data = ml_collections.ConfigDict(dict(
        effective_image_size=HP["image_size"], centered=False, num_channels=6,
        shape_x=[3, HP["image_size"], HP["image_size"]],
        shape_y=[3, HP["image_size"], HP["image_size"]],
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="ddpm_paired", nf=HP["nf"], ch_mult=HP["ch_mult"],
        num_res_blocks=HP["num_res_blocks"], attn_resolutions=HP["attn_resolutions"],
        dropout=HP["dropout"], resamp_with_conv=True, conditional=True,
        nonlinearity="swish", num_scales=HP["num_scales"],
        sigma_min_x=HP["sigma_min_x"], sigma_max_x=HP["sigma_max_x"],
        sigma_min_y=HP["sigma_min_y"], sigma_max_y=HP["sigma_max_y"],
        input_channels=6, output_channels=6, ema_rate=HP["ema_rate"],
    ))
    return c


# ---------------------------------------------------------------- jax side


def run_jax(train, ev, test, steps, log_every):
    import jax
    import jax.numpy as jnp
    import ml_collections

    from conditional_score_diffusion_tpu.models import init_model
    from conditional_score_diffusion_tpu.models.wrappers import (
        get_conditional_score_fn,
        get_score_fn,
    )
    from conditional_score_diffusion_tpu.sampling import get_pc_conditional_sampler
    from conditional_score_diffusion_tpu.sde import build_sde
    from conditional_score_diffusion_tpu.training.state import create_train_state
    from conditional_score_diffusion_tpu.training.steps import (
        make_eval_step,
        make_train_step,
    )

    c = _shared_model_config(ml_collections)
    c.training.conditioning_approach = "ours_NDV"
    c.training.lightning_module = "conditional"
    c.training.likelihood_weighting = True
    c.training.reduce_mean = True
    c.training.batch_size = HP["batch_size"]
    c.optim = ml_collections.ConfigDict(dict(
        lr=HP["lr"], warmup=HP["warmup"], grad_clip=HP["grad_clip"],
        beta1=0.9, eps=1e-8, weight_decay=0.0, optimizer="Adam",
    ))

    module, params = init_model(c, jax.random.key(0))
    state = create_train_state(c, params)
    train_step = jax.jit(make_train_step(c, module)[0])
    eval_step = jax.jit(make_eval_step(c, module, use_ema=False))
    sde, eps = build_sde(c)

    x_tr, y_tr = train
    ev_batch = {"x": jnp.asarray(ev[0]), "y": jnp.asarray(ev[1])}
    n = len(x_tr)
    rng = np.random.default_rng(1)
    key = jax.random.key(42)
    curve = []
    t_start = time.time()
    for step in range(1, steps + 1):
        idx = rng.integers(0, n, HP["batch_size"])
        batch = {"x": jnp.asarray(x_tr[idx]), "y": jnp.asarray(y_tr[idx])}
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if step % log_every == 0 or step == 1:
            el = float(eval_step(state, ev_batch, jax.random.key(4242 + step))["eval_loss"])
            curve.append((step, el))
            print(f"[jax]   step {step} eval_loss {el:.4f}", flush=True)
    train_time = time.time() - t_start

    x_te, y_te = test
    dict_score = get_score_fn(
        sde, module, state.ema.params, conditional=True, train=False, continuous=True
    )
    score_fn = get_conditional_score_fn(dict_score)
    sampler = get_pc_conditional_sampler(
        sde, (HP["n_test"], HP["image_size"], HP["image_size"], 3),
        "conditional_reverse_diffusion", "conditional_langevin",
        snr=HP["snr"], p_steps=HP["sample_steps"], c_steps=1, denoise=True, eps=HP["eps"],
    )
    fn = jax.jit(lambda r, y: sampler(r, score_fn, y)[0])
    t0 = time.time()
    draws = []
    for d in range(HP["n_draws"]):
        draws.append(np.asarray(fn(jax.random.key(100 + d), jnp.asarray(y_te))))
    sample_time = time.time() - t0
    return np.stack(draws), curve, train_time, sample_time


# ---------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="artifacts/head_to_head")
    args = ap.parse_args()
    steps = 30 if args.quick else args.steps
    log_every = 10 if args.quick else args.log_every

    import jax

    jax.config.update("jax_platforms", "cpu")

    train, ev, test = build_data()
    print(f"train {train[0].shape}, eval {ev[0].shape}, test {test[0].shape}", flush=True)

    # torch first (3x faster per step on this host), and flush partial
    # results after each framework so a crash/round-end keeps what finished.
    os.makedirs(args.out, exist_ok=True)
    partial_path = os.path.join(args.out, "cmde_results_partial.json")

    def _partial(name, r):
        rec = {
            "steps": steps,
            name: {
                "final_eval_loss": r[1][-1][1],
                "train_seconds": r[2],
                "sample_seconds": r[3],
                "metrics": _metrics(r[0], test[0]),
                "curve": r[1],
            },
        }
        prev = {}
        if os.path.exists(partial_path):
            with open(partial_path) as f:
                prev = json.load(f)
        prev.update(rec)
        with open(partial_path, "w") as f:
            json.dump(prev, f, indent=2)
        print(f"[partial] {name}: {rec[name]['metrics']}", flush=True)

    th = run_torch(train, ev, test, steps, log_every)
    _partial("torch", th)
    jx = run_jax(train, ev, test, steps, log_every)
    _partial("jax", jx)

    results = {
        "hyperparameters": {k: (list(v) if isinstance(v, tuple) else v) for k, v in HP.items()},
        "steps": steps,
        "jax": {
            "final_eval_loss": jx[1][-1][1],
            "train_seconds": jx[2],
            "sample_seconds": jx[3],
            "metrics": _metrics(jx[0], test[0]),
            "curve": jx[1],
        },
        "torch": {
            "final_eval_loss": th[1][-1][1],
            "train_seconds": th[2],
            "sample_seconds": th[3],
            "metrics": _metrics(th[0], test[0]),
            "curve": th[1],
        },
        "baseline_bicubic_y": _metrics(test[1][None], test[0]),
    }

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "cmde_results.json"), "w") as f:
        json.dump(results, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(*zip(*jx[1]), label="this framework (JAX/TPU-native)", lw=1.5)
    ax.plot(*zip(*th[1]), label="torch reference", lw=1.5)
    ax.set_xlabel("step"); ax.set_ylabel("eval loss (CMDE likelihood-weighted)")
    ax.set_title(f"texture32 4x-SR CMDE head-to-head ({steps} steps)")
    ax.legend(frameon=False); fig.tight_layout()
    fig.savefig(os.path.join(args.out, "cmde_loss_curves.png"), dpi=150)

    n_show = min(8, HP["n_test"])
    rows = [test[1][:n_show], np.clip(jx[0][0][:n_show], 0, 1),
            np.clip(th[0][0][:n_show], 0, 1), test[0][:n_show]]
    labels = ["y (4x degraded)", "this framework", "torch reference", "ground truth"]
    fig, axes = plt.subplots(len(rows), n_show, figsize=(n_show * 1.4, len(rows) * 1.5))
    for r, (row, lab) in enumerate(zip(rows, labels)):
        for i in range(n_show):
            axes[r, i].imshow(row[i]); axes[r, i].axis("off")
        axes[r, 0].set_ylabel(lab, rotation=90, fontsize=7)
        axes[r, 0].axis("on"); axes[r, 0].set_xticks([]); axes[r, 0].set_yticks([])
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "cmde_samples.png"), dpi=150)

    print(json.dumps({k: v for k, v in results.items() if k != "hyperparameters"}, indent=2))


if __name__ == "__main__":
    main()
