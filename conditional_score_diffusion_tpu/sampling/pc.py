"""Predictor-corrector samplers compiled to single `lax.scan` loops.

Reference:
  * unconditional PC sampler — `sampling/unconditional.py:161-228`
  * PC inpainter (mask projection each step) — `sampling/unconditional.py:230-345`
  * conditional PC sampler, fresh-perturbation and `use_path` (backward
    kernel) modes — `sampling/conditional.py:47-228`

The reference runs a Python loop of ``p_steps`` iterations, each a full
U-Net forward (SURVEY.md §3.2).  Here each sampler traces once and the loop
is a `jax.lax.scan` over the timestep grid, so the whole reverse process is
one XLA program — no per-step dispatch, fully fusible, pjit-shardable over
the batch.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..models.wrappers import get_conditional_score_fn, get_score_fn
from ..sde import batch_mul, is_multispeed
from .correctors import get_corrector
from .predictors import get_predictor


def _resolve(config, predictor, corrector, p_steps, c_steps, snr, denoise):
    """Apply the reference's 'default' -> config fallbacks
    (`sampling/unconditional.py:28-48`, `sampling/conditional.py:12-31`)."""
    if predictor == "default":
        predictor = config.sampling.predictor
    if corrector == "default":
        corrector = config.sampling.corrector
    if p_steps == "default":
        p_steps = config.model.num_scales
    if c_steps == "default":
        c_steps = config.sampling.n_steps_each
    if snr == "default":
        snr = config.sampling.snr
    if denoise == "default":
        denoise = config.sampling.noise_removal
    return predictor.lower(), corrector.lower(), p_steps, c_steps, snr, denoise


def get_pc_sampler(
    sde,
    shape: Sequence[int],
    predictor: str,
    corrector: str,
    snr: float,
    p_steps: int,
    c_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-3,
) -> Callable:
    """Unconditional PC sampler.

    Returns ``sampler(rng, score_fn, show_evolution=False) ->
    (samples, info)``; ``score_fn(x, t)`` is a true score function (see
    `models.wrappers.get_score_fn`).
    """
    predictor_fn = get_predictor(predictor)
    corrector_fn = get_corrector(corrector)

    def sampler(rng, score_fn, show_evolution: bool = False):
        rng, prior_rng = jax.random.split(rng)
        x = sde.prior_sampling(prior_rng, tuple(shape)).astype(jnp.float32)
        timesteps = jnp.linspace(sde.T, eps, p_steps)

        def body(carry, t):
            x, x_mean, rng = carry
            rng, rc, rp = jax.random.split(rng, 3)
            vec_t = jnp.full((shape[0],), t)
            x, x_mean = corrector_fn(
                rc, x, vec_t, sde=sde, score_fn=score_fn, snr=snr, n_steps=c_steps
            )
            x, x_mean = predictor_fn(
                rp, x, vec_t, sde=sde, score_fn=score_fn, probability_flow=probability_flow
            )
            return (x, x_mean, rng), (x if show_evolution else None)

        (x, x_mean, _), evo = jax.lax.scan(body, (x, x, rng), timesteps)
        samples = x_mean if denoise else x
        info = {"times": timesteps, "steps": p_steps * (c_steps + 1)}
        if show_evolution:
            info["evolution"] = evo
        return samples, info

    return sampler


def get_pc_conditional_sampler(
    sde,
    shape: Sequence[int],
    predictor: str,
    corrector: str,
    snr: float,
    p_steps: int,
    c_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    use_path: bool = False,
    eps: float = 1e-5,
) -> Callable:
    """Conditional PC sampler (CDE/CDiffE/CMDE/VS-CMDE inference).

    Returns ``sampler(rng, score_fn, y, show_evolution=False)`` where
    ``score_fn(x, y, t)`` is the conditional score of the target domain
    (see `models.wrappers.get_conditional_score_fn`).

    Two modes, matching `sampling/conditional.py:81-228`:
      * default: every predictor/corrector call re-perturbs clean ``y``
        through ``sde['y'].marginal_prob(y, t)`` with fresh noise;
      * ``use_path=True``: ``y_t`` follows one correlated forward path via
        the backward kernel ``p(y_t | y_0, y_{t+tau})``; the predictor draws
        ``y_t``, the corrector reuses it (predictor-first ordering).
    """
    predictor_fn = get_predictor(predictor)
    corrector_fn = get_corrector(corrector)
    multispeed = is_multispeed(sde)
    c_sde = sde["x"] if multispeed else sde
    y_sde = sde["y"] if multispeed else None

    def _perturb_y(rng, y, vec_t):
        mean, std = y_sde.marginal_prob(y, vec_t)
        return mean + batch_mul(std, jax.random.normal(rng, y.shape))

    def sampler(rng, score_fn, y, show_evolution: bool = False):
        B = y.shape[0]
        rng, prior_rng = jax.random.split(rng)
        x = c_sde.prior_sampling(prior_rng, tuple(shape)).astype(jnp.float32)
        timesteps = jnp.linspace(c_sde.T, eps, p_steps)

        corrector_kwargs = dict(sde=c_sde, score_fn=score_fn, snr=snr, n_steps=c_steps)
        predictor_kwargs = dict(
            sde=c_sde, score_fn=score_fn, probability_flow=probability_flow
        )

        if multispeed and use_path:
            tau = timesteps[0] - timesteps[1]
            rng, ry = jax.random.split(rng)
            vec_Ttau = jnp.full((B,), timesteps[0] + tau)
            y_tplustau = _perturb_y(ry, y, vec_Ttau)

            def body(carry, t):
                x, x_mean, y_tplustau, rng = carry
                rng, rk, rp, rc = jax.random.split(rng, 4)
                vec_t = jnp.full((B,), t)
                vec_tau = jnp.full((B,), tau)
                y_mean, y_std = y_sde.compute_backward_kernel(y, y_tplustau, vec_t, vec_tau)
                y_t = y_mean + batch_mul(y_std, jax.random.normal(rk, y.shape))
                x, x_mean = predictor_fn(rp, x, vec_t, y=y_t, **predictor_kwargs)
                x, x_mean = corrector_fn(rc, x, vec_t, y=y_t, **corrector_kwargs)
                out = {"x": x, "y": y_t} if show_evolution else None
                return (x, x_mean, y_t, rng), out

            (x, x_mean, _, _), evo = jax.lax.scan(body, (x, x, y_tplustau, rng), timesteps)
        elif multispeed:

            def body(carry, t):
                x, x_mean, rng = carry
                rng, ryc, rc, ryp, rp = jax.random.split(rng, 5)
                vec_t = jnp.full((B,), t)
                # Corrector with its own fresh y perturbation
                # (reference `conditional.py:104-110` — each update_fn call
                # draws new noise for y).
                y_c = _perturb_y(ryc, y, vec_t)
                x, x_mean = corrector_fn(rc, x, vec_t, y=y_c, **corrector_kwargs)
                # Predictor with another fresh perturbation.
                y_p = _perturb_y(ryp, y, vec_t)
                x, x_mean = predictor_fn(rp, x, vec_t, y=y_p, **predictor_kwargs)
                out = {"x": x, "y": y_p} if show_evolution else None
                return (x, x_mean, rng), out

            (x, x_mean, _), evo = jax.lax.scan(body, (x, x, rng), timesteps)
        else:
            # SR3 / single-SDE: clean y straight through
            # (reference `conditional.py:111-116`).
            def body(carry, t):
                x, x_mean, rng = carry
                rng, rc, rp = jax.random.split(rng, 3)
                vec_t = jnp.full((B,), t)
                x, x_mean = corrector_fn(rc, x, vec_t, y=y, **corrector_kwargs)
                x, x_mean = predictor_fn(rp, x, vec_t, y=y, **predictor_kwargs)
                out = {"x": x, "y": y} if show_evolution else None
                return (x, x_mean, rng), out

            (x, x_mean, _), evo = jax.lax.scan(body, (x, x, rng), timesteps)

        samples = x_mean if denoise else x
        info = {"times": timesteps, "steps": p_steps * (c_steps + 1)}
        if show_evolution:
            info["evolution"] = evo
        return samples, info

    return sampler


def get_pc_inpainter(
    sde,
    predictor: str,
    corrector: str,
    snr: float,
    n_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-5,
) -> Callable:
    """PC inpainter with per-step mask projection
    (reference `sampling/unconditional.py:230-345`).

    ``mask`` is 1 on known pixels.  Returns
    ``inpainter(rng, score_fn, data, mask) -> (samples, info)``.
    """
    predictor_fn = get_predictor(predictor)
    corrector_fn = get_corrector(corrector)

    def project(rng, x, data, mask, vec_t):
        masked_mean, std = sde.marginal_prob(data, vec_t)
        masked = masked_mean + batch_mul(std, jax.random.normal(rng, x.shape))
        x_proj = x * (1.0 - mask) + masked * mask
        x_mean_proj = x * (1.0 - mask) + masked_mean * mask
        return x_proj, x_mean_proj

    def inpainter(rng, score_fn, data, mask, show_evolution: bool = False):
        B = data.shape[0]
        rng, prior_rng = jax.random.split(rng)
        x = data * mask + sde.prior_sampling(prior_rng, data.shape) * (1.0 - mask)
        timesteps = jnp.linspace(sde.T, eps, sde.N)

        def body(carry, t):
            x, x_mean, rng = carry
            rng, rc, rmc, rp, rmp = jax.random.split(rng, 5)
            vec_t = jnp.full((B,), t)
            x, _ = corrector_fn(
                rc, x, vec_t, sde=sde, score_fn=score_fn, snr=snr, n_steps=n_steps
            )
            x, x_mean = project(rmc, x, data, mask, vec_t)
            x, _ = predictor_fn(
                rp, x, vec_t, sde=sde, score_fn=score_fn, probability_flow=probability_flow
            )
            x, x_mean = project(rmp, x, data, mask, vec_t)
            return (x, x_mean, rng), (x if show_evolution else None)

        (x, x_mean, _), evo = jax.lax.scan(body, (x, x, rng), timesteps)
        samples = x_mean if denoise else x
        info = {}
        if show_evolution:
            info["evolution"] = evo
        return samples, info

    return inpainter


# ---------------------------------------------------------------------------
# Config-driven builders (reference API surface)
# ---------------------------------------------------------------------------


def get_sampling_fn(
    config,
    sde,
    shape,
    eps,
    module,
    predictor="default",
    corrector="default",
    p_steps="default",
    c_steps="default",
    snr="default",
    denoise="default",
):
    """Unconditional sampling fn (reference `sampling/unconditional.py:13-75`).

    Returns ``fn(rng, params, show_evolution=False) -> (samples, info)``.
    """
    predictor, corrector, p_steps, c_steps, snr, denoise = _resolve(
        config, predictor, corrector, p_steps, c_steps, snr, denoise
    )
    method = config.sampling.method.lower()
    if method == "ode":
        from .ode import get_ode_sampler

        ode_sampler = get_ode_sampler(sde=sde, shape=shape, denoise=denoise, eps=eps)

        def ode_fn(rng, params, show_evolution: bool = False):
            score_fn = get_score_fn(
                sde, module, params, conditional=False, train=False,
                continuous=config.training.continuous,
            )
            return ode_sampler(rng, score_fn)

        return ode_fn
    if method != "pc":
        raise ValueError(f"Sampler name {config.sampling.method!r} unknown.")

    pc = get_pc_sampler(
        sde=sde,
        shape=shape,
        predictor=predictor,
        corrector=corrector,
        snr=snr,
        p_steps=p_steps,
        c_steps=c_steps,
        probability_flow=config.sampling.probability_flow,
        denoise=denoise,
        eps=eps,
    )

    def fn(rng, params, show_evolution: bool = False):
        score_fn = get_score_fn(
            sde, module, params, conditional=False, train=False,
            continuous=config.training.continuous,
        )
        return pc(rng, score_fn, show_evolution=show_evolution)

    return fn


def get_conditional_sampling_fn(
    config,
    sde,
    shape,
    eps,
    module,
    predictor="default",
    corrector="default",
    p_steps="default",
    c_steps="default",
    snr="default",
    denoise="default",
    use_path="default",
):
    """Conditional sampling fn (reference `sampling/conditional.py:8-45`).

    Returns ``fn(rng, params, y, show_evolution=False) -> (samples, info)``.
    """
    predictor, corrector, p_steps, c_steps, snr, denoise = _resolve(
        config, predictor, corrector, p_steps, c_steps, snr, denoise
    )
    if use_path == "default":
        use_path = False

    pc = get_pc_conditional_sampler(
        sde=sde,
        shape=shape,
        predictor=predictor,
        corrector=corrector,
        snr=snr,
        p_steps=p_steps,
        c_steps=c_steps,
        probability_flow=config.sampling.probability_flow,
        denoise=denoise,
        use_path=use_path,
        eps=eps,
    )

    def fn(rng, params, y, show_evolution: bool = False):
        raw_score_fn = get_score_fn(
            sde, module, params, conditional=True, train=False,
            continuous=config.training.continuous,
        )
        score_fn = get_conditional_score_fn(raw_score_fn, target_domain="x")
        return pc(rng, score_fn, y, show_evolution=show_evolution)

    return fn


def get_inpainting_fn(config, sde, eps, module, n_steps_each: int = 1):
    """Inpainting fn (reference `sampling/unconditional.py:78-91`)."""
    inpainter = get_pc_inpainter(
        sde=sde,
        predictor=config.sampling.predictor.lower(),
        corrector=config.sampling.corrector.lower(),
        snr=config.sampling.snr,
        n_steps=n_steps_each,
        probability_flow=config.sampling.probability_flow,
        denoise=config.sampling.noise_removal,
        eps=eps,
    )

    def fn(rng, params, data, mask, show_evolution: bool = False):
        score_fn = get_score_fn(
            sde, module, params, conditional=False, train=False,
            continuous=config.training.continuous,
        )
        return inpainter(rng, score_fn, data, mask, show_evolution=show_evolution)

    return fn
