"""Score-function wrappers: raw network output -> true time-dependent score.

Reference: `models/utils.py:50-287` (`get_model_fn`, `get_score_fn`,
`divide_by_sigmas`, `get_conditional_score_fn`).  The reference dispatches on
``isinstance(sde, dict)`` / SDE class; here the same conventions are kept but
organized as pure functions of ``(params, inputs, t)`` so everything traces
under jit:

* VE-family (continuous): the model is fed ``labels = t * (N - 1)``
  (conditional path, `models/utils.py:174-186`) or the noise sigma itself /
  ``log(sigma)`` for fourier embeddings (unconditional path,
  `models/utils.py:247-253`); the output is divided by the marginal std.
* VP-family (continuous): ``labels = t * (N - 1)``; divide by marginal std.
* Discrete: labels are rounded integer indices; divide by
  ``discrete_sigmas[labels]``.
* Multi-speed dict SDEs: the model consumes/returns dicts; each domain's
  output is divided by that domain's std (`models/utils.py:67-70`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..sde import VESDE, VPSDE, batch_mul, is_multispeed, subVPSDE


def get_model_fn(
    module,
    params,
    train: bool = False,
    rngs: Optional[dict] = None,
    compute_dtype: Optional[Any] = None,
) -> Callable:
    """Raw apply function ``model_fn(inputs, labels)`` (reference `models/utils.py:123-152`).

    ``inputs`` may be an array or a dict of arrays for paired models.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): cast params + inputs so every
    conv/matmul runs on the MXU in low precision (XLA accumulates conv
    matmuls in f32; the spatial attention einsums force f32 accumulation
    explicitly).  Output is cast back to f32 — the score division and all
    sampler math stay full precision.
    """
    if compute_dtype is not None:
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    def model_fn(inputs, labels):
        if compute_dtype is not None:
            inputs = jax.tree.map(lambda x: x.astype(compute_dtype), inputs)
        variables = {"params": params}
        out = module.apply(variables, inputs, labels, train=train, rngs=rngs if train else None)
        if compute_dtype is not None:
            out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        return out

    return model_fn


def _divide_by_std_continuous(h, t, sde):
    """Continuous-time `divide_by_sigmas` (reference `models/utils.py:66-73`)."""
    if is_multispeed(sde) and isinstance(h, dict):
        out = {}
        for domain in h:
            std = sde[domain].marginal_prob(jnp.zeros_like(h[domain]), t)[1]
            out[domain] = batch_mul(1.0 / std, h[domain])
        return out
    std = sde.marginal_prob(jnp.zeros_like(h), t)[1]
    return batch_mul(1.0 / std, h)


def _divide_by_std_discrete(h, labels, sde):
    """Discrete-label `divide_by_sigmas` (reference `models/utils.py:58-65`)."""
    if is_multispeed(sde) and isinstance(h, dict):
        out = {}
        for domain in h:
            sigmas = sde[domain].discrete_sigmas[labels]
            out[domain] = batch_mul(1.0 / sigmas, h[domain])
        return out
    sigmas = sde.discrete_sigmas[labels]
    return batch_mul(1.0 / sigmas, h)


def get_score_fn(
    sde,
    module,
    params,
    conditional: bool = False,
    train: bool = False,
    continuous: bool = False,
    rngs: Optional[dict] = None,
    compute_dtype: Optional[Any] = None,
) -> Callable:
    """Return ``score_fn(inputs, t)`` matching reference `models/utils.py:156-267`.

    ``inputs`` is an array (unconditional / single-domain) or a dict
    ``{'x': ..., 'y': ...}`` (conditional paired models).  ``t`` is a
    per-batch time vector in ``[0, T]``.
    """
    model_fn = get_model_fn(module, params, train=train, rngs=rngs, compute_dtype=compute_dtype)

    if conditional:
        if is_multispeed(sde):
            N = sde["x"].N

            def score_fn(inputs, t):
                if continuous:
                    labels = t * (N - 1)
                    h = model_fn(inputs, labels)
                    return _divide_by_std_continuous(h, t, sde)
                labels = jnp.round(t * (N - 1)).astype(jnp.int32)
                h = model_fn(inputs, labels)
                return _divide_by_std_discrete(h, labels, sde)

            return score_fn

        if isinstance(sde, (VPSDE, subVPSDE)):
            # SR3/CDE with a VP SDE (reference `models/utils.py:191-208`).
            def score_fn(inputs, t):
                labels = t * (sde.N - 1)
                h = model_fn(inputs, labels)
                if continuous:
                    std = sde.marginal_prob(jnp.zeros_like(h), t)[1]
                else:
                    std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
                return batch_mul(1.0 / std, h)

            return score_fn

        if isinstance(sde, VESDE):
            # SR3/CDE with a VE SDE (reference `models/utils.py:210-221`).
            def score_fn(inputs, t):
                if continuous:
                    labels = t * (sde.N - 1)
                    h = model_fn(inputs, labels)
                    return _divide_by_std_continuous(h, t, sde)
                labels = jnp.round(t * (sde.N - 1)).astype(jnp.int32)
                h = model_fn(inputs, labels)
                return _divide_by_std_discrete(h, labels, sde)

            return score_fn

        raise NotImplementedError(f"SDE {type(sde).__name__} not supported for conditional score.")

    # Unconditional (reference `models/utils.py:225-265`).
    if isinstance(sde, (VPSDE, subVPSDE)):

        def score_fn(x, t):
            if continuous or isinstance(sde, subVPSDE):
                labels = t * (sde.N - 1)
                h = model_fn(x, labels)
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = t * (sde.N - 1)
                h = model_fn(x, labels)
                std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
            return batch_mul(1.0 / std, h)

        return score_fn

    if isinstance(sde, VESDE):
        embedding_type = getattr(module, "embedding_type", "positional")

        def score_fn(x, t):
            if continuous:
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
                # Fourier-embedding VE models condition on log(sigma)
                # (reference `models/utils.py:250-253`).
                time_cond = jnp.log(std) if embedding_type == "fourier" else std
                h = model_fn(x, time_cond)
                return batch_mul(1.0 / std, h)
            labels = jnp.round(t * (sde.N - 1)).astype(jnp.int32)
            sigma_labels = sde.discrete_sigmas[labels]
            h = model_fn(x, sigma_labels)
            return batch_mul(1.0 / sigma_labels, h)

        return score_fn

    raise NotImplementedError(f"SDE {type(sde).__name__} not supported.")


def get_conditional_score_fn(score_fn: Callable, target_domain: str = "x") -> Callable:
    """Project a dict score onto one domain (reference `models/utils.py:270-278`)."""

    def conditional_score_fn(x, y, t):
        score = score_fn({"x": x, "y": y}, t)
        if isinstance(score, dict):
            return score[target_domain]
        return score

    return conditional_score_fn
