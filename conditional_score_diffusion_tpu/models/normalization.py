"""Normalization zoo for the NCSN lineage (Flax, NHWC).

Reference: `models/normalization.py:22-215` — get_normalization dispatcher,
Conditional{Batch,Instance,Variance,None}Norm2d, InstanceNorm2dPlus
(+conditional).  Conditional variants embed integer noise-level classes.
"""

from __future__ import annotations

import functools
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

_scale_init = jax.nn.initializers.normal(stddev=0.02)


def _scale_one_init(key, shape, dtype=jnp.float32):
    return 1.0 + _scale_init(key, shape, dtype)


def _instance_norm(x, eps=1e-5):
    """Per-sample per-channel spatial normalization (no affine)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class InstanceNorm2d(nn.Module):
    """torch nn.InstanceNorm2d(affine=False) equivalent."""

    features: int

    @nn.compact
    def __call__(self, x):
        return _instance_norm(x)


class InstanceNorm2dPlus(nn.Module):
    """Reference `normalization.py:157-186`: instance norm + re-injected
    channel-mean statistics (alpha) + affine (gamma, beta)."""

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", _scale_one_init, (self.features,))
        gamma = self.param("gamma", _scale_one_init, (self.features,))
        means = jnp.mean(x, axis=(1, 2))  # [B, C]
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)  # torch.var is unbiased
        means = (means - m) / jnp.sqrt(v + 1e-5)
        h = _instance_norm(x)
        h = h + means[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", jax.nn.initializers.zeros, (self.features,))
            out = out + beta
        return out


class VarianceNorm2d(nn.Module):
    """Reference `normalization.py:112-124`: variance-only normalization."""

    features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", _scale_one_init, (self.features,))
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        return alpha * h


class NoneNorm2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return x


def _embed(num_classes: int, width: int, init, name: str):
    return nn.Embed(num_classes, width, embedding_init=init, name=name)


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Reference `normalization.py:188-215`."""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)  # torch.var is unbiased
        means = (means - m) / jnp.sqrt(v + 1e-5)
        h = _instance_norm(x)
        if self.bias:
            emb = _embed(self.num_classes, 3 * self.features, _scale_one_init, "embed")(y)
            gamma, alpha, beta = jnp.split(emb, 3, axis=-1)
            # the stored embedding init is N(1, .02) for scales and should be
            # 0 for biases; subtract the 1-offset from the bias chunk
            beta = beta - 1.0
            h = h + means[:, None, None, :] * alpha[:, None, None, :]
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        emb = _embed(self.num_classes, 2 * self.features, _scale_one_init, "embed")(y)
        gamma, alpha = jnp.split(emb, 2, axis=-1)
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h


class ConditionalInstanceNorm2d(nn.Module):
    """Reference `normalization.py:69-93`."""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        h = _instance_norm(x)
        if self.bias:
            emb = _embed(self.num_classes, 2 * self.features, _scale_one_init, "embed")(y)
            gamma, beta = jnp.split(emb, 2, axis=-1)
            beta = beta - 1.0
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma = _embed(self.num_classes, self.features, _scale_one_init, "embed")(y)
        return gamma[:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
    """Reference `normalization.py:96-110`."""

    features: int
    num_classes: int
    bias: bool = False

    @nn.compact
    def __call__(self, x, y):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        gamma = _embed(self.num_classes, self.features, _scale_one_init, "embed")(y)
        return gamma[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """Reference `normalization.py:126-147`."""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        if self.bias:
            emb = _embed(self.num_classes, 2 * self.features, _scale_one_init, "embed")(y)
            gamma, beta = jnp.split(emb, 2, axis=-1)
            beta = beta - 1.0
            return gamma[:, None, None, :] * x + beta[:, None, None, :]
        gamma = _embed(self.num_classes, self.features, _scale_one_init, "embed")(y)
        return gamma[:, None, None, :] * x


class ConditionalBatchNorm2d(nn.Module):
    """Reference `normalization.py:43-66`.  Batch statistics are computed on
    the fly (the reference's BN is train-mode with momentum-tracked stats;
    score-matching never runs it in eval mode on the live paths)."""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        if self.bias:
            emb = _embed(self.num_classes, 2 * self.features, _scale_one_init, "embed")(y)
            gamma, beta = jnp.split(emb, 2, axis=-1)
            beta = beta - 1.0
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma = _embed(self.num_classes, self.features, _scale_one_init, "embed")(y)
        return gamma[:, None, None, :] * h


def get_normalization(config, conditional: bool = False) -> Callable:
    """Reference `normalization.py:22-40`."""
    norm = config.model.normalization
    if conditional:
        if norm == "InstanceNorm++":
            return functools.partial(
                ConditionalInstanceNorm2dPlus, num_classes=config.model.num_classes
            )
        raise NotImplementedError(f"{norm} not implemented yet.")
    if norm == "InstanceNorm":
        return InstanceNorm2d
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        from .layers import legacy_group_norm

        return lambda features: legacy_group_norm(features)
    raise ValueError(f"Unknown normalization: {norm}")
