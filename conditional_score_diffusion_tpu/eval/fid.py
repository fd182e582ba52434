"""FID / Joint-FID math.

Reference: `evaluation.py:156-212` (target FID over x-vs-sample inception
activations; Joint FID over concat[act_y, act_x] vs concat[act_y,
act_sample]) and `lightning_callbacks/fid.py:34-200` (activations ->
mu/sigma -> Frechet distance).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import linalg


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of [N, D] activations."""
    acts = np.asarray(acts, dtype=np.float64)
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (reference `fid.py:140-178`)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def fid_from_activations(acts1: np.ndarray, acts2: np.ndarray) -> float:
    mu1, s1 = activation_statistics(acts1)
    mu2, s2 = activation_statistics(acts2)
    return frechet_distance(mu1, s1, mu2, s2)


def joint_fid_from_activations(
    acts_y: np.ndarray, acts_x: np.ndarray, acts_sample: np.ndarray
) -> float:
    """Joint FID: (y, x) vs (y, sample) with concatenated activations
    (reference `evaluation.py:190-212`)."""
    joint_real = np.concatenate([acts_y, acts_x], axis=1)
    joint_fake = np.concatenate([acts_y, acts_sample], axis=1)
    return fid_from_activations(joint_real, joint_fake)
