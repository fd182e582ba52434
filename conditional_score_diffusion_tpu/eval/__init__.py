"""Evaluation subsystem.

Reference: `evaluation.py`, `lightning_callbacks/evaluation_tools.py`,
`lightning_callbacks/fid.py`, `models/inception.py` — LPIPS / PSNR / SSIM /
consistency / diversity / FID / Joint-FID.
"""

from .metrics import (
    get_consistency_fn,
    mean_psnr,
    mean_ssim,
    psnr,
    ssim,
    diversity,
)

__all__ = [
    "psnr",
    "mean_psnr",
    "ssim",
    "mean_ssim",
    "diversity",
    "get_consistency_fn",
]
