"""TPU-native compute ops.

Reference equivalents:
  * `op/upfirdn2d_kernel.cu` (+ `op/upfirdn2d.py` autograd wrapper) ->
    `upfirdn.py` (XLA dilated-conv formulation; separable fast path) and
    `upfirdn_pallas.py` (hand-written Pallas kernel for the hot shapes).
  * `op/fused_bias_act_kernel.cu` (+ `op/fused_act.py`) -> `fused_act.py`.
  * iunets' `InvertibleDownsampling2D(init='haar')` -> `haar.py` (fixed
    orthonormal Haar filter bank).
  * `bicubic_pytorch.py` / torchvision bicubic -> `resize.py`.
"""

from .upfirdn import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)
from .fused_act import fused_leaky_relu

__all__ = [
    "upfirdn2d",
    "setup_kernel",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
    "fused_leaky_relu",
]
