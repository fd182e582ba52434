"""Exactly-invertible orthonormal Haar wavelet transform (NHWC).

Reference: iunets `InvertibleDownsampling2D(3, stride=2, method='cayley',
init='haar', learnable=False)` used throughout the reference
(`lightning_modules/ConditionalSdeGenerativeModel.py:205`,
`models/ddpm.py:219`, `lightning_data_modules/SRFLOWDataset.py:186`) plus
the band `permute_channels` convention (`models/ddpm.py:54-78`).

Since `init='haar', learnable=False` is just the fixed orthonormal Haar
filter bank, it is implemented here directly as a space-to-depth + 4x4
orthonormal matrix multiply — no Cayley machinery needed (SURVEY.md §7.1).
Exact round-trip inversion is guaranteed by orthonormality (H @ H.T = I)
and unit-tested.

Band convention: ``haar_forward`` returns *channel-major* coefficients
(4 sub-bands per input channel, like iunets) with band order chosen so that
the reference's ``permute_channels`` (which swaps bands 0 and 1 while going
channel-major -> band-major) puts the approximation (DC) band first:
internal band order = [detail_LH, approx_LL, detail_HL, detail_HH].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Rows: output bands [d_LH, a_LL, d_HL, d_HH]; columns: 2x2 patch
# [tl, tr, bl, br].  Orthonormal: H @ H.T == I.
_H = (
    np.array(
        [
            [1, -1, 1, -1],  # LH  (horizontal detail)
            [1, 1, 1, 1],    # LL  (approximation)
            [1, 1, -1, -1],  # HL  (vertical detail)
            [1, -1, -1, 1],  # HH  (diagonal detail)
        ],
        dtype=np.float32,
    )
    / 2.0
)


def haar_forward_2d(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> [B,H/2,W/2,4C] channel-major Haar coefficients.

    Output channel layout: for input channel c, channels [4c..4c+3] hold the
    bands in the internal order above (matching iunets' grouped-per-channel
    layout that `permute_channels` expects).
    """
    B, H, W, C = x.shape
    p = x.reshape(B, H // 2, 2, W // 2, 2, C)
    # patch vector [tl, tr, bl, br] per (h', w', c)
    patch = jnp.stack(
        [p[:, :, 0, :, 0, :], p[:, :, 0, :, 1, :], p[:, :, 1, :, 0, :], p[:, :, 1, :, 1, :]],
        axis=-1,
    )  # [B, H/2, W/2, C, 4]
    coeff = jnp.einsum(
        "bhwcp,kp->bhwck", patch, jnp.asarray(_H), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return coeff.reshape(B, H // 2, W // 2, 4 * C)


def haar_inverse_2d(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`haar_forward_2d`."""
    B, Hh, Wh, C4 = z.shape
    C = C4 // 4
    coeff = z.reshape(B, Hh, Wh, C, 4)
    patch = jnp.einsum(
        "bhwck,kp->bhwcp", coeff, jnp.asarray(_H), preferred_element_type=jnp.float32
    ).astype(z.dtype)
    p = jnp.stack(
        [
            jnp.stack([patch[..., 0], patch[..., 1]], axis=-1),
            jnp.stack([patch[..., 2], patch[..., 3]], axis=-1),
        ],
        axis=-2,
    )  # [B, Hh, Wh, C, 2(row), 2(col)]
    p = p.transpose(0, 1, 4, 2, 5, 3)  # B, Hh, 2, Wh, 2, C
    return p.reshape(B, Hh * 2, Wh * 2, C)


def permute_channels(z: jnp.ndarray, forward: bool = True) -> jnp.ndarray:
    """Channel-major <-> band-major with the reference's band-0/1 swap
    (`models/ddpm.py:54-78`).  z: [..., 4C] with C=channels per band."""
    C4 = z.shape[-1]
    C = C4 // 4
    k_of_i = {0: 1, 1: 0, 2: 2, 3: 3}
    perm = np.zeros(C4, dtype=np.int64)
    if forward:
        # band-major out[3k+j] = channel-major in[4j+i]
        for i in range(4):
            k = k_of_i[i]
            for j in range(C):
                perm[C * k + j] = 4 * j + i
    else:
        for i in range(4):
            k = k_of_i[i]
            for j in range(C):
                perm[4 * j + k] = C * i + j
    return z[..., perm]


def haar_forward(x: jnp.ndarray) -> jnp.ndarray:
    """Band-major Haar: [approx(C) | details(3C)]
    (reference `DDPM_multi_speed_haar.haar_forward`, `models/ddpm.py:222-225`)."""
    return permute_channels(haar_forward_2d(x), forward=True)


def haar_backward(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`haar_forward` (`models/ddpm.py:227-230`)."""
    return haar_inverse_2d(permute_channels(z, forward=False))


def get_dc_coefficients(x: jnp.ndarray) -> jnp.ndarray:
    """Approximation band (`models/ddpm.py:232-233`)."""
    C = x.shape[-1]
    return haar_forward(x)[..., :C]


def get_hf_coefficients(x: jnp.ndarray) -> jnp.ndarray:
    """Detail bands (`models/ddpm.py:235-236`)."""
    C = x.shape[-1]
    return haar_forward(x)[..., C:]


def multi_level_haar_forward(x: jnp.ndarray, level: int):
    """Repeated DC decomposition (reference `SRFLOWDataset.py:223-228`).

    Returns (approx, detail_at_last_level)."""
    approx = x
    detail = None
    C = x.shape[-1]
    for _ in range(int(level)):
        z = haar_forward(approx)
        approx, detail = z[..., :C], z[..., C:]
    return approx, detail
