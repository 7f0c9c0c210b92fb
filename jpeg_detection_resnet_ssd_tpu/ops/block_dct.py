"""8x8 block DCT/IDCT as MXU-friendly einsums.

The JPEG forward/inverse DCT (ITU-T T.81 Annex A) over (..., 64) natural-order
coefficient blocks.  Formulated as two 8x8 matmuls per block — batched over
all blocks these map straight onto the TPU MXU, so a full-image IDCT is a
single fused einsum rather than the reference's per-image C++ loop.

Used for device-side reconstruction (hybrid pixel/DCT pipelines) and as the
parity oracle for the DCT-domain augmentation ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _basis() -> np.ndarray:
    """basis[u, x] = C(u)/2 * cos((2x+1) u pi / 16) — orthonormal rows."""
    x = np.arange(8)
    u = np.arange(8)
    b = 0.5 * np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    b[0, :] *= 1 / np.sqrt(2)
    return b.astype(np.float32)


DCT_BASIS_8 = _basis()


def idct2_8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) natural-order DCT coefficients -> (..., 8, 8) pixel residuals
    (add 128 for unsigned-pixel level shift)."""
    B = jnp.asarray(DCT_BASIS_8)
    F = jnp.asarray(blocks, jnp.float32).reshape(blocks.shape[:-1] + (8, 8))
    return jnp.einsum("ux,...uv,vy->...xy", B, F, B)


def dct2_8x8(pixels: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) level-shifted pixels -> (..., 64) natural-order DCT."""
    B = jnp.asarray(DCT_BASIS_8)
    f = jnp.asarray(pixels, jnp.float32)
    F = jnp.einsum("ux,...xy,vy->...uv", B, f, B)
    return F.reshape(F.shape[:-2] + (64,))
