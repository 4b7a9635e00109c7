"""Real-pair complex algebra ("c2" format) — the TPU-native number system.

The TPU has no complex arithmetic: the MXU/VPU operate on real matrices,
and this image's TPU backend rejects complex64 outright (UNIMPLEMENTED even
for array creation). The idiomatic TPU representation of C^{...} is a real
array with a trailing axis of size 2 (Re, Im) — exactly the layout the
score network consumes — and complex products expressed as real matmuls
that XLA tiles onto the MXU.

Conventions:
  c2 array  = float32 array of shape (..., 2)
  matrices  = (..., M, N, 2); matmul contracts the last two matrix dims.

Complex semantics implemented against the reference's math
(test_score.py:122-165): products, conjugate transpose, unit-power complex
Gaussians (E|z|² = 1), squared magnitudes.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# -----------------------------------------------------------------------------
# conversions (host-side; complex dtypes never touch the TPU)
# -----------------------------------------------------------------------------


def from_complex(x) -> Array:
    """complex (host or CPU-backend) array → c2 float32."""
    x = np.asarray(x)
    return jnp.asarray(np.stack([x.real, x.imag], axis=-1), jnp.float32)


def to_complex(x) -> np.ndarray:
    """c2 → host complex64 ndarray."""
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


# -----------------------------------------------------------------------------
# algebra
# -----------------------------------------------------------------------------


def matmul(a: Array, b: Array, precision=None) -> Array:
    """(..., M, K, 2) @ (..., K, N, 2) → (..., M, N, 2).

    Four real matmuls (Gauss/Karatsuba trades one multiply for adds and
    hurts MXU utilization at these sizes; XLA fuses the adds).
    """
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    mm = lambda x, y: jnp.matmul(x, y, precision=precision)
    return jnp.stack([mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)],
                     axis=-1)


def conj(a: Array) -> Array:
    return a * jnp.asarray([1.0, -1.0], a.dtype)


def conj_transpose(a: Array) -> Array:
    """Hermitian transpose of (..., M, N, 2) → (..., N, M, 2)."""
    return conj(jnp.swapaxes(a, -2, -3))


def transpose(a: Array) -> Array:
    return jnp.swapaxes(a, -2, -3)


def abs2(a: Array) -> Array:
    """|z|² elementwise: (..., 2) → (...)."""
    return a[..., 0] ** 2 + a[..., 1] ** 2


def sum_abs2(a: Array, axis) -> Array:
    return jnp.sum(abs2(a), axis=axis)


def scale(a: Array, s: Array) -> Array:
    """Multiply by a REAL scalar/array broadcast over the complex axis."""
    return a * jnp.asarray(s, a.dtype)[..., None]


def mul(a: Array, b: Array) -> Array:
    """Elementwise complex multiply of c2 arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def randn(key: Array, shape: Sequence[int]) -> Array:
    """Unit-power circular complex Gaussian in c2: E|z|² = 1.

    Matches reference `torch.randn_like(<complex>)` semantics
    (test_score.py:120-124): each component has variance 1/2.
    """
    return (jax.random.normal(key, tuple(shape) + (2,), jnp.float32)
            * np.float32(np.sqrt(0.5)))


def qpsk_pilots(key: Array, batch: int, num_tx: int, num_pilots: int) -> Array:
    """Per-sample QPSK pilots in c2: entries (±1±j)/√2 (loaders.py:52-55).

    Returns (batch, num_tx, num_pilots, 2) float32 — no complex dtype.
    """
    bits = jax.random.bernoulli(key, 0.5, (batch, num_tx, num_pilots, 2))
    return ((2.0 * bits.astype(jnp.float32) - 1.0)
            * np.float32(np.sqrt(0.5)))


def nmse(estimate: Array, oracle: Array) -> Array:
    """Per-sample NMSE over the trailing (matrix, complex) dims.

    estimate/oracle: (..., M, N, 2) → (...) float32 (test_score.py:168-171).
    """
    err = sum_abs2(estimate - oracle, axis=(-1, -2))
    ref = sum_abs2(oracle, axis=(-1, -2))
    return err / ref
