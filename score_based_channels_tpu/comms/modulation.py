"""QPSK modulation / soft demapping (reference testPackets.m QPSK path).

Gray-mapped QPSK: bits (b0, b1) → ((1−2·b0) + j(1−2·b1))/√2, in c2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# constellation table in c2, indexed by (b0, b1) as s = 2·b0 + b1
QPSK_POINTS = np.asarray(
    [[+1, +1], [+1, -1], [-1, +1], [-1, -1]], np.float32) / np.sqrt(2.0)
QPSK_BITS = np.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], np.uint8)


def qpsk_modulate(bits: Array) -> Array:
    """bits (..., 2·L) → symbols (..., L, 2) c2."""
    b = bits.reshape(bits.shape[:-1] + (-1, 2)).astype(jnp.float32)
    re = (1.0 - 2.0 * b[..., 0]) * np.float32(np.sqrt(0.5))
    im = (1.0 - 2.0 * b[..., 1]) * np.float32(np.sqrt(0.5))
    return jnp.stack([re, im], axis=-1)


def qpsk_demap_llr(y: Array, noise_var: Array, clip: float = 6.0) -> Array:
    """AWGN per-symbol LLRs for Gray QPSK (positive ⇒ bit 0).

    y (..., L, 2) c2, noise_var per-component σ² (scalar or broadcastable).
    LLR_b0 = 2√2·Re(y)/σ², LLR_b1 = 2√2·Im(y)/σ²; clipped to ±clip
    (testPackets.m:174-177 clips to ±6).
    """
    scale = 2.0 * np.sqrt(2.0) / jnp.asarray(noise_var, jnp.float32)
    llr = jnp.stack([y[..., 0] * scale, y[..., 1] * scale], axis=-1)
    llr = llr.reshape(llr.shape[:-2] + (-1,))
    return jnp.clip(llr, -clip, clip)
