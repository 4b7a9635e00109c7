"""MIMO soft demapping: exact-ML LLRs by full constellation enumeration.

Reference ComputeLLRMIMO.m ('ml' mode, :116-248): for y = H_eff·s + n with
s ∈ QPSK^{Ns}, enumerate all 4^{Ns} candidate vectors and compute per-bit
LLRs. TPU redesign: the candidate set is a constant (256 × Ns) table for
Ns=4; distances for ALL candidates × symbols × batch are one matmul-shaped
reduction; exact LLRs via logsumexp over the bit-partitioned hypothesis
sets (max-log option for parity with suboptimal receivers).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from .modulation import QPSK_BITS, QPSK_POINTS

Array = jax.Array


def _candidate_table(n_streams: int) -> Tuple[np.ndarray, np.ndarray]:
    """All QPSK^Ns vectors → (syms (M, Ns, 2) c2, bits (M, 2·Ns))."""
    M = 4**n_streams
    idx = np.stack(np.meshgrid(*([np.arange(4)] * n_streams),
                               indexing="ij"), -1).reshape(M, n_streams)
    syms = QPSK_POINTS[idx]  # (M, Ns, 2)
    bits = QPSK_BITS[idx].reshape(M, 2 * n_streams)
    return syms.astype(np.float32), bits


@partial(jax.jit, static_argnames=("n_streams", "max_log"))
def mimo_ml_llr(
    Y: Array,  # (B, L, Nr, 2) received symbols (L = symbol slots)
    H_eff: Array,  # (B, Nr, Ns, 2) effective channel (may be an estimate)
    noise_var: Array,  # per-component σ², scalar or (B,)
    n_streams: int = 4,
    max_log: bool = False,
    clip: float = 6.0,
) -> Array:
    """Per-bit LLRs (B, L, 2·Ns), positive ⇒ bit 0 (testPackets LLR clip ±6)."""
    syms, bits = _candidate_table(n_streams)
    syms = jnp.asarray(syms)  # (M, Ns, 2)
    bits = jnp.asarray(bits)  # (M, 2Ns)
    M = syms.shape[0]

    # candidate received points: H_eff (B,Nr,Ns,2) @ symsᵀ (Ns,M,2)
    # → (B, Nr, M, 2); ONE c2 matmul covers all 4^Ns hypotheses (MXU work)
    cand = cplx.matmul(H_eff, cplx.transpose(syms))  # (B, Nr, M, 2)
    cand = jnp.moveaxis(cand, 2, 1)  # (B, M, Nr, 2)
    nv = jnp.asarray(noise_var, jnp.float32)
    if nv.ndim:  # (B,) → (B, 1, 1) against metric (B, L, M)
        nv = nv.reshape(nv.shape + (1,) * (3 - nv.ndim))
    # distances: ‖y − c‖² over Nr for every (batch, slot, candidate)
    diff = Y[:, :, None, :, :] - cand[:, None]  # (B, L, M, Nr, 2)
    d2 = jnp.sum(cplx.abs2(diff), axis=-1)  # (B, L, M)
    metric = -d2 / (2.0 * nv)  # exact likelihood exponent (σ² per component)

    bit0_mask = (bits == 0).astype(jnp.float32)  # (M, 2Ns)
    neg_inf = jnp.float32(-1e30)

    def llr_for_bit(mask_col):
        m0 = jnp.where(mask_col > 0, 0.0, neg_inf)
        m1 = jnp.where(mask_col > 0, neg_inf, 0.0)
        if max_log:
            l0 = jnp.max(metric + m0, axis=-1)
            l1 = jnp.max(metric + m1, axis=-1)
        else:
            l0 = jax.scipy.special.logsumexp(metric + m0, axis=-1)
            l1 = jax.scipy.special.logsumexp(metric + m1, axis=-1)
        return l0 - l1

    llr = jax.vmap(llr_for_bit, in_axes=1, out_axes=-1)(bit0_mask)
    return jnp.clip(llr, -clip, clip)  # (B, L, 2Ns)
