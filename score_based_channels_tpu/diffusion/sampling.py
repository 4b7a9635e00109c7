"""Annealed Langevin dynamics — posterior sampling for channel estimation.

The reference drives 2311 σ-levels × 3 inner steps from Python with a
host-device sync per step (test_score.py:135-171 — `.item()` at 137 and
`.cpu().numpy()` at 170). Here the whole schedule is ONE `jax.lax.scan`
over σ-levels with a statically unrolled inner loop, so the entire
6933-NFE trajectory compiles to a single XLA computation: no host syncs,
and the per-step NMSE trace (the paper's stopping-rule mechanism,
test_score.py:174-175) is carried device-side as scan outputs.

Update rule (test_score.py:143-165, Algorithm 1 of the paper):
  α_i      = α_step · (σ_i/σ_end)²
  x ← x + α_i·( s_θ(x, σ_i) − Aᴴ(Ax−y)/(noise/2 + σ_i²) ) + √(2·α_i·β)·z

All hyper-parameters (α_step, β, noise power) are PER-SAMPLE arrays, so a
hyper-parameter grid search or an SNR sweep is just a bigger batch — the
TPU-native replacement for the reference's sequential itertools.product
loops (tune_hparams_score.py:68-71, test_score.py:118).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..physics import complex_to_nhwc, crandn, nhwc_to_complex

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LangevinHParams:
    """Inference hyper-parameters (reference test_score.py:39-56)."""

    alpha_step: float = 3e-11
    beta_noise: float = 0.01
    steps_each: int = 3


def _bcast(v: Array, ndim: int) -> Array:
    """Broadcast a scalar/(B,) value against a (B, ...) tensor."""
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        return v
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def annealed_langevin_posterior(
    score_fn: Callable[[Array, Array], Array],
    A: Array,
    Y: Array,
    sigmas: Array,
    noise_power: Array,
    x_init: Array,
    key: Array,
    alpha_step: Array = 3e-11,
    beta_noise: Array = 0.01,
    steps_each: int = 3,
    oracle: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """Run the full annealed-Langevin posterior schedule in one scan.

    Args:
      score_fn: (x_nhwc (B,Nt,Nr,2), sigma ()) -> score (B,Nt,Nr,2); the
        network output is already divided by σ (ncsnv2.py:295-298).
      A: (B, Np, Nt) complex pilot operator P̄ᵀ.
      Y: (B, Np, Nr) complex measurements.
      sigmas: (L,) σ-schedule; sigmas[-1] is σ_end.
      noise_power: scalar or (B,) measurement noise power.
      x_init: (B, Nt, Nr) complex initialization (reference: unit complex
        Gaussian, test_score.py:115).
      alpha_step, beta_noise: scalar or (B,) — per-sample hyper-parameters.
      steps_each: inner steps per σ-level (static; unrolled inside the scan).
      oracle: optional (B, Nt, Nr) ground truth; when given, the per-step
        NMSE trace is returned as (L·steps_each, B), matching the
        reference's nmse_log axis order (test_score.py:168-171).

    Returns:
      (x_final, nmse_log or None)
    """
    sigma_end = sigmas[-1]
    Ah = jnp.conj(jnp.swapaxes(A, -1, -2))
    np_b = _bcast(noise_power, x_init.ndim)
    alpha_b = _bcast(alpha_step, x_init.ndim)
    beta_b = _bcast(beta_noise, x_init.ndim)

    track = oracle is not None
    if track:
        oracle_energy = jnp.sum(jnp.abs(oracle) ** 2, axis=(-1, -2))

    def level_step(carry, sigma):
        x, k = carry
        alpha = alpha_b * (sigma / sigma_end) ** 2
        denom = (np_b / 2.0 + sigma**2).astype(jnp.float32)
        nmses = []
        for _ in range(steps_each):
            k, k_noise = jax.random.split(k)
            score = nhwc_to_complex(score_fn(complex_to_nhwc(x), sigma))
            meas_grad = Ah @ (A @ x - Y)
            z = crandn(k_noise, x.shape)
            x = (
                x
                + (alpha * (score - meas_grad / denom)).astype(x.dtype)
                + (jnp.sqrt(2.0 * alpha * beta_b) * z).astype(x.dtype)
            )
            if track:
                err = jnp.sum(jnp.abs(x - oracle) ** 2, axis=(-1, -2))
                nmses.append((err / oracle_energy).astype(jnp.float32))
        ys = jnp.stack(nmses) if track else None
        return (x, k), ys

    (x_final, _), nmse_levels = jax.lax.scan(level_step, (x_init, key), sigmas)
    if track:
        L, S, B = nmse_levels.shape
        return x_final, nmse_levels.reshape(L * S, B)
    return x_final, None


def annealed_langevin_unconditional(
    score_fn: Callable[[Array, Array], Array],
    x_init: Array,
    sigmas: Array,
    key: Array,
    n_steps_each: int = 200,
    step_lr: float = 8e-6,
    denoise: bool = True,
) -> Array:
    """Unconditional annealed Langevin sampler (prior sampling).

    API-parity port of the canonical NCSNv2 sampler semantics
    (ncsnv2/models/__init__.py:20-56), operating on NHWC real arrays:
      step = step_lr·(σ_i/σ_end)²;  x ← x + step·s + √(2·step)·z
    with an optional final denoising step x ← x + σ_end²·s(x, σ_end)
    (models/__init__.py:47-51).
    """
    sigma_end = sigmas[-1]

    def level_step(carry, sigma):
        x0, k0 = carry
        step = step_lr * (sigma / sigma_end) ** 2

        def inner(_, carry):
            x, k = carry
            k, kz = jax.random.split(k)
            s = score_fn(x, sigma)
            z = jax.random.normal(kz, x.shape, x.dtype)
            return x + step * s + jnp.sqrt(2.0 * step) * z, k

        x, k = jax.lax.fori_loop(0, n_steps_each, inner, (x0, k0))
        return (x, k), None

    (x, _), _ = jax.lax.scan(level_step, (x_init, key), sigmas)
    if denoise:
        x = x + sigma_end**2 * score_fn(x, sigma_end)
    return x
