"""Annealed Langevin dynamics — posterior sampling for channel estimation.

The reference drives 2311 σ-levels × 3 inner steps from Python with a
host-device sync per step (test_score.py:135-171 — `.item()` at 137 and
`.cpu().numpy()` at 170). Here the whole schedule is ONE `jax.lax.scan`
over σ-levels with a statically unrolled inner loop, so the entire
6933-NFE trajectory compiles to a single XLA computation: no host syncs,
and the per-step NMSE trace (the paper's stopping-rule mechanism,
test_score.py:174-175) is carried device-side as scan outputs.

TPU-native number system: all state is c2 (real/imag pairs, see cplx.py)
— the TPU has no complex arithmetic, and c2 is also exactly the score
network's input layout, so the state feeds the network with zero
conversions. A complex64 convenience wrapper is provided for CPU use.

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
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import cplx

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


def annealed_langevin_posterior_c2(
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
    capture_level: Optional[Array] = None,
    coef_cap: Optional[Array] = None,
    start_level: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """Run the full annealed-Langevin posterior schedule in one scan (c2).

    Args:
      score_fn: (x (B,Nt,Nr,2), sigma ()) -> score (B,Nt,Nr,2); the network
        output is already divided by σ (ncsnv2.py:295-298). The c2 state IS
        the network's NHWC input.
      A: (B, Np, Nt, 2) pilot operator P̄ᵀ in c2.
      Y: (B, Np, Nr, 2) measurements in c2.
      sigmas: (L,) σ-schedule; sigmas[-1] is σ_end.
      noise_power: scalar or (B,) measurement noise power (real).
      x_init: (B, Nt, Nr, 2) initialization (reference: unit complex
        Gaussian, test_score.py:115).
      alpha_step, beta_noise: scalar or (B,) per-sample hyper-parameters.
      steps_each: inner steps per σ-level (static; unrolled in the scan body).
      oracle: optional (B, Nt, Nr, 2) ground truth; when given, the
        per-step NMSE trace is returned as (L·steps_each, B) matching the
        reference's nmse_log layout (test_score.py:168-171).
      capture_level: optional (B,) int32 per-sample σ-level index at which
        to snapshot the iterate (tuned early stopping without re-running a
        truncated schedule); the snapshot is taken after that level's last
        inner step and returned instead of x at the final level.
      coef_cap: optional scalar or (B,) cap on the data-consistency
        coefficient α_i/(noise/2+σ_i²). The reference rule (None) lets the
        coefficient grow as σ_i → σ_end, which at Langevin temperature
        (β=1) crosses the 2/λ_max(AᴴA) stability bound of the data term;
        capping at 0.5/λ_max keeps β=1 chains stable (round-3 diagnosis,
        RESULTS.md "posterior-sampling characterization"). No effect on
        the reference protocol where α_step ≈ 3e-11 keeps the coefficient
        far below any reasonable cap.
      start_level: optional (B,) int32 — per-sample first ACTIVE σ-level;
        before it the sample holds its initialization (all update terms
        gated off). Lets warm-started samples (init at the LMMSE
        estimate, effective schedule σ ≤ σ[start]) and full-anneal
        samples (start 0) share one compiled scan — the mechanism behind
        the residual-gated auto protocol (eval/estimate.py init="auto").

    Returns:
      (x_final (B,Nt,Nr,2) — or the per-sample captured iterate when
       capture_level is given — , nmse_log or None)
    """
    sigma_end = sigmas[-1]
    Ah = cplx.conj_transpose(A)
    mat_ndim = x_init.ndim - 1  # broadcast rank for real per-sample scalars
    np_b = _bcast(noise_power, mat_ndim)
    alpha_b = _bcast(alpha_step, mat_ndim)
    beta_b = _bcast(beta_noise, mat_ndim)

    track = oracle is not None
    if track:
        oracle_energy = cplx.sum_abs2(oracle, axis=(-1, -2))
    capture = capture_level is not None
    if capture:
        cap_lvl = jnp.asarray(capture_level, jnp.int32)

    def level_step(carry, level_in):
        sigma, lvl = level_in
        if capture:
            x, x_cap, k = carry
        else:
            x, k = carry
        alpha = alpha_b * (sigma / sigma_end) ** 2
        if start_level is not None:
            active = (jnp.asarray(start_level, jnp.int32) <= lvl)
            alpha = alpha * _bcast(active.astype(alpha_b.dtype), mat_ndim)
        denom = np_b / 2.0 + sigma**2
        coef = alpha / denom
        if coef_cap is not None:
            coef = jnp.minimum(coef, _bcast(coef_cap, mat_ndim))
        noise_scale = jnp.sqrt(2.0 * alpha * beta_b)
        nmses = []
        for _ in range(steps_each):
            k, k_noise = jax.random.split(k)
            score = score_fn(x, sigma)
            meas_grad = cplx.matmul(Ah, cplx.matmul(A, x) - Y)
            z = cplx.randn(k_noise, x.shape[:-1])
            x = (x + cplx.scale(score, alpha) - cplx.scale(meas_grad, coef)
                 + cplx.scale(z, noise_scale))
            if track:
                err = cplx.sum_abs2(x - oracle, axis=(-1, -2))
                nmses.append((err / oracle_energy).astype(jnp.float32))
        ys = jnp.stack(nmses) if track else None
        if capture:
            latch = (cap_lvl == lvl)[:, None, None, None]
            x_cap = jnp.where(latch, x, x_cap)
            return (x, x_cap, k), ys
        return (x, k), ys

    levels = jnp.arange(sigmas.shape[0], dtype=jnp.int32)
    if capture:
        (x_final, x_cap, _), nmse_levels = jax.lax.scan(
            level_step, (x_init, x_init, key), (sigmas, levels))
        x_out = x_cap
    else:
        (x_final, _), nmse_levels = jax.lax.scan(
            level_step, (x_init, key), (sigmas, levels))
        x_out = x_final
    if track:
        L, S, B = nmse_levels.shape
        return x_out, nmse_levels.reshape(L * S, B)
    return x_out, None


def annealed_langevin_posterior(
    score_fn_c2: Callable[[Array, Array], Array],
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
    """complex64 convenience wrapper over the c2 core (CPU backends only).

    Accepts complex A/Y/x_init/oracle; score_fn_c2 still takes/returns c2
    NHWC (the network layout). Returns a complex x_final.
    """
    A2, Y2 = cplx.from_complex(A), cplx.from_complex(Y)
    x02 = cplx.from_complex(x_init)
    orc2 = cplx.from_complex(oracle) if oracle is not None else None
    xf2, trace = annealed_langevin_posterior_c2(
        score_fn_c2, A2, Y2, sigmas, noise_power, x02, key,
        alpha_step=alpha_step, beta_noise=beta_noise,
        steps_each=steps_each, oracle=orc2)
    return jax.lax.complex(xf2[..., 0], xf2[..., 1]), trace


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
    (ncsnv2/models/__init__.py:20-56), operating on real NHWC arrays:
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


def annealed_langevin_inpainting(
    score_fn: Callable[[Array, Array], Array],
    x_init: Array,
    refer_x: Array,
    known_mask: Array,
    sigmas: Array,
    key: Array,
    n_steps_each: int = 100,
    step_lr: float = 8e-6,
) -> Array:
    """Inpainting sampler (ncsnv2/models/__init__.py:59-89 semantics).

    At every step the known region is re-imposed as refer + σ·noise
    (models/__init__.py:81-82); the mask generalizes the reference's
    hard-coded "right half missing" to arbitrary known-entry masks —
    for channels this is per-entry partial CSI refinement.

    known_mask: broadcastable to x, 1.0 where x is known.
    """
    sigma_end = sigmas[-1]
    mask = jnp.asarray(known_mask, x_init.dtype)

    def level_step(carry, sigma):
        x0, k0 = carry
        step = step_lr * (sigma / sigma_end) ** 2

        def inner(_, carry):
            x, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            corrupted = refer_x + sigma * jax.random.normal(
                k1, refer_x.shape, x.dtype)
            x = mask * corrupted + (1.0 - mask) * x
            s = score_fn(x, sigma)
            z = jax.random.normal(k2, x.shape, x.dtype)
            return x + step * s + jnp.sqrt(2.0 * step) * z, k

        x, k = jax.lax.fori_loop(0, n_steps_each, inner, (x0, k0))
        return (x, k), None

    (x, _), _ = jax.lax.scan(level_step, (x_init, key), sigmas)
    return x


def annealed_langevin_interpolation(
    score_fn: Callable[[Array, Array], Array],
    x_init: Array,
    sigmas: Array,
    key: Array,
    n_interpolations: int = 8,
    n_steps_each: int = 200,
    step_lr: float = 8e-6,
) -> Array:
    """Interpolation sampler (ncsnv2/models/__init__.py:91-137 semantics).

    Each input row is repeated n_interpolations times; the injected noise
    interpolates between two fixed Gaussian draws on a quarter circle
    (models/__init__.py:108-117), yielding smooth sample paths between two
    random outcomes. Returns (B·n_interpolations, ...) samples.
    """
    sigma_end = sigmas[-1]
    B = x_init.shape[0]
    ni = n_interpolations
    x = jnp.repeat(x_init, ni, axis=0)
    angles = jnp.linspace(0.0, jnp.pi / 2.0, ni)
    cosw = jnp.cos(angles)
    sinw = jnp.sin(angles)

    def level_step(carry, sigma):
        x0, k0 = carry
        step = step_lr * (sigma / sigma_end) ** 2

        def inner(_, carry):
            x, k = carry
            k, kp, kq = jax.random.split(k, 3)
            shape = (B,) + x.shape[1:]
            zp = jax.random.normal(kp, shape, x.dtype)
            zq = jax.random.normal(kq, shape, x.dtype)
            w_shape = (1, ni) + (1,) * (x.ndim - 1)
            z = (zp[:, None] * cosw.reshape(w_shape)
                 + zq[:, None] * sinw.reshape(w_shape))
            z = z.reshape(x.shape)
            s = score_fn(x, sigma)
            return x + step * s + jnp.sqrt(2.0 * step) * z, k

        x1, k1 = jax.lax.fori_loop(0, n_steps_each, inner, (x0, k0))
        return (x1, k1), None

    (x, _), _ = jax.lax.scan(level_step, (x, key), sigmas)
    return x
