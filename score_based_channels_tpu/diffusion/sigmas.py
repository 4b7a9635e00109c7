"""Noise (σ) schedules for the discretized VE-SDE.

Reference: ncsnv2/models/__init__.py:4-17 (get_sigmas) and the Song'20
ε-criterion step-size search in train_score.py:104-115.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_sigmas(
    sigma_begin: float,
    sigma_end: float,
    num: int,
    dist: str = "geometric",
) -> jnp.ndarray:
    """σ-schedule as a device array, f32.

    'geometric': exp(linspace(log σ₀, log σ_N)) — ncsnv2/models/__init__.py:5-8.
    'uniform':   linspace(σ₀, σ_N)              — ncsnv2/models/__init__.py:9-12.
    """
    if dist == "geometric":
        s = np.exp(np.linspace(np.log(sigma_begin), np.log(sigma_end), num))
    elif dist == "uniform":
        s = np.linspace(sigma_begin, sigma_end, num)
    else:
        raise NotImplementedError(f"sigma distribution {dist!r} not supported")
    return jnp.asarray(s, jnp.float32)


def sigmas_from_config(model_cfg) -> jnp.ndarray:
    return get_sigmas(
        model_cfg.sigma_begin, model_cfg.sigma_end, model_cfg.num_classes,
        model_cfg.sigma_dist,
    )


def subsample_schedule(sigmas, stride: int):
    """Shortcut inference: keep every `stride`-th σ-level (always keeping
    σ_end) and the α-compensation factor.

    With a geometric schedule, striding by k multiplies the per-level
    variance gap by ~k, so the Langevin step size α_step should scale by
    ~k to cover the same ground (the reference has no such knob; see
    PAPERS.md shortcut-sampling refs for the general idea).

    Returns (sub_sigmas, alpha_scale).
    """
    import jax.numpy as jnp

    if stride <= 1:
        return sigmas, 1.0
    sub = sigmas[::stride]
    if float(sub[-1]) != float(sigmas[-1]):
        sub = jnp.concatenate([sub, sigmas[-1:]])
    return sub, float(stride)


def song_step_size(
    sigma_end: float,
    num_classes: int,
    sigma_rate: float,
    candidates: np.ndarray | None = None,
) -> float:
    """Pick the Langevin ε by the [Song '20] criterion ≈ 1.

    Pure NumPy reproduction of the selection rule in train_score.py:104-115:
    scan a logspace of candidate steps and choose the one whose mixing
    criterion is closest to 1.
    """
    if candidates is None:
        candidates = np.logspace(-13, -8, 1000)
    gamma = 1.0 / sigma_rate
    se2 = sigma_end**2
    eps = candidates
    contraction = (1.0 - eps / se2) ** (2 * num_classes)
    tail = 2 * eps / (se2 - se2 * (1.0 - eps / se2) ** 2)
    criterion = contraction * (gamma**2 - tail) + tail
    best = int(np.argmin(np.abs(criterion - 1.0)))
    return float(candidates[best])
