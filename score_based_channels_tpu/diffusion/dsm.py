"""Denoising score-matching loss (annealed, σ-weighted).

Reference ncsnv2/losses/dsm.py:6-33:
  - sample a random σ-level per batch element,
  - perturb x̃ = x + σ·z with z ~ N(0, I),
  - regress the score net onto  −z/σ²,
  - weight each element's ½‖·‖² by σ^anneal_power (=σ² for anneal_power=2).

Functional JAX version: the caller threads the PRNG key and the apply_fn
(params are explicit so the same loss serves train / EMA-validation).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def anneal_dsm_loss(
    apply_fn: Callable[..., Array],
    params,
    samples: Array,
    sigmas: Array,
    key: Array,
    labels: Optional[Array] = None,
    anneal_power: float = 2.0,
) -> Array:
    """Mean annealed DSM loss over the batch.

    apply_fn(params, x, used_sigmas) -> score, with x (B,H,W,2) NHWC and
    used_sigmas (B,) — the network divides its output by σ internally
    (reference ncsnv2/models/ncsnv2.py:295-298), so here we only build the
    perturbation and the regression target.
    """
    b = samples.shape[0]
    k_label, k_noise = jax.random.split(key)
    if labels is None:
        labels = jax.random.randint(k_label, (b,), 0, sigmas.shape[0])
    used = sigmas[labels]  # (B,)
    bcast = used.reshape((b,) + (1,) * (samples.ndim - 1))

    noise = jax.random.normal(k_noise, samples.shape, samples.dtype) * bcast
    perturbed = samples + noise
    target = -noise / (bcast**2)

    scores = apply_fn(params, perturbed, used)

    diff = (scores - target).reshape(b, -1)
    per_sample = 0.5 * jnp.sum(diff**2, axis=-1) * used**anneal_power
    return jnp.mean(per_sample)
