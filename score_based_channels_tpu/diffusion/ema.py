"""Exponential moving average of parameters as a pure pytree transform.

Reference ncsnv2/models/ema.py:16-21 keeps a shadow dict with
  shadow ← (1−μ)·param + μ·shadow,  μ = 0.999 (train_score.py:38).

Here the shadow is just a pytree the caller carries in its train state; the
EMA copy used for validation/inference is the shadow itself (no model
rebuild, unlike reference ema.py:30-41 which reconstructs a full module per
validation round).
"""

from __future__ import annotations

import jax


def ema_init(params):
    """Register: shadow starts as a DISTINCT copy of params (ema.py:9-14).

    Must not alias the live parameter buffers — the train step donates its
    state, and aliased params/shadow would be donated twice.
    """
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(shadow, params, mu: float = 0.999):
    """shadow ← (1−μ)·p + μ·shadow (ema.py:16-21)."""
    return jax.tree_util.tree_map(
        lambda s, p: mu * s + (1.0 - mu) * p, shadow, params
    )
