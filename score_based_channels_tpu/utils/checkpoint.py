"""Checkpointing: params/EMA/optimizer + config in one artifact.

Keeps the reference's "config travels inside the checkpoint" contract
(train_score.py:211-216 saves model+optimizer+config+losses; eval scripts
re-use the stored config at load, test_score.py:35-36), but as a
dependency-free .npz of flattened pytrees plus a JSON config — loadable
without the framework and safe across versions.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import traverse_util

from ..config import Config

_SEP = "/"


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    if tree is None:
        return {}
    flat = traverse_util.flatten_dict(tree, sep=_SEP)
    return {f"{prefix}{_SEP}{k}": np.asarray(v) for k, v in flat.items()}


def _unflatten(npz, prefix: str):
    sub = {
        k[len(prefix) + 1:]: npz[k]
        for k in npz.files
        if k.startswith(prefix + _SEP)
    }
    if not sub:
        return None
    return traverse_util.unflatten_dict(sub, sep=_SEP)


def save_checkpoint(
    path: str,
    config: Config,
    params,
    ema_params=None,
    opt_state_leaves=None,
    extra_arrays: Optional[Dict[str, np.ndarray]] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save a training/inference checkpoint to `<path>` (.npz).

    opt_state_leaves: optional list of leaves of the optax state (stored
    positionally; restored against a freshly-initialized state treedef).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(jax.device_get(params), "params"))
    if ema_params is not None:
        arrays.update(_flatten(jax.device_get(ema_params), "ema"))
    if opt_state_leaves is not None:
        for i, leaf in enumerate(jax.device_get(opt_state_leaves)):
            arrays[f"opt{_SEP}{i:05d}"] = np.asarray(leaf)
    for k, v in (extra_arrays or {}).items():
        arrays[f"extra{_SEP}{k}"] = np.asarray(v)
    meta = {"config": config.to_dict(), "metadata": metadata or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint → dict(config, params, ema, opt_leaves, extra, metadata)."""
    with np.load(path) as npz:
        meta = json.loads(bytes(npz["__meta__"].tobytes()).decode("utf-8"))
        out: Dict[str, Any] = {
            "config": Config.from_dict(meta["config"]),
            "metadata": meta.get("metadata", {}),
            "params": _unflatten(npz, "params"),
            "ema": _unflatten(npz, "ema"),
        }
        opt_keys = sorted(k for k in npz.files if k.startswith("opt" + _SEP))
        out["opt_leaves"] = [npz[k] for k in opt_keys] or None
        out["extra"] = {
            k[len("extra") + 1:]: npz[k]
            for k in npz.files
            if k.startswith("extra" + _SEP)
        }
    return out
