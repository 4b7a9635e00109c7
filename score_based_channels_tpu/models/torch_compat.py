"""Reference-checkpoint translation: PyTorch state_dict ⇄ flax param pytree.

The reference ships pretrained weights as torch checkpoints
(`models/score/<ch>/final_model.pt` with keys model_state/optim_state/
config/..., train_score.py:211-216). Our flax modules use names mirroring
the torch state-dict structure (SURVEY.md C8-C9 key contract, including
RCU's `{i}_{j}_conv` naming from ncsnv2/models/layers.py:118 and the
`sigmas` buffer from ncsnv2.py:207), so translation is mechanical:

  torch 'res1.0.conv1.weight'  (O,I,kh,kw) → params['res1_0']['conv1']['kernel'] (kh,kw,I,O)
  torch '...bias' / norm α/γ/β             → same leaf name, same shape
  torch 'sigmas' buffer                     → returned separately

No torch import is required at module import time; translation functions
accept any mapping of name → numpy-convertible array.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _merge_digit_tokens(tokens):
    """['res1','0','conv1'] → ['res1_0','conv1'] (ModuleList indices)."""
    merged = []
    for t in tokens:
        if t.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{t}"
        else:
            merged.append(t)
    return merged


def torch_state_dict_to_flax(
    state_dict: Mapping[str, "np.ndarray"],
) -> Tuple[Dict, np.ndarray | None]:
    """Translate a reference NCSNv2 state_dict into a flax params dict.

    Returns (params, sigmas) where sigmas is the σ-buffer if present.
    Accepts torch tensors or numpy arrays as values.
    """
    params: Dict = {}
    sigmas = None
    for key, val in state_dict.items():
        arr = np.asarray(getattr(val, "detach", lambda: val)().cpu().numpy()
                         if hasattr(val, "detach") else val)
        if key == "sigmas":
            sigmas = arr.astype(np.float32)
            continue
        toks = _merge_digit_tokens(key.split("."))
        leaf = toks[-1]
        if leaf == "weight":
            toks[-1] = "kernel"
            if arr.ndim == 4:  # conv (O,I,kh,kw) → (kh,kw,I,O)
                arr = np.transpose(arr, (2, 3, 1, 0))
            elif arr.ndim == 2:  # linear (O,I) → (I,O)
                arr = np.transpose(arr)
        node = params
        for t in toks[:-1]:
            node = node.setdefault(t, {})
        node[toks[-1]] = arr.astype(np.float32)
    return params, sigmas


def flax_params_to_torch_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse translation (flax params → torch-style flat state_dict).

    Digit-suffixed module names are split back into ModuleList indices only
    for the known list containers (res*/convs/adapt_convs), matching the
    reference key format exactly.
    """
    list_parents = ("res1", "res2", "res3", "res31", "res4", "res5",
                    "convs", "adapt_convs")
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        for name, child in node.items():
            toks = list(path)
            base, _, idx = name.rpartition("_")
            if idx.isdigit() and base in list_parents:
                toks += [base, idx]
            else:
                toks.append(name)
            if isinstance(child, Mapping):
                walk(child, toks)
            else:
                arr = np.asarray(child)
                leaf = toks[-1]
                if leaf == "kernel":
                    toks[-1] = "weight"
                    if arr.ndim == 4:
                        arr = np.transpose(arr, (3, 2, 0, 1))
                    elif arr.ndim == 2:
                        arr = np.transpose(arr)
                out[".".join(toks)] = arr

    walk(params, [])
    return out


def load_reference_checkpoint(path: str):
    """Load a reference final_model.pt → (flax params, sigmas, raw config).

    Requires torch (CPU) at call time only.
    """
    import torch

    contents = torch.load(path, map_location="cpu", weights_only=False)
    params, sigmas = torch_state_dict_to_flax(contents["model_state"])
    return params, sigmas, contents.get("config")
