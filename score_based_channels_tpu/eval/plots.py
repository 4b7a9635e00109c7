"""Result plotting (reference test_score.py:177-189, plot_ood_results.py).

Produces:
  - NMSE-vs-SNR curves per pilot_alpha (the Fig. 5c style plot saved as
    results.png by test_score.py:177-189),
  - cross-distribution (OOD) comparison plots in the style of the paper's
    Fig. 7 (plot_ood_results.py:86-141): blind-SNR (one fixed stopping
    step, plot_ood_results.py:12-14) vs known-SNR (per-SNR stopping steps,
    plot_ood_results.py:76-82) curves for multiple test profiles.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from .estimate import EstimationResults


def _ensure_dir(path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)


def plot_nmse_curves(results: EstimationResults, path: str,
                     title: str = "Score-based channel estimation") -> None:
    """Per-alpha NMSE-vs-SNR curves (test_score.py:177-189)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.rcParams["font.size"] = 14
    plt.figure(figsize=(10, 10))
    for i_al, alpha in enumerate(results.pilot_alpha_range):
        plt.plot(results.snr_range,
                 10 * np.log10(results.best_nmse[0, i_al]),
                 linewidth=4, label=f"Alpha={float(alpha):.2f}")
    plt.grid()
    plt.legend()
    plt.title(title)
    plt.xlabel("SNR [dB]")
    plt.ylabel("NMSE [dB]")
    plt.tight_layout()
    _ensure_dir(path)
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()


def nmse_at_step(results: EstimationResults, step: int,
                 spacing_idx: int = 0, alpha_idx: int = 0) -> np.ndarray:
    """Blind-SNR selection: NMSE at one fixed stopping step for all SNRs
    (plot_ood_results.py:12-15 semantics). Returns (n_snr,)."""
    return results.avg_nmse[spacing_idx, alpha_idx, :, step]


def nmse_at_per_snr_steps(results: EstimationResults, steps: Sequence[int],
                          spacing_idx: int = 0, alpha_idx: int = 0
                          ) -> np.ndarray:
    """Known-SNR selection: per-SNR stopping steps
    (plot_ood_results.py:76-82, diagonal selection :99-104)."""
    avg = results.avg_nmse[spacing_idx, alpha_idx]
    return np.asarray([avg[s, int(step)] for s, step in enumerate(steps)])


def plot_ood_comparison(
    results_by_profile: Dict[str, EstimationResults],
    path: str,
    blind_step: Optional[int] = None,
    per_snr_steps: Optional[Dict[str, Sequence[int]]] = None,
    alpha_idx: int = 0,
    title: str = "Cross-distribution (OOD) robustness",
) -> None:
    """Overlay NMSE curves of one trained model tested on several profiles.

    results_by_profile: test-profile name → EstimationResults (all from the
    same trained model). If blind_step / per_snr_steps given, plot those
    selections; otherwise the oracle best-step curve.
    """
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.rcParams["font.size"] = 14
    plt.figure(figsize=(10, 10))
    for name, res in results_by_profile.items():
        if per_snr_steps is not None and name in per_snr_steps:
            curve = nmse_at_per_snr_steps(res, per_snr_steps[name],
                                          alpha_idx=alpha_idx)
            label = f"{name} (known SNR)"
        elif blind_step is not None:
            curve = nmse_at_step(res, blind_step, alpha_idx=alpha_idx)
            label = f"{name} (blind, N={blind_step})"
        else:
            curve = res.best_nmse[0, alpha_idx]
            label = f"{name} (oracle stop)"
        plt.plot(res.snr_range, 10 * np.log10(curve), linewidth=4,
                 label=label)
    plt.grid()
    plt.legend()
    plt.title(title)
    plt.xlabel("SNR [dB]")
    plt.ylabel("NMSE [dB]")
    plt.tight_layout()
    _ensure_dir(path)
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
