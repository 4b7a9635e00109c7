"""Pilot-axis plotting surface: stop-table reading + per-α assembly.

The round-5 pilot-density deliverable (reference plot_ood_results.py:12-15,
76-82 semantics) is assembled by `eval.plots.plot_pilot_axis` from saved
estimate runs + tuner tables; these tests pin the selection arithmetic the
figure and its printed markdown tables rely on, on synthetic traces with
known argmins.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from score_based_channels_tpu.eval.estimate import EstimationResults
from score_based_channels_tpu.eval.plots import (
    nmse_at_per_snr_steps, plot_pilot_axis,
)


def _synthetic_results(seed, S=3, T=40, C=5):
    """Per-step traces decreasing to a per-SNR floor at a known step."""
    rng = np.random.default_rng(seed)
    # floor position varies per snr: argmin at step 10·(s+1)
    nmse = np.empty((1, 1, S, T, C), np.float32)
    for s in range(S):
        t = np.arange(T, dtype=np.float32)
        trough = 10 * (s + 1)
        curve = 0.1 + 0.01 * (t - trough) ** 2 / T
        nmse[0, 0, s] = curve[:, None] * (1 + 0.01 * rng.random(C))[None, :]
    avg = nmse.mean(-1)
    return EstimationResults(
        nmse_log=nmse, avg_nmse=avg, best_nmse=avg.min(-1),
        snr_range=np.array([-10.0, 0.0, 10.0])[:S],
        spacing_range=np.array([0.5]),
        pilot_alpha_range=np.array([0.6]))


def test_nmse_at_per_snr_steps_reads_the_diagonal():
    res = _synthetic_results(0)
    steps = [10, 20, 30]
    picked = nmse_at_per_snr_steps(res, steps)
    expect = np.array([res.avg_nmse[0, 0, s, st]
                       for s, st in enumerate(steps)])
    np.testing.assert_allclose(picked, expect)
    # the tuner's argmin steps are exactly the trace troughs
    np.testing.assert_array_equal(res.avg_nmse[0, 0].argmin(-1), steps)


def test_plot_pilot_axis_assembles_tables(tmp_path, capsys, monkeypatch):
    # cheap analytic stand-in for the genie bound (the real chanstats
    # covariance build is exercised in test_chanstats.py)
    from score_based_channels_tpu.eval import chanstats

    monkeypatch.setattr(
        chanstats, "lmmse_bound_db",
        lambda ch, snr, **kw: -np.asarray(snr, float) - 5.0)

    hp_fmt = str(tmp_path / "hp-a{a}.npz")
    kn_fmt = str(tmp_path / "known-a{a}.npz")
    bl_fmt = str(tmp_path / "blind-a{a}.npz")
    for i, a in enumerate((1.0, 0.8, 0.6)):
        res = _synthetic_results(i)
        res.save(kn_fmt.format(a=a))
        res.save(bl_fmt.format(a=a))
        np.savez(hp_fmt.format(a=a),
                 blind_step=25, blind_alpha=3e-10, blind_beta=0.01,
                 best_step_snr=np.array([10, 20, 30]))
    out = str(tmp_path / "fig.png")
    plot_pilot_axis(out, hparams_fmt=hp_fmt, blind_fmt=bl_fmt,
                    known_fmt=kn_fmt, lasso_path=str(tmp_path / "absent.npz"))
    assert (tmp_path / "fig.png").exists()
    printed = capsys.readouterr().out
    # one blind row and one known row per alpha, with the blind-step value
    res = _synthetic_results(0)
    blind_db = 10 * np.log10(res.avg_nmse[0, 0, 0, 25])
    assert f"{blind_db:.2f}" in printed
    for a in ("1.0", "0.8", "0.6"):
        assert f"| {a} | 25 |" in printed
    # known anchors read the per-snr stop diagonal, not the global min
    known_db = 10 * np.log10(res.avg_nmse[0, 0, 0, 10])
    assert f"{known_db:.2f}" in printed


def test_plot_pilot_axis_skips_missing_alphas(tmp_path, capsys):
    out = str(tmp_path / "fig.png")
    plot_pilot_axis(out, hparams_fmt=str(tmp_path / "none-a{a}.npz"),
                    blind_fmt=str(tmp_path / "none-b{a}.npz"),
                    known_fmt=str(tmp_path / "none-k{a}.npz"),
                    lasso_path=str(tmp_path / "absent.npz"))
    printed = capsys.readouterr().out
    assert printed.count("skipping") == 3
