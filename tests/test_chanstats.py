"""Generator-statistics diagnostics (eval/chanstats.py).

Validates the round-2 Fig.-5c-gap diagnosis machinery: the generator's
empirical second-order statistics must converge to the TR 38.901
analytic covariances (a table-determined ground truth shared with any
compliant implementation, incl. MATLAB's nrCDLChannel under the
reference's single-pol config, genChannels.m:13-16), and the exact
Gaussian-prior LMMSE bound must be finite, monotone in SNR, and
consistent with the known estimability ordering of the profiles.
"""

import numpy as np
import pytest

from score_based_channels_tpu.data.cdl import generate_cdl_channels
from score_based_channels_tpu.eval.chanstats import (
    analytic_covariances,
    analytic_full_covariance,
    eig_stats,
    empirical_stats,
    cov_rel_error,
    lmmse_bound_db,
)


def test_analytic_covariance_properties():
    for prof in ["CDL-A", "CDL-C", "CDL-D"]:
        R_tx, R_rx = analytic_covariances(prof)
        for R, n in ((R_tx, 64), (R_rx, 16)):
            assert R.shape == (n, n)
            assert np.allclose(R, R.conj().T, atol=1e-12)  # Hermitian
            assert np.isclose(np.trace(R).real, 1.0, atol=1e-9)
            lam = np.linalg.eigvalsh(R)
            assert lam.min() > -1e-10  # PSD


def test_empirical_matches_analytic_covariance():
    """Generated batches converge to the table covariances (both sides)."""
    H = generate_cdl_channels(7, "CDL-C", num_channels=400)[:, 0]
    emp = empirical_stats(H)
    R_tx_a, R_rx_a = analytic_covariances("CDL-C")
    assert cov_rel_error(emp["R_tx"], R_tx_a) < 0.10
    assert cov_rel_error(emp["R_rx"], R_rx_a) < 0.10
    # effective ranks agree within sampling error
    ana_tx = eig_stats(R_tx_a)
    assert abs(emp["tx"]["erank"] - ana_tx["erank"]) / ana_tx["erank"] < 0.05


def test_profile_compressibility_ordering():
    """erank ordering A > B > C > D (LOS) — the OOD-difficulty ordering."""
    eranks = {}
    for prof in ["CDL-A", "CDL-B", "CDL-C", "CDL-D"]:
        R_tx, _ = analytic_covariances(prof)
        eranks[prof] = eig_stats(R_tx)["erank"]
    assert eranks["CDL-A"] > eranks["CDL-B"] > eranks["CDL-C"] > eranks["CDL-D"]


def test_full_covariance_consistent_with_sides():
    """Partial traces of the full vec-covariance reproduce R_tx/R_rx.

    Checked in the steering-vector orientation (data_layout=False) and,
    since round 3, for BOTH ray-coupling ensembles: coupling permutes a
    per-cluster sum, so the side marginals are coupling-invariant even
    though the full covariances differ (erank 36 vs 16.5 at 64×16)."""
    n_t, n_r = 8, 4
    R_tx_ref, _ = analytic_covariances("CDL-C", num_rx=n_r, num_tx=n_t)
    for rc in ("random", "fixed"):
        C = analytic_full_covariance("CDL-C", num_rx=n_r, num_tx=n_t,
                                     ray_coupling=rc, data_layout=False)
        assert np.isclose(np.trace(C).real, n_t * n_r, atol=1e-6)
        Cb = C.reshape(n_r, n_t, n_r, n_t)
        R_tx = np.einsum("rtrs->ts", Cb) / (n_t * n_r)
        assert cov_rel_error(R_tx, R_tx_ref) < 1e-9, rc
    # the data-layout covariance is exactly the conjugate
    Cd = analytic_full_covariance("CDL-C", num_rx=n_r, num_tx=n_t,
                                  ray_coupling="random", data_layout=True)
    Cs = analytic_full_covariance("CDL-C", num_rx=n_r, num_tx=n_t,
                                  ray_coupling="random", data_layout=False)
    np.testing.assert_allclose(Cd, Cs.conj(), rtol=0, atol=1e-12)


@pytest.mark.parametrize("profile", ["CDL-C", "CDL-D"])
def test_lmmse_bound_monotone_and_finite(profile):
    snr = np.array([-10.0, 0.0, 10.0, 20.0, 30.0])
    b = lmmse_bound_db(profile, snr, num_pilot_draws=1)
    assert np.all(np.isfinite(b))
    assert np.all(np.diff(b) < 0)  # strictly better with SNR
    assert b[0] < 0  # even at -10 dB the prior buys something


def test_lmmse_bound_ordering_los_easiest():
    """CDL-D (near rank-1) is far more estimable at low SNR than CDL-C."""
    snr = np.array([-10.0])
    b_c = lmmse_bound_db("CDL-C", snr, num_pilot_draws=1)[0]
    b_d = lmmse_bound_db("CDL-D", snr, num_pilot_draws=1)[0]
    assert b_d < b_c - 3.0


def test_generator_ray_coupling_modes_match_their_analytic_forms():
    """data/cdl.py ray_coupling={random,fixed} must each converge to ITS
    analytic covariance and mismatch the other's (round-3 mechanism)."""
    from score_based_channels_tpu.data.cdl import generate_cdl_channels

    def emp_cov(rc):
        H = generate_cdl_channels(5, "CDL-C", num_channels=400,
                                  ray_coupling=rc)[:, 0]
        X = np.conj(np.swapaxes(H, -1, -2))
        X = X / np.sqrt(np.mean(np.abs(X) ** 2))
        V = X.reshape(X.shape[0], -1, order="F")
        return (V.T @ V.conj()) / V.shape[0]

    ana = {rc: analytic_full_covariance("CDL-C", ray_coupling=rc)
           for rc in ("random", "fixed")}
    for rc in ("random", "fixed"):
        E = emp_cov(rc)
        err_own = np.linalg.norm(E - ana[rc]) / np.linalg.norm(E)
        other = "fixed" if rc == "random" else "random"
        err_other = np.linalg.norm(E - ana[other]) / np.linalg.norm(E)
        assert err_own < 0.35, (rc, err_own)     # finite-sample floor @400
        assert err_other > 1.5 * err_own, (rc, err_own, err_other)
