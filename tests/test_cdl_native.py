"""Native C++ CDL generator vs the JAX backend (statistical parity)."""

import numpy as np
import pytest

from score_based_channels_tpu.data.cdl import generate_cdl_channels
from score_based_channels_tpu.data.cdl_native import (
    NativeUnavailable, generate_cdl_channels_native, native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++/OpenMP unavailable")


def test_native_shapes_dtype():
    H = generate_cdl_channels_native(seed=1, profile="CDL-C", num_channels=6)
    assert H.shape == (6, 10, 16, 64)
    assert H.dtype == np.complex64


def test_native_deterministic():
    a = generate_cdl_channels_native(seed=5, num_channels=3)
    b = generate_cdl_channels_native(seed=5, num_channels=3)
    np.testing.assert_array_equal(a, b)
    c = generate_cdl_channels_native(seed=6, num_channels=3)
    assert np.abs(a - c).max() > 1e-3


@pytest.mark.parametrize("profile", ["CDL-A", "CDL-C", "CDL-D"])
def test_native_matches_jax_statistics(profile):
    """Same model, different RNG streams ⇒ matching second-order stats."""
    N = 64
    Hn = generate_cdl_channels_native(seed=3, profile=profile, num_channels=N)
    Hj = generate_cdl_channels(seed=3, profile=profile, num_channels=N)
    # entry power
    pn = np.mean(np.abs(Hn[:, 0]) ** 2)
    pj = np.mean(np.abs(Hj[:, 0]) ** 2)
    assert abs(pn - pj) / pj < 0.25, (pn, pj)
    # spatial covariance across the tx array (dominant structure)
    def tx_cov(H):
        X = H[:, 0].reshape(-1, H.shape[-1])  # (N·Nr, Nt)
        C = X.conj().T @ X / X.shape[0]
        return C / np.trace(C).real
    Cn, Cj = tx_cov(Hn), tx_cov(Hj)
    corr = np.abs(np.vdot(Cn, Cj)) / (np.linalg.norm(Cn) * np.linalg.norm(Cj))
    assert corr > 0.9, corr
