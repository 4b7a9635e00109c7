"""Property tests for the pilot measurement physics (SURVEY.md Appendix A)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_channels_tpu import physics


def test_complex_views_roundtrip():
    key = jax.random.key(0)
    x = physics.crandn(key, (3, 8, 4))
    v = physics.complex_to_nhwc(x)
    assert v.shape == (3, 8, 4, 2)
    np.testing.assert_allclose(physics.nhwc_to_complex(v), x)


def test_crandn_unit_power():
    z = physics.crandn(jax.random.key(1), (20000,))
    power = float(jnp.mean(jnp.abs(z) ** 2))
    assert abs(power - 1.0) < 0.05  # E|z|² = 1 (test_score.py:120-124)


def test_qpsk_pilot_entries():
    P = physics.qpsk_pilots(jax.random.key(2), 4, 64, 38)
    assert P.shape == (4, 64, 38)
    # entries (±1±j)/√2 → unit modulus (loaders.py:52-55)
    np.testing.assert_allclose(np.abs(np.asarray(P)), 1.0, rtol=1e-6)
    re = np.real(np.asarray(P)) * np.sqrt(2)
    assert set(np.round(re.ravel()).tolist()) <= {-1.0, 1.0}


def test_adjoint_is_true_adjoint():
    """<A x, y> == <x, Aᴴ y> for the pilot operator."""
    key = jax.random.key(3)
    k1, k2, k3 = jax.random.split(key, 3)
    P = physics.qpsk_pilots(k1, 2, 64, 38)
    A = physics.pilot_operator(P)
    x = physics.crandn(k2, (2, 64, 16))
    y = physics.crandn(k3, (2, 38, 16))
    lhs = jnp.sum(physics.forward(A, x) * jnp.conj(y), axis=(-1, -2))
    rhs = jnp.sum(x * jnp.conj(physics.adjoint(A, y)), axis=(-1, -2))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-4)


def test_measurement_grad_zero_at_solution():
    key = jax.random.key(4)
    k1, k2 = jax.random.split(key)
    P = physics.qpsk_pilots(k1, 2, 64, 38)
    A = physics.pilot_operator(P)
    x = physics.crandn(k2, (2, 64, 16))
    y = physics.forward(A, x)
    g = physics.measurement_grad(A, x, y)
    assert float(jnp.max(jnp.abs(g))) < 1e-3


def test_snr_noise_model():
    # noise = 10^(−SNR/10)·Nt (test_score.py:75)
    np.testing.assert_allclose(
        np.asarray(physics.snr_to_noise_power(jnp.array([0.0, 10.0, -10.0]), 64)),
        [64.0, 6.4, 640.0], rtol=1e-6)


def test_nmse_matches_definition():
    key = jax.random.key(5)
    h = physics.crandn(key, (3, 16, 64))
    est = h * 1.1
    expected = (np.abs(0.1) ** 2 * np.sum(np.abs(np.asarray(h)) ** 2, axis=(1, 2))
                / np.sum(np.abs(np.asarray(h)) ** 2, axis=(1, 2)))
    np.testing.assert_allclose(np.asarray(physics.nmse(est, h)), expected,
                               rtol=1e-4)


def test_measure_noise_power():
    key = jax.random.key(6)
    P = physics.qpsk_pilots(key, 1, 64, 64)
    A = physics.pilot_operator(P)
    x = jnp.zeros((1, 64, 16), jnp.complex64)
    noise_power = 2.5
    ys = []
    for i in range(200):
        ys.append(physics.measure(jax.random.key(100 + i), A, x, noise_power))
    emp = float(np.mean(np.abs(np.asarray(ys)) ** 2))
    assert abs(emp - noise_power) / noise_power < 0.1
