"""c2 real-pair complex algebra vs numpy complex ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from score_based_channels_tpu import cplx, physics


def _rand_c(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64)


def test_roundtrip():
    rng = np.random.default_rng(0)
    a = _rand_c(rng, (3, 4, 5))
    np.testing.assert_allclose(cplx.to_complex(cplx.from_complex(a)), a)


def test_matmul_matches_numpy():
    rng = np.random.default_rng(1)
    a = _rand_c(rng, (2, 8, 6))
    b = _rand_c(rng, (2, 6, 4))
    out = cplx.to_complex(cplx.matmul(cplx.from_complex(a), cplx.from_complex(b)))
    np.testing.assert_allclose(out, a @ b, rtol=1e-5, atol=1e-5)


def test_conj_transpose():
    rng = np.random.default_rng(2)
    a = _rand_c(rng, (2, 5, 3))
    out = cplx.to_complex(cplx.conj_transpose(cplx.from_complex(a)))
    np.testing.assert_allclose(out, np.conj(np.swapaxes(a, -1, -2)))


def test_mul_abs2_nmse():
    rng = np.random.default_rng(3)
    a = _rand_c(rng, (4, 6))
    b = _rand_c(rng, (4, 6))
    np.testing.assert_allclose(
        cplx.to_complex(cplx.mul(cplx.from_complex(a), cplx.from_complex(b))),
        a * b, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cplx.abs2(cplx.from_complex(a))), np.abs(a) ** 2, rtol=1e-5)
    est, orc = _rand_c(rng, (3, 4, 6)), _rand_c(rng, (3, 4, 6))
    want = (np.sum(np.abs(est - orc) ** 2, (-1, -2))
            / np.sum(np.abs(orc) ** 2, (-1, -2)))
    got = np.asarray(cplx.nmse(cplx.from_complex(est), cplx.from_complex(orc)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_randn_unit_power_and_pilots():
    z = cplx.randn(jax.random.key(0), (20000,))
    power = float(jnp.mean(cplx.abs2(z)))
    assert abs(power - 1.0) < 0.05
    P = cplx.qpsk_pilots(jax.random.key(1), 3, 64, 38)
    assert P.shape == (3, 64, 38, 2)
    np.testing.assert_allclose(np.asarray(cplx.abs2(P)), 1.0, rtol=1e-6)


def test_measure_c2_matches_complex_measure_stats():
    key = jax.random.key(4)
    kp, kx, km = jax.random.split(key, 3)
    P2 = cplx.qpsk_pilots(kp, 2, 64, 38)
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.randn(kx, (2, 64, 16))
    noise = 4.0
    Y2 = physics.measure_c2(km, A2, jnp.zeros_like(X2), jnp.full((2,), noise))
    emp = float(jnp.mean(cplx.abs2(Y2)))
    assert abs(emp - noise) / noise < 0.15


def test_c2_sampler_matches_complex_wrapper():
    """The c2 core and the complex wrapper must agree bitwise-ish on CPU."""
    from score_based_channels_tpu.diffusion import (
        annealed_langevin_posterior, annealed_langevin_posterior_c2,
    )
    from score_based_channels_tpu.diffusion.sigmas import get_sigmas

    key = jax.random.key(5)
    kp, kx, km, ki, kr = jax.random.split(key, 5)
    B = 4
    P2 = cplx.qpsk_pilots(kp, B, 64, 38)
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.randn(kx, (B, 64, 16))
    noise = 0.64
    Y2 = physics.measure_c2(km, A2, X2, noise)
    x02 = cplx.randn(ki, (B, 64, 16))
    sig = get_sigmas(39.15, 0.01, 6)
    zero = lambda x, s: jnp.zeros_like(x)

    xf2, tr2 = annealed_langevin_posterior_c2(
        zero, A2, Y2, sig, noise, x02, kr, alpha_step=1e-5, beta_noise=0.01,
        steps_each=3, oracle=X2)
    A_c = jnp.asarray(cplx.to_complex(A2))
    Y_c = jnp.asarray(cplx.to_complex(Y2))
    x0_c = jnp.asarray(cplx.to_complex(x02))
    X_c = jnp.asarray(cplx.to_complex(X2))
    xf_c, tr_c = annealed_langevin_posterior(
        zero, A_c, Y_c, sig, noise, x0_c, kr, alpha_step=1e-5,
        beta_noise=0.01, steps_each=3, oracle=X_c)
    np.testing.assert_allclose(np.asarray(tr2), np.asarray(tr_c), rtol=1e-5)
    np.testing.assert_allclose(cplx.to_complex(xf2), np.asarray(xf_c),
                               rtol=1e-4, atol=1e-5)
