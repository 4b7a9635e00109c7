"""Pilot measurement physics: forward/adjoint operators, noise model, NMSE.

The estimation problem (reference test_score.py:122-165, loaders.py:52-85):

  channel      H ∈ C^{Nr×Nt}        (physical layout; Nr=16, Nt=64)
  Hermitian    X = H^H ∈ C^{Nt×Nr}  (what the score network sees)
  pilots       P ∈ C^{Nt×Np}, QPSK entries (±1±j)/√2  (loaders.py:52-55)
  operator     A ∈ C^{Np×Nt} = P̄ᵀ (= conj(P).T, test_score.py:111)
  measurement  Y = A·X + √noise·W,  W unit-power complex Gaussian
                                    (test_score.py:122-124)
  SNR model    noise = 10^(−SNR/10) · Nt  (test_score.py:75)

Everything here is pure jnp on complex64, batched over a leading axis, and
shape-static so it fuses into the Langevin `lax.scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# -----------------------------------------------------------------------------
# complex <-> 2-channel real views (NHWC; reference uses NCHW view_as_real)
# -----------------------------------------------------------------------------


def complex_to_nhwc(x: Array) -> Array:
    """C^{...×H×W} → R^{...×H×W×2} with channels (Re, Im).

    Matches reference `torch.view_as_real(x).permute(0, 3, 1, 2)`
    (test_score.py:149) up to our NHWC layout choice.
    """
    return jnp.stack((jnp.real(x), jnp.imag(x)), axis=-1)


def nhwc_to_complex(x: Array) -> Array:
    """R^{...×H×W×2} → C^{...×H×W} (inverse of complex_to_nhwc)."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def crandn(key: Array, shape, dtype=jnp.complex64) -> Array:
    """Unit-power circular complex Gaussian: E|z|² = 1.

    The reference samples this as `torch.randn_like(<complex>)` — which
    yields unit total power (Re, Im each of variance 1/2; see
    test_score.py:120-124) — or equivalently √(1/2)·(g₁+j·g₂)
    (test_ml.py:126-129). The two are identical in distribution.
    """
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, shape, rdtype)
    im = jax.random.normal(k2, shape, rdtype)
    return (re + 1j * im) * jnp.asarray(jnp.sqrt(0.5), dtype)


# -----------------------------------------------------------------------------
# pilots
# -----------------------------------------------------------------------------


def qpsk_pilots(key: Array, batch: int, num_tx: int, num_pilots: int) -> Array:
    """Per-sample random QPSK pilots P ∈ C^{Nt×Np}, entries (±1±j)/√2.

    Reference loaders.py:52-55 (Bernoulli(0.5) signs on Re and Im).
    Returns (batch, num_tx, num_pilots) complex64.
    """
    k1, k2 = jax.random.split(key)
    shape = (batch, num_tx, num_pilots)
    re = 2.0 * jax.random.bernoulli(k1, 0.5, shape).astype(jnp.float32) - 1.0
    im = 2.0 * jax.random.bernoulli(k2, 0.5, shape).astype(jnp.float32) - 1.0
    return ((re + 1j * im) * jnp.sqrt(0.5).astype(jnp.float32)).astype(jnp.complex64)


def pilot_operator(P: Array) -> Array:
    """A = P̄ᵀ ∈ C^{...×Np×Nt} from pilots P ∈ C^{...×Nt×Np}.

    Reference test_score.py:111: `torch.conj(torch.transpose(P, -1, -2))`.
    """
    return jnp.conj(jnp.swapaxes(P, -1, -2))


# -----------------------------------------------------------------------------
# forward / adjoint / measurement
# -----------------------------------------------------------------------------


def forward(A: Array, X: Array) -> Array:
    """Y = A·X, batched. A: (...,Np,Nt), X: (...,Nt,Nr) → (...,Np,Nr)."""
    return jnp.matmul(A, X)


def adjoint(A: Array, R: Array) -> Array:
    """Aᴴ·R, batched. A: (...,Np,Nt), R: (...,Np,Nr) → (...,Nt,Nr)."""
    return jnp.matmul(jnp.conj(jnp.swapaxes(A, -1, -2)), R)


def measurement_grad(A: Array, X: Array, Y: Array) -> Array:
    """∇ₓ ½‖A·X − Y‖² = Aᴴ(A·X − Y) (reference test_score.py:157-158)."""
    return adjoint(A, forward(A, X) - Y)


def snr_to_noise_power(snr_db: Array, num_tx: int) -> Array:
    """noise = 10^(−SNR/10)·Nt (reference test_score.py:75).

    SNR is defined against unit-power channel entries; the Nt factor accounts
    for the Np-row measurement combining Nt entries of unit-power pilots.
    """
    return 10.0 ** (-jnp.asarray(snr_db) / 10.0) * num_tx


def measure(key: Array, A: Array, X: Array, noise_power: Array) -> Array:
    """Y = A·X + √noise·W with unit-power complex W (test_score.py:122-124).

    noise_power broadcasts over leading batch axes (shape () or (B,)).
    """
    Y = forward(A, X)
    w = crandn(key, Y.shape)
    np_ = jnp.asarray(noise_power, jnp.float32)
    while np_.ndim < Y.ndim:
        np_ = np_[..., None]
    return Y + jnp.sqrt(np_).astype(Y.dtype) * w


# -----------------------------------------------------------------------------
# metric
# -----------------------------------------------------------------------------


# -----------------------------------------------------------------------------
# c2 (real-pair) variants — the TPU-native path; see cplx.py
# -----------------------------------------------------------------------------


def measure_c2(key: Array, A2: Array, X2: Array, noise_power: Array) -> Array:
    """Y = A·X + √noise·W in c2 arithmetic (TPU-safe; no complex dtype).

    A2: (B,Np,Nt,2), X2: (B,Nt,Nr,2), noise_power scalar or (B,).
    """
    from . import cplx

    Y = cplx.matmul(A2, X2)
    w = cplx.randn(key, Y.shape[:-1])
    np_ = jnp.asarray(noise_power, jnp.float32)
    amp = jnp.sqrt(np_).reshape(np_.shape + (1,) * (Y.ndim - np_.ndim))
    return Y + w * amp


def nmse(estimate: Array, oracle: Array) -> Array:
    """Per-sample NMSE = ‖Ĥ−H‖²_F / ‖H‖²_F over trailing 2 dims.

    Reference test_score.py:168-171. Returns real f32 with the leading batch
    axes of the inputs.
    """
    err = jnp.sum(jnp.abs(estimate - oracle) ** 2, axis=(-1, -2))
    ref = jnp.sum(jnp.abs(oracle) ** 2, axis=(-1, -2))
    return (err / ref).astype(jnp.float32)


def nmse_db(estimate: Array, oracle: Array) -> Array:
    return 10.0 * jnp.log10(nmse(estimate, oracle))
