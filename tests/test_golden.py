"""Golden end-to-end numerics regression guards (VERDICT r1 item 7).

Two layers of protection against silent numerics drift:

1. Analytic-prior sampler golden: with an iid Gaussian channel prior the
   noised-score is known in closed form, score(x, σ) = −x/(½+σ²) (per real
   component, var ½ each), and the annealed-Langevin posterior update's
   fixed point at σ→σ_end is EXACTLY the complex LMMSE solution
   (AᴴA + noise·I)⁻¹Aᴴy.  The sampler (reference update rule
   test_score.py:143-165) must land within a fraction of a dB of that
   closed form — any regression in the annealing, data-consistency
   coefficient, c2 algebra, or noise injection moves it.

2. Fixed-seed trained-pipeline band: a tiny deterministic DSM training run
   must reproduce its final-loss band; catches trainer/optimizer/EMA
   composition drift.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from score_based_channels_tpu import cplx
from score_based_channels_tpu.config import (
    Config, DataConfig, ModelConfig, SamplingConfig, TrainingConfig,
)
from score_based_channels_tpu.diffusion.sampling import (
    annealed_langevin_posterior,
)
from score_based_channels_tpu.diffusion.sigmas import get_sigmas
from score_based_channels_tpu.train import ScoreTrainer


def test_sampler_matches_analytic_lmmse():
    B, Nt, Nr, Np = 8, 64, 16, 38
    rng = np.random.default_rng(0)
    crandn = lambda *s: (rng.standard_normal(s) + 1j * rng.standard_normal(s)
                         ).astype(np.complex64) / np.sqrt(2)
    H = crandn(B, Nt, Nr)  # unit-variance complex entries → prior CN(0, I)
    # QPSK pilots, A = P̄ᵀ (loaders.py:52-55 convention: rows ~ pilots)
    A = ((rng.integers(0, 2, (B, Np, Nt)) * 2 - 1)
         + 1j * (rng.integers(0, 2, (B, Np, Nt)) * 2 - 1)
         ).astype(np.complex64) / np.sqrt(2)
    noise_power = 0.5  # ~0 dB per pilot dimension
    N = crandn(B, Np, Nr) * np.sqrt(noise_power)
    Y = A @ H + N

    # closed-form complex LMMSE (prior CN(0,I), noise CN(0, noise_power·I))
    AhA = np.conj(np.swapaxes(A, -1, -2)) @ A
    rhs = np.conj(np.swapaxes(A, -1, -2)) @ Y
    H_lmmse = np.linalg.solve(
        AhA + noise_power * np.eye(Nt, dtype=np.complex64)[None], rhs)
    nmse_lmmse = (np.abs(H_lmmse - H) ** 2).sum((-1, -2)) / (
        np.abs(H) ** 2).sum((-1, -2))

    # analytic score of the σ-noised unit-Gaussian prior (per-component
    # variance ½): s(x, σ) = −x/(½+σ²)
    score_fn = lambda x, sigma: -x / (0.5 + sigma**2)

    # settings pinned 2026-08-17: α=1e-6 sits just under the stability
    # bound α·λmax(AᴴA)/σ_end² < 2 with λmax ≈ (√Nt+√Np)² ≈ 200; at these
    # the sampler reproduces LMMSE to < 0.01 dB (measured −3.731 vs −3.7317)
    sigmas = get_sigmas(5.0, 0.01, 300)
    x0 = jnp.asarray(crandn(B, Nt, Nr))
    x_hat, trace = annealed_langevin_posterior(
        score_fn, jnp.asarray(A), jnp.asarray(Y), sigmas,
        jnp.float32(noise_power), x0, jax.random.key(1),
        alpha_step=1e-6, beta_noise=0.001, steps_each=6,
        oracle=jnp.asarray(H))
    x_hat = np.asarray(x_hat)
    nmse = (np.abs(x_hat - H) ** 2).sum((-1, -2)) / (
        np.abs(H) ** 2).sum((-1, -2))
    db = 10 * np.log10(nmse.mean())
    db_lmmse = 10 * np.log10(nmse_lmmse.mean())
    # the sampler must achieve LMMSE-optimal accuracy within 0.15 dB
    assert db < db_lmmse + 0.15, (db, db_lmmse)
    # and the iterate itself must be close to the closed-form solution
    rel = (np.abs(x_hat - H_lmmse) ** 2).sum() / (np.abs(H_lmmse) ** 2).sum()
    assert rel < 10 ** (-20 / 10), 10 * np.log10(rel)  # < −20 dB from LMMSE
    # the NMSE trace improves from the random init toward the optimum
    tr = np.asarray(trace).mean(-1)
    assert tr[-1] < 0.5 * tr[0]


def test_trained_pipeline_loss_band():
    """Fixed-seed tiny DSM run reproduces its loss band (golden)."""
    cfg = Config(
        model=ModelConfig(ngf=8, num_classes=12),
        training=TrainingConfig(batch_size=8, n_epochs=8, log_every_steps=4),
        data=DataConfig(num_channels=16),
        sampling=SamplingConfig(),
    )
    trainer = ScoreTrainer(cfg, use_mesh=False)
    _, logs = trainer.train(log_fn=lambda s: None)
    tl = np.asarray(logs["train_loss"])
    final = float(np.mean(tl[-8:]))
    # pinned on 2026-08-17 (CPU, highest matmul precision, measured 1129.6):
    # re-pin only for an understood change to data gen, init, or trainer
    assert np.all(np.isfinite(tl))
    assert 1000.0 < final < 1260.0, final
    # and training makes progress: late loss below the early plateau
    assert final < np.mean(tl[:4]) - 30.0, (final, np.mean(tl[:4]))
