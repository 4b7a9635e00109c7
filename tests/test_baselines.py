"""LS / Lasso / MMSE baseline correctness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from score_based_channels_tpu import cplx, physics
from score_based_channels_tpu.baselines.lasso import (
    fista_l1_lifted, lifted_fourier_dicts, run_lasso_baseline,
)
from score_based_channels_tpu.baselines.ls import ls_estimate, run_ls_baseline
from score_based_channels_tpu.baselines.mmse import run_mmse_estimation
from score_based_channels_tpu.config import Config, DataConfig, ModelConfig


def tiny_cfg(**kw):
    cfg = Config(model=ModelConfig(ngf=8, num_classes=6),
                 data=DataConfig(num_channels=8))
    return cfg


def test_ls_matches_numpy_normal_equations():
    key = jax.random.key(0)
    kp, kx, km = jax.random.split(key, 3)
    B, Nt, Nr, Np = 3, 64, 16, 38
    P2 = cplx.qpsk_pilots(kp, B, Nt, Np)
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.randn(kx, (B, Nt, Nr))
    noise = 0.5
    Y2 = physics.measure_c2(km, A2, X2, noise)

    est = ls_estimate(A2, Y2, noise)

    A = cplx.to_complex(A2)
    Y = cplx.to_complex(Y2)
    for b in range(B):
        G = A[b].conj().T @ A[b] + noise * np.eye(Nt)
        want = np.linalg.solve(G, A[b].conj().T @ Y[b])
        np.testing.assert_allclose(cplx.to_complex(est[b]), want,
                                   rtol=2e-2, atol=2e-3)


def test_ls_overdetermined_noiseless_recovers_exactly():
    key = jax.random.key(1)
    kp, kx = jax.random.split(key)
    P2 = cplx.qpsk_pilots(kp, 2, 64, 64)
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.randn(kx, (2, 64, 16))
    Y2 = cplx.matmul(A2, X2)
    est = ls_estimate(A2, Y2, 1e-6)
    assert float(cplx.nmse(est, X2).max()) < 1e-4


def test_ls_baseline_runner_shapes():
    cfg = tiny_cfg()
    res = run_ls_baseline(cfg, snr_range=np.array([0.0, 10.0]),
                          num_channels=4)
    assert res.nmse.shape == (1, 1, 2, 4)
    # higher SNR must help LS
    assert res.nmse.mean(-1)[0, 0, 1] < res.nmse.mean(-1)[0, 0, 0]


def test_lifted_dict_synthesizes_dense_signals():
    """A single dictionary atom must synthesize a rank-1 2-D Fourier mode."""
    L, R = lifted_fourier_dicts(8, 4, lifting=2)
    assert L.shape == (8, 16) and R.shape == (8, 4)
    Z = np.zeros((16, 8), np.complex64)
    Z[3, 2] = 1.0
    H = L @ Z @ R
    assert H.shape == (8, 4)
    np.testing.assert_allclose(np.abs(H), np.abs(H[0, 0]), rtol=1e-4)


def test_fista_recovers_sparse_signal():
    """Noiseless full pilots + truly sparse Z → FISTA must reconstruct H."""
    rng = np.random.default_rng(0)
    Nt, Nr, lift = 16, 8, 2
    L, R = lifted_fourier_dicts(Nt, Nr, lift)
    Z = np.zeros((Nt * lift, Nr * lift), np.complex64)
    for _ in range(3):
        Z[rng.integers(Nt * lift), rng.integers(Nr * lift)] = (
            rng.standard_normal() + 1j * rng.standard_normal())
    H = (L @ Z @ R).astype(np.complex64)

    kp = jax.random.key(2)
    P2 = cplx.qpsk_pilots(kp, 1, Nt, Nt)  # full pilots
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.from_complex(H[None])
    Y2 = cplx.matmul(A2, X2)

    est, trace = fista_l1_lifted(
        A2, Y2, cplx.from_complex(L), cplx.from_complex(R),
        lmbda=1e-4, lr=2e-2, num_iters=400, oracle2=X2)
    assert trace.shape == (400, 1)
    final = float(trace[-1, 0])
    assert final < 1e-2, f"FISTA failed to reconstruct: NMSE {final}"
    # trace should be decreasing overall
    assert final < float(trace[0, 0])


def test_lasso_runner_shapes():
    cfg = tiny_cfg()
    res = run_lasso_baseline(cfg, snr_range=np.array([10.0]),
                             num_iters=30, num_channels=3)
    assert res.nmse_log.shape == (1, 1, 1, 1, 3)
    assert res.complete_log.shape == (1, 1, 1, 1, 30, 3)
    assert np.all(np.isfinite(res.best_nmse))


def test_mmse_posterior_averaging_runs():
    cfg = tiny_cfg()
    zero = lambda x, s: jnp.zeros_like(x)
    res = run_mmse_estimation(zero, cfg, snr_range=np.array([10.0]),
                              num_channels=3, mmse_avg=4)
    assert res.nmse_mean_est.shape == (1, 3)
    assert res.nmse_single.shape == (1, 3)
    # averaging posterior samples must not hurt vs a single sample (on avg)
    assert res.nmse_mean_est.mean() <= res.nmse_single.mean() * 1.2


def test_mmse_chunk_padding_larger_than_batch():
    """chunk_size > B: the pad must still produce whole-chunk batches
    (one compiled shape) and identical results to the unchunked run
    (ADVICE r4: the old single-tile pad under-filled when ext > B)."""
    cfg = tiny_cfg()
    zero = lambda x, s: jnp.zeros_like(x)
    kw = dict(snr_range=np.array([10.0]), num_channels=2, mmse_avg=3)
    a = run_mmse_estimation(zero, cfg, **kw)  # B = 6, one chunk
    b = run_mmse_estimation(zero, cfg, **kw, chunk_size=16)  # pad 6 → 16
    np.testing.assert_allclose(a.nmse_mean_est, b.nmse_mean_est,
                               rtol=1e-5, atol=1e-7)


def test_em_bg_amp_recovers_sparse_signal():
    """Noiseless-ish full pilots + sparse Z → AMP must reconstruct."""
    from score_based_channels_tpu.baselines.amp import em_bg_amp
    from score_based_channels_tpu.baselines.lasso import lifted_fourier_dicts

    rng = np.random.default_rng(0)
    Nt, Nr, lift = 16, 8, 2
    L, R = lifted_fourier_dicts(Nt, Nr, lift)
    Z = np.zeros((Nt * lift, Nr * lift), np.complex64)
    for _ in range(3):
        Z[rng.integers(Nt * lift), rng.integers(Nr * lift)] = (
            rng.standard_normal() + 1j * rng.standard_normal())
    H = (L @ Z @ R).astype(np.complex64)

    P2 = cplx.qpsk_pilots(jax.random.key(2), 1, Nt, Nt)
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.from_complex(H[None])
    Y2 = cplx.matmul(A2, X2)
    Y2 = Y2 + 1e-3 * cplx.randn(jax.random.key(3), Y2.shape[:-1])

    _, trace = em_bg_amp(A2, Y2, cplx.from_complex(L), cplx.from_complex(R),
                         num_iters=180, oracle2=X2)
    assert trace.shape == (180, 1)
    best = float(np.nanmin(np.asarray(trace)))
    # robust (adaptive-damping) GAMP converges to near the noise floor
    assert best < 5e-3, f"AMP failed: best NMSE {best}"


def test_em_gm_amp_beats_bg_on_heavy_tailed_signal():
    """A GM-distributed sparse signal (two active-coefficient scales, 30 dB
    apart) is the case the mixture prior exists for (Vila & Schniter;
    the reference's heavy_tailed EMGMAMP config, test_em_gm_amp.m:55):
    K=3 EM-GM-AMP must recover it better than the BG special case."""
    from score_based_channels_tpu.baselines.amp import em_bg_amp, em_gm_amp
    from score_based_channels_tpu.baselines.lasso import lifted_fourier_dicts

    rng = np.random.default_rng(42)
    Nt, Nr, lift = 16, 8, 2
    L, R = lifted_fourier_dicts(Nt, Nr, lift)
    Z = np.zeros((Nt * lift, Nr * lift), np.complex64)
    crand = lambda: rng.standard_normal() + 1j * rng.standard_normal()
    for _ in range(4):  # strong components
        Z[rng.integers(Nt * lift), rng.integers(Nr * lift)] = 30.0 * crand()
    for _ in range(12):  # weak components, 30 dB down
        Z[rng.integers(Nt * lift), rng.integers(Nr * lift)] = crand()
    H = (L @ Z @ R).astype(np.complex64)

    P2 = cplx.qpsk_pilots(jax.random.key(5), 1, Nt, Nt)
    A2 = cplx.conj_transpose(P2)
    X2 = cplx.from_complex(H[None])
    Y2 = cplx.matmul(A2, X2)
    Y2 = Y2 + 1e-2 * cplx.randn(jax.random.key(7), Y2.shape[:-1])

    L2, R2 = cplx.from_complex(L), cplx.from_complex(R)
    _, tr_gm = em_gm_amp(A2, Y2, L2, R2, num_iters=80, num_components=3,
                         oracle2=X2)
    _, tr_bg = em_bg_amp(A2, Y2, L2, R2, num_iters=80, oracle2=X2)
    best_gm = float(np.nanmin(np.asarray(tr_gm)))
    best_bg = float(np.nanmin(np.asarray(tr_bg)))
    # the mixture must recover the signal well...
    assert best_gm < 0.05, best_gm
    # ...and strictly better than the single-variance BG prior
    assert best_gm < best_bg, (best_gm, best_bg)


def test_amp_runner_shapes():
    from score_based_channels_tpu.baselines.amp import run_amp_baseline

    cfg = tiny_cfg()
    res = run_amp_baseline(cfg, snr_range=np.array([-10.0, 30.0]),
                           num_iters=25, num_channels=4)
    assert res.nmse_trace.shape == (2, 25, 4)
    db = res.best_db()
    assert np.all(np.isfinite(db))
    assert db[1] < db[0]  # higher SNR helps
