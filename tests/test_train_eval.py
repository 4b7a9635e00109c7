"""Trainer + eval-harness integration at tiny settings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_channels_tpu.config import (
    Config, DataConfig, ModelConfig, SamplingConfig, TrainingConfig,
)
from score_based_channels_tpu.eval import (
    run_estimation, run_hparam_search, score_fn_from_params,
)
from score_based_channels_tpu.models import make_score_model
from score_based_channels_tpu.train import ScoreTrainer
from score_based_channels_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def tiny_config(num_classes=12, ngf=8, num_channels=16) -> Config:
    cfg = Config(
        model=ModelConfig(ngf=ngf, num_classes=num_classes),
        training=TrainingConfig(batch_size=8, n_epochs=2, log_every_steps=2),
        data=DataConfig(num_channels=num_channels),
        sampling=SamplingConfig(),
    )
    return cfg


def test_trainer_runs_and_checkpoints(tmp_path):
    cfg = tiny_config()
    trainer = ScoreTrainer(cfg, use_mesh=False)
    path = str(tmp_path / "ckpt.npz")
    logs_seen = []
    state, logs = trainer.train(checkpoint_path=path,
                                log_fn=lambda s: logs_seen.append(s))
    assert int(state.step) == 2 * (16 // 8)
    assert np.all(np.isfinite(logs["train_loss"]))
    assert len(logs["val_loss"]) >= 1

    ck = load_checkpoint(path)
    assert ck["config"].model.ngf == cfg.model.ngf
    # params round-trip exactly
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(ck["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ck["ema"] is not None


def test_trainer_data_parallel_matches_single_device():
    cfg = tiny_config()
    t1 = ScoreTrainer(cfg, use_mesh=False)
    t8 = ScoreTrainer(cfg, use_mesh=True)  # 8 virtual CPU devices
    s1, logs1 = t1.train(n_epochs=1, log_fn=lambda s: None)
    s8, logs8 = t8.train(n_epochs=1, log_fn=lambda s: None)
    np.testing.assert_allclose(logs1["train_loss"], logs8["train_loss"],
                               rtol=5e-3, atol=1e-4)


def test_ema_differs_from_params_after_training():
    cfg = tiny_config()
    trainer = ScoreTrainer(cfg, use_mesh=False)
    state, _ = trainer.train(n_epochs=1, log_fn=lambda s: None)
    pa = jax.tree_util.tree_leaves(state.params)
    ea = jax.tree_util.tree_leaves(state.ema_params)
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(pa, ea)]
    assert max(diffs) > 0  # EMA lags params


def test_eval_harness_shapes_and_layout():
    cfg = tiny_config(num_classes=6)
    model = make_score_model(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 16, 2)),
                        jnp.float32(1.0))["params"]
    score_fn = score_fn_from_params(model, params)
    res = run_estimation(
        score_fn, cfg, snr_range=np.array([0.0, 20.0]),
        pilot_alpha_range=(0.6, 1.0), num_channels=4, chunk_size=None)
    S, steps = 2, 6 * cfg.sampling.steps_each
    assert res.nmse_log.shape == (1, 2, S, steps, 4)
    assert res.avg_nmse.shape == (1, 2, S, steps)
    assert res.best_nmse.shape == (1, 2, S)
    assert np.all(np.isfinite(res.best_nmse))
    # best over steps really is the min of avg
    np.testing.assert_allclose(res.best_nmse, res.avg_nmse.min(-1))


def test_eval_chunking_invariance():
    """Chunked execution must give identical results to one-shot."""
    cfg = tiny_config(num_classes=5)
    zero = lambda x, s: jnp.zeros_like(x)
    kwargs = dict(snr_range=np.array([10.0]), num_channels=6, seed=11)
    a = run_estimation(zero, cfg, **kwargs, chunk_size=None)
    b = run_estimation(zero, cfg, **kwargs, chunk_size=4)
    np.testing.assert_allclose(a.nmse_log, b.nmse_log, rtol=1e-5, atol=1e-7)


def test_tuner_grid_selection():
    cfg = tiny_config(num_classes=5)
    zero = lambda x, s: jnp.zeros_like(x)
    res = run_hparam_search(
        zero, cfg, snr_range=np.array([0.0, 30.0]),
        alpha_step_range=(3e-11, 3e-6), beta_noise_range=(0.01, 0.0),
        num_channels=4)
    assert res.nmse_log.shape == (2, 2, 2, 15, 4)
    assert res.best_alpha_snr.shape == (2,)
    assert set(res.best_alpha_snr) <= {3e-11, 3e-6}
    assert set(res.best_beta_snr) <= {0.01, 0.0}
    # selection really is the per-SNR argmin over the grid
    np.testing.assert_allclose(res.best_nmse, res.avg_nmse.min(-1))
    for s in range(2):
        iA = list(res.alpha_step_range).index(res.best_alpha_snr[s])
        iB = list(res.beta_noise_range).index(res.best_beta_snr[s])
        assert res.best_nmse[iA, iB, s] == res.best_nmse[..., s].min()
        assert res.best_step_snr[s] == res.avg_nmse[iA, iB, s].argmin()


def test_tuner_blind_selection_and_slim_save(tmp_path):
    """Blind-SNR protocol (plot_ood_results.py:12-14): ONE (alpha, beta,
    step) for the whole sweep, chosen by mean-over-SNR dB-NMSE; slim save
    round-trips the selection tables without the ~350 MB nmse_log."""
    cfg = tiny_config(num_classes=5)
    zero = lambda x, s: jnp.zeros_like(x)
    res = run_hparam_search(
        zero, cfg, snr_range=np.array([0.0, 30.0]),
        alpha_step_range=(3e-11, 3e-6), beta_noise_range=(0.01, 0.0),
        num_channels=4)
    b_alpha, b_beta, b_step = res.blind_selection()
    # the selection minimizes the mean-over-SNR dB NMSE over (combo, step)
    db = 10 * np.log10(np.where(np.isfinite(res.avg_nmse),
                                res.avg_nmse, np.inf))
    score = db.mean(axis=2)
    iA = list(res.alpha_step_range).index(b_alpha)
    iB = list(res.beta_noise_range).index(b_beta)
    assert score[iA, iB, b_step] == score.min()
    # slim save: selection tables present, per-step log absent, blind row
    # equals the avg_nmse slice at the blind selection
    path = str(tmp_path / "slim.npz")
    res.save_slim(path)
    with np.load(path) as f:
        assert "nmse_log" not in f.files and "avg_nmse" not in f.files
        assert float(f["blind_alpha"]) == b_alpha
        assert int(f["blind_step"]) == b_step
        np.testing.assert_allclose(
            f["blind_nmse"], res.avg_nmse[iA, iB, :, b_step])


def test_mesh_sharded_eval_matches():
    from score_based_channels_tpu.parallel import make_mesh

    cfg = tiny_config(num_classes=4)
    zero = lambda x, s: jnp.zeros_like(x)
    kwargs = dict(snr_range=np.array([10.0]), num_channels=8, seed=3)
    a = run_estimation(zero, cfg, **kwargs)
    b = run_estimation(zero, cfg, **kwargs, mesh=make_mesh())
    np.testing.assert_allclose(a.nmse_log, b.nmse_log, rtol=1e-5, atol=1e-7)


def test_strided_shortcut_inference():
    """level_stride subsamples the schedule and scales alpha; shapes and
    finiteness hold, and a strided run is a valid (shorter) trace."""
    cfg = tiny_config(num_classes=12)
    zero = lambda x, s: jnp.zeros_like(x)
    full = run_estimation(zero, cfg, snr_range=np.array([10.0]),
                          num_channels=4, seed=2)
    strided = run_estimation(zero, cfg, snr_range=np.array([10.0]),
                             num_channels=4, seed=2, level_stride=3)
    assert full.nmse_log.shape[3] == 12 * 3
    assert strided.nmse_log.shape[3] == 5 * 3  # 12/3=4 levels + sigma_end
    assert np.all(np.isfinite(strided.best_nmse))


def test_warm_start_lmmse_truncated_schedule():
    """estimate --init lmmse --sigma_start: with a zero score and zero
    alpha-free... the warm-start mode must (a) truncate the schedule at
    sigma_start, (b) start the chain AT the LMMSE estimate (first-step
    NMSE ~ the LMMSE NMSE, far below the noise-init first step), and
    (c) keep the min-over-steps at least as good as the init."""
    import dataclasses as _dc

    cfg = tiny_config(num_classes=40, num_channels=32)
    # tiny schedule must actually reach below sigma_start
    cfg = cfg.replace(model=_dc.replace(cfg.model, sigma_rate=0.8))
    zero = lambda x, s: jnp.zeros_like(x)
    kw = dict(snr_range=np.array([10.0]), num_channels=6, seed=3)
    cold = run_estimation(zero, cfg, **kw)
    warm = run_estimation(zero, cfg, **kw, init="lmmse", sigma_start=0.5)
    # (a) truncation: fewer recorded steps
    assert warm.nmse_log.shape[3] < cold.nmse_log.shape[3]
    # (b) warm chain starts near the LMMSE solution
    first_cold = cold.avg_nmse[0, 0, 0, 0]
    first_warm = warm.avg_nmse[0, 0, 0, 0]
    assert first_warm < 0.5 * first_cold
    # (c) best-over-steps no worse than ~the init point
    assert warm.best_nmse[0, 0, 0] <= first_warm * 1.05


def test_auto_init_with_stride_scales_warm_alpha():
    """--init auto + --stride: warm-branch chains must use the
    stride-compensated alpha (ADVICE r4), and the run stays finite."""
    import dataclasses as _dc

    from score_based_channels_tpu.baselines.lmmse import (
        empirical_covariance,
    )
    from score_based_channels_tpu.data.dataset import ChannelDataset
    from score_based_channels_tpu.eval.estimate import run_snr_sweep

    cfg = tiny_config(num_classes=24, num_channels=16)
    cfg = cfg.replace(model=_dc.replace(cfg.model, sigma_rate=0.8))
    train_ds = ChannelDataset(1234, cfg.data, norm="global")
    val_ds = ChannelDataset(4321, _dc.replace(cfg.data, num_channels=16),
                            norm=list(train_ds.norm_stats), num_pilots=38)
    cov = empirical_covariance(train_ds)
    calib = np.asarray(train_ds.hermitian_c2(normalized=True)[:8])
    zero = lambda x, s: jnp.zeros_like(x)
    kw = dict(snr_range=np.array([10.0]), num_channels=4,
              init="auto", sigma_start=1.0, init_cov=cov, auto_calib=calib)
    full = run_snr_sweep(zero, cfg, val_ds, key=jax.random.key(5), **kw)
    strided = run_snr_sweep(zero, cfg, val_ds, key=jax.random.key(5),
                            level_stride=2, **kw)
    assert np.all(np.isfinite(full)) and np.all(np.isfinite(strided))
    # strided trace is shorter but both protocols remain in the same
    # NMSE regime (a mis-scaled warm alpha diverges or stalls the chain)
    assert strided.shape[1] < full.shape[1]
    assert (10 * np.log10(strided.min(axis=1).mean())
            < 10 * np.log10(full[:, 0].mean()) + 3.0)


def test_ls_init_runs():
    import dataclasses as _dc

    cfg = tiny_config(num_classes=8, num_channels=16)
    cfg = cfg.replace(model=_dc.replace(cfg.model, sigma_rate=0.5))
    zero = lambda x, s: jnp.zeros_like(x)
    res = run_estimation(zero, cfg, snr_range=np.array([0.0]),
                         num_channels=4, init="ls", sigma_start=1.0)
    assert np.all(np.isfinite(res.best_nmse))


def test_lmmse_baseline_matches_dense_kron():
    """baselines/lmmse.py einsum path == explicit kron construction."""
    from score_based_channels_tpu.baselines.lmmse import lmmse_estimate

    rng = np.random.default_rng(0)
    Nt, Nr, Np_ = 8, 3, 5
    n = Nt * Nr
    Cov = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Cov = Cov @ Cov.conj().T
    A = rng.standard_normal((2, Np_, Nt)) + 1j * rng.standard_normal(
        (2, Np_, Nt))
    X = rng.standard_normal((2, Nt, Nr)) + 1j * rng.standard_normal(
        (2, Nt, Nr))
    Y = np.einsum("bpt,btr->bpr", A, X)
    npow = np.array([0.5, 2.0])
    xh, pred = lmmse_estimate(A, Y, npow, Cov, predict_mmse=True)
    for i in range(2):
        M = np.kron(np.eye(Nr), A[i])
        G = M @ Cov @ M.conj().T + npow[i] * np.eye(Np_ * Nr)
        w = np.linalg.solve(G, Y[i].reshape(-1, order="F"))
        ref = (Cov @ M.conj().T @ w).reshape(Nt, Nr, order="F")
        np.testing.assert_allclose(xh[i], ref, rtol=1e-5, atol=1e-6)
        mm = (np.trace(Cov) - np.trace(
            Cov @ M.conj().T @ np.linalg.solve(G, M @ Cov))).real \
            / np.trace(Cov).real
        np.testing.assert_allclose(pred[i], mm, rtol=1e-6)


def test_corrected_analytic_covariance_matches_empirical():
    """The random-coupling analytic covariance (round-3 correction) must
    match the generator's empirical covariance far better than the
    round-2 fixed-coupling form (which mismatched at rel-Frob ~0.96)."""
    import dataclasses as _dc

    from score_based_channels_tpu.data.dataset import ChannelDataset
    from score_based_channels_tpu.eval.chanstats import (
        analytic_full_covariance,
    )

    cfg = tiny_config()
    ds = ChannelDataset(
        99, _dc.replace(cfg.data, channel="CDL-C", num_channels=600),
        norm="global")
    H = np.asarray(ds.hermitian(normalized=True))
    V = H.reshape(H.shape[0], -1, order="F")
    emp = (V.T @ V.conj()) / V.shape[0]
    ana_rand = analytic_full_covariance("CDL-C", ray_coupling="random")
    ana_fix = analytic_full_covariance("CDL-C", ray_coupling="fixed")
    err_rand = np.linalg.norm(emp - ana_rand) / np.linalg.norm(emp)
    err_fix = np.linalg.norm(emp - ana_fix) / np.linalg.norm(emp)
    assert err_rand < 0.25, err_rand     # finite-sample floor ~0.1-0.2 @600
    assert err_fix > 2 * err_rand, (err_fix, err_rand)


def test_auto_protocol_residual_gating():
    """--init auto: matched channels warm-start at the LMMSE estimate,
    mismatched channels fall back to the full anneal (VERDICT r3 item 4).

    With a zero score the warm branch's first recorded NMSE sits at the
    LMMSE point; the fallback branch's sits at the noise-init level. The
    test drives both regimes: CDL-C channels against the CDL-C train
    covariance (matched → gated warm) and the same machinery with an
    identity covariance whose LMMSE estimate explains nothing (mismatch
    → full anneal)."""
    import dataclasses as _dc

    # a 256-channel train set so the empirical covariance actually spans
    # the CDL-C signal subspace (erank ~36) — with a rank-starved
    # covariance the matched residual itself exceeds the threshold, which
    # is correct behavior but not the regime under test
    cfg = tiny_config(num_classes=40, num_channels=256)
    cfg = cfg.replace(model=_dc.replace(cfg.model, sigma_rate=0.8))
    zero = lambda x, s: jnp.zeros_like(x)
    kw = dict(snr_range=np.array([10.0]), num_channels=6, seed=3)

    auto = run_estimation(zero, cfg, **kw, init="auto", sigma_start=0.5)
    warm = run_estimation(zero, cfg, **kw, init="lmmse", sigma_start=0.5)
    cold = run_estimation(zero, cfg, **kw)
    # matched data → auto ≈ warm at the end (same init, same active tail);
    # auto keeps the full-length trace (gated, not truncated)
    assert auto.nmse_log.shape[3] == cold.nmse_log.shape[3]
    assert abs(auto.best_nmse_db()[0, 0, 0]
               - warm.best_nmse_db()[0, 0, 0]) < 0.75
    # the frozen prefix of the matched chains is the LMMSE init
    assert auto.avg_nmse[0, 0, 0, 0] < 0.5 * cold.avg_nmse[0, 0, 0, 0]

    # mismatch: a garbage covariance makes the residual blow past the
    # threshold → every sample takes the noise-init full-anneal branch
    from score_based_channels_tpu.eval.estimate import run_snr_sweep
    from score_based_channels_tpu.data.dataset import ChannelDataset

    train_ds = ChannelDataset(1234, cfg.data, norm=cfg.data.norm_channels)
    val_ds = ChannelDataset(4321, cfg.data, norm=list(train_ds.norm_stats),
                            num_pilots=38)
    bad_cov = np.eye(64 * 16, dtype=np.complex128) * 1e-6
    nmse = run_snr_sweep(zero, cfg, val_ds, np.array([10.0]),
                         jax.random.key(0), num_channels=6, init="auto",
                         sigma_start=0.5, init_cov=bad_cov)
    nmse_cold = run_snr_sweep(zero, cfg, val_ds, np.array([10.0]),
                              jax.random.key(0), num_channels=6)
    # fallback = the reference noise-init protocol, step for step
    np.testing.assert_allclose(nmse, nmse_cold, rtol=1e-5)
