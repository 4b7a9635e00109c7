"""SURVEY.md Appendix A — the 10 key reference invariants, asserted directly.

Each numbered test corresponds to the checklist item of the same number.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from score_based_channels_tpu import cplx, physics
from score_based_channels_tpu.config import Config, DataConfig, ModelConfig
from score_based_channels_tpu.data.dataset import ChannelDataset
from score_based_channels_tpu.diffusion.dsm import anneal_dsm_loss
from score_based_channels_tpu.diffusion.sampling import (
    annealed_langevin_posterior_c2,
)
from score_based_channels_tpu.diffusion.sigmas import get_sigmas


def _ds(n=8, **kw):
    return ChannelDataset(1234, DataConfig(num_channels=n, **kw),
                          norm="global")


def test_1_channel_layout():
    """H loaded as (N, Nr=16, Nt=64) complex64 from subcarrier 0."""
    ds = _ds()
    assert ds.channels.shape == (8, 16, 64)
    assert ds.channels.dtype == np.complex64


def test_2_normalization_semantics():
    """Global: mean 0, std over the full complex tensor; val uses TRAIN stats."""
    train = _ds()
    assert train.mean == 0.0
    np.testing.assert_allclose(np.std(train.channels), train.std, rtol=1e-6)
    val = ChannelDataset(4321, DataConfig(num_channels=8),
                         norm=list(train.norm_stats))
    assert val.std == train.std and val.mean == train.mean


def test_3_network_input_is_hermitian_2ch():
    """Input = real-viewed H^H, (B, 64, 16, 2) (NHWC here)."""
    ds = _ds()
    x = np.asarray(ds.network_input())
    assert x.shape == (8, 64, 16, 2)
    want = np.conj(ds.normalized()).transpose(0, 2, 1)
    np.testing.assert_allclose(x[..., 0], want.real, rtol=1e-5)
    np.testing.assert_allclose(x[..., 1], want.imag, rtol=1e-5)


def test_4_forward_transform_and_sigma_division():
    """h = 2x − 1 at the input; output divided by σ."""
    from score_based_channels_tpu.models import make_score_model

    cfg = ModelConfig(ngf=8, num_classes=4)
    model = make_score_model(cfg)
    x = jnp.zeros((1, 64, 16, 2))
    params = model.init(jax.random.key(0), x, jnp.float32(1.0))["params"]
    o1 = model.apply({"params": params}, x, jnp.float32(1.0))
    o2 = model.apply({"params": params}, x, jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(o1), 2 * np.asarray(o2), rtol=1e-5)


def test_5_sigma_schedule_values():
    s = np.asarray(get_sigmas(39.15, 39.15 * 0.995**2310, 2311))
    np.testing.assert_allclose(s[0], 39.15, rtol=1e-6)
    np.testing.assert_allclose(s[-1], 3.665e-4, rtol=1e-3)
    np.testing.assert_allclose(s[1] / s[0], 0.995, rtol=1e-5)


def test_6_dsm_loss_weighting():
    """loss = ½‖s − (−z/σ²)‖²·σ^anneal_power, averaged over batch."""
    sigmas = jnp.asarray([2.0])

    def apply_fn(params, x, used):  # score net that returns zeros
        return jnp.zeros_like(x)

    key = jax.random.key(0)
    x = jnp.zeros((4, 2, 2, 2))
    loss = anneal_dsm_loss(apply_fn, None, x, sigmas, key, anneal_power=2.0)
    # with s=0: loss = ½·E‖z/σ²‖²·σ² = ½·D·(1/σ²)  (z std-normal · σ noise)
    d = 2 * 2 * 2
    expected = 0.5 * d  # E|σz/σ²|²·σ² summed = D
    assert abs(float(loss) - expected) / expected < 0.35  # stochastic


def test_7_langevin_update_rule():
    """One step with known quantities matches the closed form."""
    B, Nt, Nr, Np = 1, 4, 2, 3
    key = jax.random.key(1)
    A = cplx.randn(key, (B, Np, Nt))
    X = cplx.randn(jax.random.fold_in(key, 1), (B, Nt, Nr))
    Y = cplx.matmul(A, X)
    x0 = cplx.randn(jax.random.fold_in(key, 2), (B, Nt, Nr))
    sigmas = jnp.asarray([2.0, 1.0])
    noise, alpha_step = 0.5, 1e-3

    score_val = 0.123

    def sf(x, s):
        return jnp.full_like(x, score_val)

    xf, _ = annealed_langevin_posterior_c2(
        sf, A, Y, sigmas, noise, x0, jax.random.key(3),
        alpha_step=alpha_step, beta_noise=0.0, steps_each=1)

    x = x0
    for sigma in [2.0, 1.0]:
        alpha = alpha_step * (sigma / 1.0) ** 2
        mg = cplx.matmul(cplx.conj_transpose(A), cplx.matmul(A, x) - Y)
        x = x + alpha * (jnp.full_like(x, score_val)
                         - mg / (noise / 2.0 + sigma**2))
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_8_noise_power_and_snr_grid():
    np.testing.assert_allclose(
        float(physics.snr_to_noise_power(10.0, 64)), 6.4, rtol=1e-6)
    grid = np.arange(-10, 32.5, 2.5)
    assert len(grid) == 17 and grid[0] == -10 and grid[-1] == 30


def test_9_pilot_structure():
    P = cplx.qpsk_pilots(jax.random.key(2), 2, 64, int(np.floor(64 * 0.6)))
    assert P.shape == (2, 64, 38, 2)
    vals = np.unique(np.round(np.asarray(P) * np.sqrt(2)).astype(int))
    assert set(vals.tolist()) == {-1, 1}


def test_10_nmse_metric_and_selection():
    est = cplx.from_complex(np.full((2, 4, 4), 1.1 + 0j, np.complex64))
    orc = cplx.from_complex(np.ones((2, 4, 4), np.complex64))
    nm = np.asarray(cplx.nmse(est, orc))
    np.testing.assert_allclose(nm, 0.01, rtol=1e-4)
