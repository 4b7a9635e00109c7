"""LDAMP model + trainer at tiny settings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from score_based_channels_tpu import cplx
from score_based_channels_tpu.config import Config, DataConfig
from score_based_channels_tpu.models.ldamp import LDAMP
from score_based_channels_tpu.models.unet import NormUnet, Unet
from score_based_channels_tpu.train.ldamp import (
    LDAMPTrainConfig, train_ldamp_snr,
)


def test_unet_shapes():
    model = Unet(out_chans=2, chans=8, num_pool_layers=3)
    x = jnp.zeros((2, 64, 16, 2))
    params = model.init(jax.random.key(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 64, 16, 2)


def test_normunet_residual_identity_at_zero():
    """FlippedNormUnet returns x − f(x); with x≠0 output differs from x."""
    model = NormUnet(chans=8, num_pools=2, residual=True)
    x = jax.random.normal(jax.random.key(1), (2, 64, 16, 2))
    params = model.init(jax.random.key(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == x.shape
    assert float(jnp.abs(y - x).max()) > 0  # the denoiser subtracts something


def test_normunet_pads_non16_shapes():
    model = NormUnet(chans=8, num_pools=2)
    x = jax.random.normal(jax.random.key(1), (1, 20, 10, 2))
    params = model.init(jax.random.key(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == x.shape


def test_ldamp_forward_shapes():
    model = LDAMP(max_unrolls=2, chans=8, num_pools=2)
    B, Np, Nt, Nr = 2, 38, 64, 16
    key = jax.random.key(0)
    kp, ky, km, ki = jax.random.split(key, 4)
    P2 = cplx.qpsk_pilots(kp, B, Nt, Np)
    P_herm = cplx.conj_transpose(P2)
    Y = cplx.randn(ky, (B, Np, Nr))
    eig = jnp.full((B,), 100.0)
    params = model.init(ki, Y, P_herm, eig, km, 2)["params"]
    h = model.apply({"params": params}, Y, P_herm, eig, km, 2)
    assert h.shape == (B, Nt, Nr, 2)
    assert bool(jnp.all(jnp.isfinite(h)))


def test_ldamp_training_reduces_loss():
    cfg = Config(data=DataConfig(num_channels=12))
    tc = LDAMPTrainConfig(max_unrolls=2, chans=8, num_pools=2,
                          batch_size=12, n_epochs=6)
    params, logs = train_ldamp_snr(cfg, train_snr=20.0, tc=tc,
                                   log_fn=lambda s: None)
    losses = logs["loss_log"]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
