"""estimate --save_channels → link simulation integration (tiny, CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from score_based_channels_tpu import cplx
from score_based_channels_tpu.config import Config, DataConfig, ModelConfig
from score_based_channels_tpu.comms.link import run_link_simulation
from score_based_channels_tpu.eval import run_estimation


def test_save_channels_and_link(tmp_path):
    cfg = Config(model=ModelConfig(ngf=8, num_classes=5),
                 data=DataConfig(num_channels=8))
    zero = lambda x, s: jnp.zeros_like(x)
    path = str(tmp_path / "channels.npz")
    res = run_estimation(
        zero, cfg, snr_range=np.array([0.0, 10.0]), num_channels=6,
        stop_steps=np.array([3, 9]), save_channels_to=path)

    with np.load(path) as f:
        est = f["est_sp0_al0"]
        oracle = f["oracle_sp0_al0"]
        assert est.shape == (2, 6, 64, 16)
        assert oracle.shape == (6, 64, 16)
        assert np.iscomplexobj(est) and np.iscomplexobj(oracle)
        # captured estimates at the stop step equal the traced NMSE there
        for s, stop in enumerate([3, 9]):
            nm = (np.abs(est[s] - oracle) ** 2).sum((-1, -2)) / \
                 (np.abs(oracle) ** 2).sum((-1, -2))
            np.testing.assert_allclose(nm, res.nmse_log[0, 0, s, stop],
                                       rtol=1e-4)

        H_true = np.conj(np.swapaxes(oracle, -1, -2))
        H_est = np.conj(np.swapaxes(est, -1, -2))
        link = run_link_simulation(
            H_true, cplx.from_complex(H_est),
            snr_range=np.array([0.0, 10.0]), num_bp_iters=8)
        assert link.ber_est.shape == (2,)
        assert np.all(np.isfinite(link.ber_est))
