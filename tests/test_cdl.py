"""CDL channel generator sanity (replaces MATLAB generate_data.m path)."""

import numpy as np
import pytest

from score_based_channels_tpu.data.cdl import CDL_PROFILES, generate_cdl_channels
from score_based_channels_tpu.data.dataset import ChannelDataset
from score_based_channels_tpu.config import Config, DataConfig
import dataclasses


def test_profiles_power_normalized():
    for name, prof in CDL_PROFILES.items():
        p = 10 ** (prof.rows[:, 1] / 10.0)
        assert p.sum() > 0


@pytest.mark.parametrize("profile", ["CDL-A", "CDL-B", "CDL-C", "CDL-D"])
def test_generate_shapes_and_power(profile):
    H = generate_cdl_channels(seed=1234, profile=profile, num_channels=8,
                              num_rx=16, num_tx=64)
    assert H.shape == (8, 10, 16, 64)
    assert H.dtype == np.complex64
    # unit average entry power (SNR definition assumption, test_ml.py comments)
    power = np.mean(np.abs(H) ** 2)
    assert 0.3 < power < 3.0, power


def test_determinism():
    a = generate_cdl_channels(seed=7, profile="CDL-C", num_channels=2)
    b = generate_cdl_channels(seed=7, profile="CDL-C", num_channels=2)
    np.testing.assert_array_equal(a, b)
    c = generate_cdl_channels(seed=8, profile="CDL-C", num_channels=2)
    assert np.abs(a - c).max() > 1e-3


def test_spatial_correlation_structure():
    """CDL channels must be spatially correlated (low-dimensional), unlike iid."""
    H = generate_cdl_channels(seed=0, profile="CDL-C", num_channels=32)[:, 0]
    flat = H.reshape(32, -1)
    # effective rank of per-realization channel matrices should be well below
    # min(Nr, Nt) for a clustered model
    s = np.linalg.svd(H[0], compute_uv=False)
    energy = np.cumsum(s**2) / np.sum(s**2)
    k90 = int(np.searchsorted(energy, 0.9)) + 1
    assert k90 <= 8, f"expected low-rank channel, 90% energy needs {k90} modes"
    assert flat.shape == (32, 16 * 64)


def test_dataset_global_norm_and_views():
    cfg = Config()
    data = dataclasses.replace(cfg.data, num_channels=12)
    ds = ChannelDataset(1234, data, norm="global")
    assert len(ds) == 12
    assert ds.mean == 0.0
    normed = np.asarray(ds.normalized())
    np.testing.assert_allclose(np.std(normed), 1.0, rtol=1e-3)
    herm = np.asarray(ds.hermitian())
    assert herm.shape == (12, 64, 16)
    np.testing.assert_allclose(herm, np.conj(np.transpose(normed, (0, 2, 1))),
                               rtol=1e-5)
    x = np.asarray(ds.network_input())
    assert x.shape == (12, 64, 16, 2)


def test_dataset_batch_contract():
    import jax

    cfg = Config()
    data = dataclasses.replace(cfg.data, num_channels=6, num_pilots=38)
    ds = ChannelDataset(4321, data, norm="global")
    batch = ds.sample_batch(jax.random.key(0))
    assert batch["H"].shape == (6, 16, 64)
    assert batch["H_herm"].shape == (6, 64, 16, 2)
    assert batch["P"].shape == (6, 64, 38)
    assert batch["P_herm"].shape == (6, 38, 64)
    assert batch["Y"].shape == (6, 16, 38)
    assert batch["Y_herm"].shape == (6, 38, 16)
    assert batch["eig1"].shape == (6,)
    # Y = H·P exactly (noise_std=0 in the train config, loaders.py:77-80)
    Y = np.asarray(batch["Y"])
    HP = np.asarray(batch["H_herm_cplx"]).conj().transpose(0, 2, 1) @ np.asarray(batch["P"])
    np.testing.assert_allclose(Y, HP, rtol=1e-4, atol=1e-4)
    # eig1 is the largest eigenvalue of P·Pᴴ
    P0 = np.asarray(batch["P"])[0]
    ev = np.linalg.eigvalsh(P0 @ P0.conj().T)
    np.testing.assert_allclose(batch["eig1"][0], ev[-1], rtol=1e-3)


def test_io_roundtrip(tmp_path):
    from score_based_channels_tpu.data.io import load_output_h, save_output_h

    H = generate_cdl_channels(seed=3, profile="CDL-C", num_channels=3)
    for ext in ("npz", "mat"):
        p = str(tmp_path / f"x.{ext}")
        save_output_h(p, H)
        back = load_output_h(p)
        np.testing.assert_allclose(back, H, rtol=1e-6)


def test_dataset_file_source_roundtrip(tmp_path):
    """generate → save artifact → load via source='file' (reference naming)."""
    import jax
    from score_based_channels_tpu.data.io import save_output_h
    from score_based_channels_tpu.data.dataset import channel_filename
    from score_based_channels_tpu.data.cdl import generate_cdl_channels

    H = generate_cdl_channels(seed=4321, profile="CDL-C", num_channels=5)
    path = channel_filename(str(tmp_path), "CDL-C", 64, 16, 0.5, 4321)
    save_output_h(path, H)

    cfg = Config()
    data = dataclasses.replace(cfg.data, source="file",
                               data_dir=str(tmp_path), num_channels=5)
    ds = ChannelDataset(4321, data, norm="global")
    assert len(ds) == 5
    np.testing.assert_allclose(ds.channels, H[:, 0], rtol=1e-6)


def test_dataset_multiple_spacings_concatenate():
    cfg = Config()
    data = dataclasses.replace(cfg.data, spacing_list=(0.5, 0.25),
                               num_channels=4)
    ds = ChannelDataset(1234, data, norm="global")
    assert len(ds) == 8  # 4 per spacing (loaders.py:36-38 reshape)


def test_dataset_entrywise_norm():
    cfg = Config()
    data = dataclasses.replace(cfg.data, num_channels=6)
    ds = ChannelDataset(1234, data, norm="entrywise")
    assert np.asarray(ds.mean).shape == (16, 64)
    normed = ds.normalized()
    np.testing.assert_allclose(np.abs(normed.mean(0)), 0, atol=1e-5)
    np.testing.assert_allclose(normed.std(0), 1.0, rtol=1e-3)
