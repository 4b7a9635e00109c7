"""Covariance-quality study for the LMMSE warm start / baseline.

Compares measurement-domain LMMSE on held-out val channels using:
  - Cov_emp(2k)  : train-set covariance (Marchenko-Pastur-noisy, q=0.5)
  - Cov_emp(20k) : 20k generated channels (q=0.05)
  - Cov_analytic : TR 38.901 tables (conjugated to the H^H data layout)
  - blends       : (1-rho) emp + rho analytic
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import dataclasses
import numpy as np

from score_based_channels_tpu.data.dataset import ChannelDataset
from score_based_channels_tpu.config import Config
from score_based_channels_tpu.eval.chanstats import analytic_full_covariance

cfg = Config()
train_ds = ChannelDataset(1234, dataclasses.replace(cfg.data,
                                                    num_channels=2000),
                          norm="global")
val_ds = ChannelDataset(4321, dataclasses.replace(cfg.data,
                                                  num_channels=500),
                        norm=list(train_ds.norm_stats))
Hval = np.asarray(val_ds.hermitian(normalized=True))[:64]
n = 64 * 16


def cov_of(H):
    V = H.reshape(H.shape[0], -1, order="F")
    return (V.T @ V.conj()) / V.shape[0]


Cov2k = cov_of(np.asarray(train_ds.hermitian(normalized=True)))

with np.load("data/CDL-C_Nt64_Nr16_ULA0.50_seed777.npz") as f:
    h20 = f["output_h"][:, 0]                     # (N, Nr, Nt) complex
# same normalization convention as the loader: use the TRAIN std
H20 = np.conj(np.swapaxes(h20, -1, -2)) / train_ds.norm_stats[1]
Cov20k = cov_of(H20)
print("20k per-entry var:", float(np.mean(np.abs(H20) ** 2)))

CovA = analytic_full_covariance("CDL-C").conj()   # data layout = conj

rng = np.random.default_rng(0)
Np_ = 38
P = (rng.choice([-1.0, 1.0], (64, Np_))
     + 1j * rng.choice([-1.0, 1.0], (64, Np_))) / np.sqrt(2)
A = P.conj().T
M = np.kron(np.eye(16), A)
Xs = Hval.reshape(64, -1, order="F").T            # wait: Hval is (64,64,16)
Xs = Hval.reshape(Hval.shape[0], -1, order="F").T  # (n, B)
B = Xs.shape[1]
den_each = np.sum(np.abs(Xs) ** 2, axis=0)

W = (rng.standard_normal((M.shape[0], B))
     + 1j * rng.standard_normal((M.shape[0], B))) / np.sqrt(2)

covs = {"emp2k": Cov2k, "emp20k": Cov20k, "analytic": CovA,
        "blend.5(20k,ana)": 0.5 * Cov20k + 0.5 * CovA,
        "blend.2ana(20k)": 0.8 * Cov20k + 0.2 * CovA}
print(f"{'snr':>5} " + " ".join(f"{k:>16}" for k in covs))
for snr in (-10.0, 0.0, 10.0, 20.0, 30.0):
    npow = 10 ** (-snr / 10) * 64
    Y = M @ Xs + np.sqrt(npow) * W
    row = []
    for k, C in covs.items():
        Gy = M @ C @ M.conj().T + npow * np.eye(M.shape[0])
        xh = C @ M.conj().T @ np.linalg.solve(Gy, Y)
        nm = (np.sum(np.abs(xh - Xs) ** 2, 0) / den_each).mean()
        row.append(10 * np.log10(nm))
    print(f"{snr:5.0f} " + " ".join(f"{v:16.2f}" for v in row))
