"""Linear-MMSE (Wiener) channel estimator + the `estimate` warm start.

A capability the reference lacks (its linear baseline is regularized LS,
test_ml.py:132-144): the exact LMMSE estimator

    x̂ = C Mᴴ (M C Mᴴ + σ²I)⁻¹ y,   M = I_{Nr} ⊗ A,  A = P̄ᵀ

under either the TRAIN-set empirical covariance (default — what a
practical system can estimate) or the corrected analytic TR 38.901
covariance (eval/chanstats.py, ray_coupling="random").

Why it is first-class here (round-3 diagnosis, RESULTS.md): this
generator's CDL ensemble sums ~480 i.i.d.-phase ray terms per
realization, so it is near-Gaussian by the CLT, and the measured LMMSE
equals the corrected analytic genie bound to <0.1 dB at every SNR —
i.e. on THIS distribution LMMSE ≈ MMSE, and it is both the right
accuracy yardstick for the score-based path and the warm start that
lets `estimate --init lmmse` reach the bound with a single trajectory.

Dense 1024-dim solves with per-sample pilot matrices are a host/LAPACK
workload (complex128, m=Np·Nr=608 per solve), not an MXU one — the
per-eval cost (~seconds) is negligible next to the 6933-NFE sampler.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .. import cplx
from ..config import Config
from ..data.dataset import ChannelDataset

Array = np.ndarray


def empirical_covariance(train_ds: ChannelDataset) -> np.ndarray:
    """E[v vᴴ] of v = vec_F(H^H normalized) over the training set.

    Column-major vec over (Nt, Nr); complex128. 2000 training channels
    estimate this to within measurement noise of the analytic covariance
    (rel-Frobenius 0.04 at 20k samples; 2k already LMMSE-equivalent,
    scripts in round-3 diagnosis)."""
    H = np.asarray(train_ds.hermitian(normalized=True))
    V = H.reshape(H.shape[0], -1, order="F")
    return (V.T @ V.conj()) / V.shape[0]


def analytic_covariance(profile: str, num_rx: int = 16, num_tx: int = 64,
                        spacing: float = 0.5) -> np.ndarray:
    """Corrected analytic covariance in the data layout (see chanstats)."""
    from ..eval.chanstats import analytic_full_covariance

    return analytic_full_covariance(profile, num_rx, num_tx, spacing,
                                    ray_coupling="random", data_layout=True)


def lmmse_estimate(
    A: np.ndarray,            # (B, Np, Nt) complex — P̄ᵀ per sample
    Y: np.ndarray,            # (B, Np, Nr) complex measurements
    noise_power: np.ndarray,  # (B,) complex-entry noise power
    Cov: np.ndarray,          # (n, n) complex, n = Nt·Nr, vec_F layout
    predict_mmse: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Batched exact LMMSE. Returns (x̂ (B, Nt, Nr) complex64,
    predicted per-sample NMSE (B,) or None).

    Uses the Kronecker structure M = I⊗A via einsum instead of forming
    the 608×1024 operator: G₀ = (I⊗A)C(I⊗Aᴴ) and CMᴴ come from two
    tensor contractions per sample."""
    B, Np_, Nt = A.shape
    Nr = Y.shape[2]
    n = Nt * Nr
    C4 = np.ascontiguousarray(
        Cov.reshape(Nt, Nr, Nt, Nr, order="F"))  # [t, r, t', r']
    noise_power = np.broadcast_to(np.asarray(noise_power, np.float64), (B,))
    xhat = np.zeros((B, Nt, Nr), np.complex64)
    pred = np.zeros((B,), np.float64) if predict_mmse else None
    tr_C = np.trace(Cov).real
    eye = np.eye(Np_ * Nr)
    for i in range(B):
        Ai = A[i]
        # CMᴴ[t,r | q,s] = Σ_u C4[t,r,u,s]·conj(A[q,u])
        CMh = np.einsum("trus,qu->trqs", C4, Ai.conj(), optimize=True)
        # G₀[p,r | q,s] = Σ_t A[p,t]·CMᴴ[t,r,q,s]
        G0 = np.einsum("pt,trqs->prqs", Ai, CMh, optimize=True)
        m = Np_ * Nr
        G0 = G0.reshape(m, m, order="F")
        CMh = CMh.reshape(n, m, order="F")
        G = G0 + noise_power[i] * eye
        y = Y[i].reshape(-1, order="F")
        if predict_mmse:
            sol = np.linalg.solve(G, np.concatenate(
                [y[:, None], CMh.conj().T], axis=1))
            w, S = sol[:, 0], sol[:, 1:]
            pred[i] = (tr_C - np.sum(CMh.T * S).real) / tr_C
        else:
            w = np.linalg.solve(G, y)
        xhat[i] = (CMh @ w).reshape(Nt, Nr, order="F")
    return xhat, pred


def lmmse_estimate_c2(A2, Y2, noise_power, Cov,
                      predict_mmse: bool = False):
    """c2 wrapper: device/host c2 arrays in → (x̂ c2 np.float32, pred)."""
    A = np.asarray(A2)
    Y = np.asarray(Y2)
    xh, pred = lmmse_estimate(
        A[..., 0] + 1j * A[..., 1], Y[..., 0] + 1j * Y[..., 1],
        np.asarray(noise_power), Cov, predict_mmse=predict_mmse)
    return np.stack([xh.real, xh.imag], axis=-1).astype(np.float32), pred


def main(argv=None):
    import argparse

    import jax

    from .. import physics

    p = argparse.ArgumentParser(
        description="Exact LMMSE baseline (empirical or analytic covariance)")
    p.add_argument("--train", type=str, default="CDL-C",
                   help="profile fixing normalization + covariance")
    p.add_argument("--test", type=str, default=None,
                   help="evaluated profile (default = --train)")
    p.add_argument("--cov", type=str, default="empirical",
                   choices=["empirical", "analytic"])
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--num_channels", type=int, default=100)
    p.add_argument("--pilot_alpha", type=float, default=0.6)
    p.add_argument("--spacing", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="dataset ensemble override (fixed = the paper-matching per-drop coupling)")
    args = p.parse_args(argv)

    test = args.test or args.train
    snr_range = (np.asarray(args.snr, np.float64) if args.snr
                 else np.arange(-10, 32.5, 2.5))
    cfg = Config()
    if args.ray_coupling:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, ray_coupling=args.ray_coupling))
    train_cfg = dataclasses.replace(cfg.data, channel=args.train)
    train_ds = ChannelDataset(1234, train_cfg, norm="global")
    num_pilots = int(np.floor(cfg.data.num_tx * args.pilot_alpha))
    val_cfg = dataclasses.replace(
        cfg.data, channel=test, spacing_list=(args.spacing,),
        num_channels=max(args.num_channels, cfg.data.num_channels))
    val_ds = ChannelDataset(4321, val_cfg, norm=list(train_ds.norm_stats),
                            num_pilots=num_pilots)

    Cov = (empirical_covariance(train_ds) if args.cov == "empirical"
           else analytic_covariance(args.train, spacing=args.spacing))

    key = jax.random.key(args.seed)
    kp, km = jax.random.split(key)
    X2 = val_ds.hermitian_c2(normalized=True)[:args.num_channels]
    C = X2.shape[0]
    P2 = cplx.qpsk_pilots(kp, C, cfg.data.num_tx, num_pilots)
    A2 = cplx.conj_transpose(P2)
    X_np = np.asarray(val_ds.hermitian(normalized=True)[:args.num_channels])
    den = (np.abs(X_np) ** 2).sum((-1, -2))

    S = len(snr_range)
    npow = np.asarray(physics.snr_to_noise_power(snr_range, cfg.data.num_tx))
    results = np.zeros((S, C))
    predicted = np.zeros((S,))
    import jax.numpy as jnp

    for s in range(S):
        Y2 = physics.measure_c2(jax.random.fold_in(km, s), A2, X2,
                                jnp.full((C,), float(npow[s])))
        xh2, pred = lmmse_estimate_c2(A2, Y2, np.full((C,), npow[s]),
                                      Cov, predict_mmse=True)
        xh = xh2[..., 0] + 1j * xh2[..., 1]
        results[s] = (np.abs(xh - X_np) ** 2).sum((-1, -2)) / den
        predicted[s] = pred.mean()
        print(f"SNR {snr_range[s]:6.1f} dB  LMMSE NMSE "
              f"{10 * np.log10(results[s].mean()):7.2f} dB  "
              f"(predicted {10 * np.log10(predicted[s]):7.2f} dB)",
              flush=True)
    out = args.output or f"results/lmmse/{args.train}-{test}-{args.cov}.npz"
    import os

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, nmse=results, predicted=predicted, snr_range=snr_range)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
