"""Regularized least-squares ("ML") channel-estimation baseline.

Reference test_ml.py:124-146: per-sample regularized normal equations
  (Pᴴ P + noise·I) · h = Pᴴ y
solved one sample at a time with numpy lstsq on 2 CPU threads. Here the
whole {channels × SNR} batch solves at once on device: the complex system
is lifted to the equivalent real block system

  [Re(G) −Im(G)] [Re(h)]   [Re(b)]
  [Im(G)  Re(G)] [Im(h)] = [Im(b)]

(G Hermitian PSD + noise·I ⇒ the block matrix is symmetric positive
definite), solved with a batched Cholesky — real linalg only, TPU-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx, physics
from ..config import Config
from ..data.dataset import ChannelDataset

Array = jax.Array


def _real_block(G2: Array) -> Array:
    """c2 Hermitian matrix (..., N, N, 2) → real block (..., 2N, 2N)."""
    Gr, Gi = G2[..., 0], G2[..., 1]
    top = jnp.concatenate([Gr, -Gi], axis=-1)
    bot = jnp.concatenate([Gi, Gr], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def ls_estimate(A2: Array, Y2: Array, noise_power: Array) -> Array:
    """Batched regularized LS: argmin ‖A·h − y‖² + noise·‖h‖² in c2.

    A2: (B, Np, Nt, 2), Y2: (B, Np, Nr, 2), noise_power scalar or (B,).
    Returns (B, Nt, Nr, 2).
    """
    Ah = cplx.conj_transpose(A2)
    G = cplx.matmul(Ah, A2)  # (B, Nt, Nt, 2) Hermitian
    b = cplx.matmul(Ah, Y2)  # (B, Nt, Nr, 2)
    nt = G.shape[-3]
    lam = jnp.broadcast_to(jnp.asarray(noise_power, jnp.float32),
                           G.shape[:-3])
    eye = jnp.eye(nt, dtype=G.dtype)
    G = G.at[..., 0].add(lam[..., None, None] * eye)

    M = _real_block(G)  # (B, 2Nt, 2Nt) SPD
    rhs = jnp.concatenate([b[..., 0], b[..., 1]], axis=-2)  # (B, 2Nt, Nr)
    L = jnp.linalg.cholesky(M)
    sol = jax.scipy.linalg.cho_solve((L, True), rhs)
    hr, hi = jnp.split(sol, 2, axis=-2)
    return jnp.stack([hr, hi], axis=-1)


@dataclasses.dataclass
class LSResults:
    nmse: np.ndarray  # (n_spacing, n_alpha, n_snr, n_channels)
    snr_range: np.ndarray
    spacing_range: np.ndarray
    alpha_range: np.ndarray

    def avg_nmse_db(self) -> np.ndarray:
        return 10 * np.log10(self.nmse.mean(-1))

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def run_ls_baseline(
    config: Config,
    channel: str = "CDL-C",
    model_channel: Optional[str] = None,
    snr_range: Optional[np.ndarray] = None,
    spacing_range: Sequence[float] = (0.5,),
    alpha_range: Sequence[float] = (0.6,),
    num_channels: int = 50,
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 99,
) -> LSResults:
    """test_ml.py evaluation: SNR −30…15 step 2.5, 50 kept samples, noise
    power WITHOUT the Nt factor (test_ml.py:67 — unlike the score path).
    """
    if snr_range is None:
        snr_range = np.arange(-30, 17.5, 2.5)  # test_ml.py:64
    snr_range = np.asarray(snr_range, np.float64)
    model_channel = model_channel or channel

    train_cfg = dataclasses.replace(config.data, channel=model_channel)
    train_ds = ChannelDataset(train_seed, train_cfg, norm="global")

    S = len(snr_range)
    out = np.zeros((len(spacing_range), len(alpha_range), S, num_channels),
                   np.float32)
    key = jax.random.key(seed)
    for i_sp, spacing in enumerate(spacing_range):
        for i_al, alpha in enumerate(alpha_range):
            num_pilots = int(np.floor(config.data.num_tx * alpha))
            val_cfg = dataclasses.replace(
                config.data, channel=channel, spacing_list=(spacing,),
                num_channels=max(num_channels, config.data.num_channels))
            val_ds = ChannelDataset(val_seed, val_cfg,
                                    norm=list(train_ds.norm_stats),
                                    num_pilots=num_pilots)
            X2 = val_ds.hermitian_c2()[:num_channels]
            C = X2.shape[0]
            k = jax.random.fold_in(key, i_sp * len(alpha_range) + i_al)
            kp, km = jax.random.split(k)
            P2 = cplx.qpsk_pilots(kp, C, config.data.num_tx, num_pilots)
            A2 = cplx.conj_transpose(P2)

            # flatten SNR × channels; noise = 10^(−SNR/10) (test_ml.py:67)
            npow = np.repeat(10.0 ** (-snr_range / 10.0), C).astype(np.float32)
            A_b = jnp.tile(A2, (S, 1, 1, 1))
            X_b = jnp.tile(X2, (S, 1, 1, 1))
            Y_b = physics.measure_c2(km, A_b, X_b, jnp.asarray(npow))
            est = jax.jit(ls_estimate)(A_b, Y_b, jnp.asarray(npow))
            nm = np.asarray(cplx.nmse(est, X_b)).reshape(S, C)
            out[i_sp, i_al] = nm
    return LSResults(nmse=out, snr_range=snr_range,
                     spacing_range=np.asarray(spacing_range),
                     alpha_range=np.asarray(alpha_range))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Regularized-LS baseline")
    p.add_argument("--model", type=str, default="CDL-C")
    p.add_argument("--channel", type=str, default="CDL-C")
    p.add_argument("--spacing", nargs="+", type=float, default=[0.5])
    p.add_argument("--alpha", nargs="+", type=float, default=[0.6])
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--num_channels", type=int, default=50)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="dataset ensemble override (fixed = the paper-matching per-drop coupling)")
    args = p.parse_args(argv)

    from ..config import default_score_config

    cfg = default_score_config(args.model, ray_coupling=args.ray_coupling)
    res = run_ls_baseline(
        cfg, channel=args.channel, model_channel=args.model,
        snr_range=np.asarray(args.snr) if args.snr else None,
        spacing_range=tuple(args.spacing), alpha_range=tuple(args.alpha),
        num_channels=args.num_channels)
    db = res.avg_nmse_db()
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  NMSE {db[0, 0, s]:7.2f} dB")
    out = args.output or (f"results/ls/model_{args.model}_channel_"
                          f"{args.channel}.npz")
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
