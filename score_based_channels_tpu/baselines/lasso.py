"""Lasso / fsAD compressed-sensing baseline with a lifted Fourier dictionary.

Reference test_l1Fourier_lifted.py: per-sample FISTA (SigPy GradientMethod
with L1 prox, accelerate=True; :133,159-162) over a 4×-lifted 2-D inverse
Fourier dictionary (:124-130), 1000 iterations, sequential on 1 CPU thread
per sample, NMSE trace at every iteration (:164-178).

TPU redesign: the dictionary synthesis H = L·Z·R is two small matmuls; the
whole {samples × SNR × (λ, lr) grid} batch runs FISTA in ONE `lax.scan`
over iterations with per-sample λ/lr (c2 arithmetic, soft-thresholding on
magnitudes). The dictionary matrices are host-precomputed constants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx, physics
from ..config import Config
from ..data.dataset import ChannelDataset

Array = jax.Array


def lifted_fourier_dicts(nr_rows: int, nr_cols: int, lifting: int = 4
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(L, R): H (rows×cols) = L · Z · R with Z (rows·lift × cols·lift).

    Matches test_l1Fourier_lifted.py:125-128: L = conj(ifft(I_rows,
    n=rows·lift, 'ortho')) (rows × rows·lift), R = ifft(I_cols,
    n=cols·lift, 'ortho').T (cols·lift × cols).
    """
    from scipy.fft import ifft

    L = np.conj(ifft(np.eye(nr_rows), n=nr_rows * lifting, norm="ortho"))
    R = ifft(np.eye(nr_cols), n=nr_cols * lifting, norm="ortho").T
    return L.astype(np.complex64), R.astype(np.complex64)


def _soft_threshold_c2(z: Array, thresh: Array) -> Array:
    """Complex soft-thresholding: z·max(1 − t/|z|, 0) (L1 prox)."""
    mag = jnp.sqrt(cplx.abs2(z) + 1e-30)
    scale = jnp.maximum(1.0 - thresh / mag, 0.0)
    return z * scale[..., None]


def fista_l1_lifted(
    A2: Array,
    Y2: Array,
    L2: Array,
    R2: Array,
    lmbda: Array,
    lr: Array,
    num_iters: int = 1000,
    oracle2: Optional[Array] = None,
) -> Tuple[Array, Optional[Array]]:
    """Batched FISTA for min_Z ½‖A·L·Z·R − Y‖² + λ‖Z‖₁.

    A2 (B,Np,Nt,2), Y2 (B,Np,Nr,2), L2 (Nt,Zr,2), R2 (Zc,Nr,2);
    λ, lr scalar or (B,). Returns (H_hat (B,Nt,Nr,2), nmse_trace
    (num_iters,B) or None). FISTA per sigpy GradientMethod accelerate=True.
    """
    B = A2.shape[0]
    Zr, Zc = L2.shape[-2], R2.shape[-3]  # Z ∈ C^{Nt·lift × Nr·lift}
    lmbda = jnp.broadcast_to(jnp.asarray(lmbda, jnp.float32), (B,))
    lr = jnp.broadcast_to(jnp.asarray(lr, jnp.float32), (B,))

    Lh = cplx.conj_transpose(L2)
    Rh = cplx.conj_transpose(R2)
    Ah = cplx.conj_transpose(A2)
    AL = cplx.matmul(A2, jnp.broadcast_to(L2, A2.shape[:-3] + L2.shape))
    ALh = cplx.conj_transpose(AL)

    track = oracle2 is not None
    if track:
        oracle_energy = cplx.sum_abs2(oracle2, axis=(-1, -2))

    def synth(Z):
        return cplx.matmul(cplx.matmul(
            jnp.broadcast_to(L2, Z.shape[:-3] + L2.shape), Z),
            jnp.broadcast_to(R2, Z.shape[:-3] + R2.shape))

    def grad(Z):
        resid = cplx.matmul(cplx.matmul(AL, Z),
                            jnp.broadcast_to(R2, Z.shape[:-3] + R2.shape)) - Y2
        return cplx.matmul(cplx.matmul(ALh, resid),
                           jnp.broadcast_to(Rh, Z.shape[:-3] + Rh.shape))

    z0 = jnp.zeros((B, Zr, Zc, 2), jnp.float32)

    def body(carry, _):
        Z, W, t = carry  # W = extrapolated point
        Znew = _soft_threshold_c2(
            W - cplx.scale(grad(W), lr[:, None, None]),
            (lmbda * lr)[:, None, None])
        tnew = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        Wnew = Znew + ((t - 1.0) / tnew) * (Znew - Z)
        ys = None
        if track:
            H = synth(Znew)
            ys = (cplx.sum_abs2(H - oracle2, axis=(-1, -2))
                  / oracle_energy).astype(jnp.float32)
        return (Znew, Wnew, tnew), ys

    (Zf, _, _), trace = jax.lax.scan(
        body, (z0, z0, jnp.float32(1.0)), None, length=num_iters)
    return synth(Zf), trace


@dataclasses.dataclass
class LassoResults:
    """Mirror of the reference results.pt (test_l1Fourier_lifted.py:228-239)."""

    nmse_log: np.ndarray  # (n_alpha, n_lmbda, n_lr, n_snr, n_channels)
    complete_log: np.ndarray  # (..., n_iters, n_channels) per-iter NMSE
    best_nmse: np.ndarray  # (n_alpha, n_snr)
    best_lmbda: np.ndarray
    best_lr: np.ndarray
    snr_range: np.ndarray
    alpha_range: np.ndarray
    lmbda_range: np.ndarray
    lr_range: np.ndarray

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def run_lasso_baseline(
    config: Config,
    channel: str = "CDL-C",
    train_profile: Optional[str] = None,
    snr_range: Optional[np.ndarray] = None,
    alpha_range: Sequence[float] = (0.6,),
    lmbda_range: Sequence[float] = (0.3,),
    lr_range: Sequence[float] = (3e-3,),
    lifting: int = 4,
    num_iters: int = 1000,
    num_channels: int = 50,
    spacing: float = 0.5,
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 7,
    chunk_size: Optional[int] = None,
) -> LassoResults:
    """Reference defaults: SNR −10…30 step 5, λ=0.3, lr=3e-3, lifting 4,
    1000 iters, 50 samples (test_l1Fourier_lifted.py:38-73)."""
    if snr_range is None:
        snr_range = np.arange(-10, 35, 5)  # test_l1Fourier_lifted.py:61
    snr_range = np.asarray(snr_range, np.float64)
    train_profile = train_profile or channel

    train_cfg = dataclasses.replace(config.data, channel=train_profile)
    train_ds = ChannelDataset(train_seed, train_cfg, norm="global")

    Ld, Rd = lifted_fourier_dicts(config.data.num_tx, config.data.num_rx,
                                  lifting)
    L2, R2 = cplx.from_complex(Ld), cplx.from_complex(Rd)

    nA = len(alpha_range)
    nL, nR, S = len(lmbda_range), len(lr_range), len(snr_range)
    nmse_log = np.zeros((nA, nL, nR, S, num_channels), np.float32)
    complete = np.zeros((nA, nL, nR, S, num_iters, num_channels), np.float32)

    key = jax.random.key(seed)
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
        k = jax.random.fold_in(key, i_al)
        kp, km = jax.random.split(k)
        P2 = cplx.qpsk_pilots(kp, C, config.data.num_tx, num_pilots)
        A2 = cplx.conj_transpose(P2)

        # flatten (λ, lr, SNR, channel) into one batch
        npow = np.repeat(
            10.0 ** (-snr_range / 10.0) * config.data.num_tx, C
        ).astype(np.float32)  # noise·Nt (test_l1Fourier_lifted.py:69)
        A_sc = jnp.tile(A2, (S, 1, 1, 1))
        X_sc = jnp.tile(X2, (S, 1, 1, 1))
        Y_sc = physics.measure_c2(km, A_sc, X_sc, jnp.asarray(npow))
        G = nL * nR
        A_b = jnp.tile(A_sc, (G, 1, 1, 1))
        X_b = jnp.tile(X_sc, (G, 1, 1, 1))
        Y_b = jnp.tile(Y_sc, (G, 1, 1, 1))
        lm_b = jnp.repeat(jnp.asarray(np.repeat(lmbda_range, nR), jnp.float32),
                          S * C)
        lr_b = jnp.repeat(jnp.asarray(np.tile(lr_range, nL), jnp.float32),
                          S * C)

        run = jax.jit(lambda a, y, lm, lr_, orc: fista_l1_lifted(
            a, y, L2, R2, lm, lr_, num_iters=num_iters, oracle2=orc))
        B = A_b.shape[0]
        chunk = chunk_size or B
        traces = []
        for start in range(0, B, chunk):
            sl = slice(start, start + chunk)
            _, tr = run(A_b[sl], Y_b[sl], lm_b[sl], lr_b[sl], X_b[sl])
            traces.append(np.asarray(jax.device_get(tr)))
        trace = np.concatenate(traces, axis=1)  # (iters, G·S·C)
        trace = trace.reshape(num_iters, nL, nR, S, C)
        complete[i_al] = np.transpose(trace, (1, 2, 3, 0, 4))
        nmse_log[i_al] = complete[i_al, ..., -1, :]

    # per-(α, SNR) best over the (λ, lr) grid (test_l1Fourier_lifted.py:191-211)
    # NaN-safe: diverged (λ, lr) combos must never win
    avg = nmse_log.mean(-1)  # (nA, nL, nR, S)
    avg = np.where(np.isfinite(avg), avg, np.inf)
    best_nmse = np.zeros((nA, S))
    best_lmbda = np.zeros((nA, S))
    best_lr = np.zeros((nA, S))
    for a in range(nA):
        for s in range(S):
            flat = avg[a, ..., s].ravel()
            i = int(np.argmin(flat))
            iL, iR = np.unravel_index(i, (nL, nR))
            best_nmse[a, s] = flat[i]
            best_lmbda[a, s] = lmbda_range[iL]
            best_lr[a, s] = lr_range[iR]

    return LassoResults(
        nmse_log=nmse_log, complete_log=complete, best_nmse=best_nmse,
        best_lmbda=best_lmbda, best_lr=best_lr, snr_range=snr_range,
        alpha_range=np.asarray(alpha_range),
        lmbda_range=np.asarray(lmbda_range), lr_range=np.asarray(lr_range))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Lasso/fsAD lifted-Fourier CS")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--test", type=str, default="CDL-C")
    p.add_argument("--alpha", nargs="+", type=float, default=[0.6])
    p.add_argument("--lmbda", nargs="+", type=float, default=[0.3])
    p.add_argument("--lr", nargs="+", type=float, default=[3e-3])
    p.add_argument("--lifting", type=int, default=4)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--num_channels", type=int, default=50)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="dataset ensemble override (fixed = the paper-matching per-drop coupling)")
    args = p.parse_args(argv)

    from ..config import default_score_config

    cfg = default_score_config(args.train, ray_coupling=args.ray_coupling)
    res = run_lasso_baseline(
        cfg, channel=args.test, train_profile=args.train,
        snr_range=np.asarray(args.snr) if args.snr else None,
        alpha_range=tuple(args.alpha), lmbda_range=tuple(args.lmbda),
        lr_range=tuple(args.lr), lifting=args.lifting, num_iters=args.steps,
        num_channels=args.num_channels, chunk_size=args.chunk)
    for a, al in enumerate(res.alpha_range):
        for s, snr in enumerate(res.snr_range):
            print(f"alpha {al} SNR {snr:6.1f} dB  NMSE "
                  f"{10 * np.log10(res.best_nmse[a, s]):7.2f} dB  "
                  f"(lambda {res.best_lmbda[a, s]:.1e}, lr "
                  f"{res.best_lr[a, s]:.1e})")
    out = args.output or (f"results/l1CS_lifted{args.lifting}/"
                          f"train-{args.train}_test-{args.test}.npz")
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
