"""EM-BG-AMP compressed-sensing baseline (reference matlab/test_em_gm_amp.m).

The reference script calls EMGMAMP from the (un-vendored, so unrunnable
there) GAMP MATLAB toolbox on a flattened Kronecker-lifted Fourier
operator (test_em_gm_amp.m:101-138). This module provides a runnable
TPU-native equivalent: GAMP with a Bernoulli-Gaussian prior whose
parameters (sparsity λ, signal variance φ, noise variance ψ) are learned
online by EM — the BG special case of Vila & Schniter's EM-GM-AMP — using
the *uniform-variance* GAMP simplification so the lifted operator stays
implicit (two small matmuls, never materializing kron(R, A·L)).

Model:  y = A·L·Z·R + n,  Z sparse in the lifted 2-D Fourier domain
(same dictionary as baselines/lasso.py). All quantities complex via c2.
Everything is batched over samples and scanned over iterations.
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
from .lasso import lifted_fourier_dicts

Array = jax.Array


def em_bg_amp(
    A2: Array,  # (B, Np, Nt, 2) measurement operator (pilots)
    Y2: Array,  # (B, Np, Nr, 2)
    L2: Array,  # (Nt, Zr, 2) left dictionary
    R2: Array,  # (Zc, Nr, 2) right dictionary
    num_iters: int = 50,
    damp: float = 0.7,
    oracle2: Optional[Array] = None,
    init_sparsity: float = 0.05,
) -> Tuple[Array, Optional[Array]]:
    """Batched EM-BG-AMP. Returns (H_hat (B,Nt,Nr,2), nmse_trace or None).

    Uniform-variance GAMP: scalar variances per sample; the effective
    operator F(Z) = A·L·Z·R has squared Frobenius gain per coefficient
    approximated by ‖A·L‖²_F·‖R‖²_F/(M·N) (exact for row-orthogonal dicts).
    """
    B, Np_, Nr = Y2.shape[0], Y2.shape[1], Y2.shape[2]
    Zr, Zc = L2.shape[-2], R2.shape[-3]
    N = Zr * Zc
    M = Np_ * Nr

    AL = cplx.matmul(A2, jnp.broadcast_to(L2, A2.shape[:-3] + L2.shape))
    ALh = cplx.conj_transpose(AL)
    Rb = jnp.broadcast_to(R2, (B,) + R2.shape)
    Rh = cplx.conj_transpose(Rb)

    def fwd(Z):
        return cplx.matmul(cplx.matmul(AL, Z), Rb)

    def adj(V):
        return cplx.matmul(cplx.matmul(ALh, V), Rh)

    # per-coefficient operator energy (uniform-variance approximation)
    gA = (jnp.sum(cplx.abs2(AL), axis=(-1, -2))
          * jnp.sum(cplx.abs2(R2), axis=(-1, -2))) / (M * N)  # (B,)
    gA = gA[:, None, None]

    y_energy = cplx.sum_abs2(Y2, axis=(-1, -2)) / M  # (B,)

    track = oracle2 is not None
    if track:
        oracle_energy = cplx.sum_abs2(oracle2, axis=(-1, -2))

        def synth(Z):
            return cplx.matmul(cplx.matmul(
                jnp.broadcast_to(L2, Z.shape[:-3] + L2.shape), Z), Rb)

    # EM init (Vila-Schniter style): noise from an SNR0 guess, signal
    # variance from the measurement energy
    psi0 = y_energy / 101.0  # assume SNR0 = 20 dB
    lam0 = jnp.full((B,), init_sparsity, jnp.float32)
    phi0 = jnp.maximum((y_energy - psi0) / (gA[:, 0, 0] * N * lam0), 1e-12)

    Z0 = jnp.zeros((B, Zr, Zc, 2), jnp.float32)
    tau_x0 = phi0 * lam0  # per-coefficient prior variance
    s0 = jnp.zeros((B, Np_, Nr, 2), jnp.float32)

    gA_s = gA[:, 0, 0]  # (B,) per-coefficient operator energy

    def body(carry, _):
        Z, tau_x, s, lam, phi, psi = carry
        lamb = lam[:, None, None]
        phib = phi[:, None, None]

        # output linear step: scalar variance per sample
        tau_p = jnp.maximum(gA_s * N * tau_x, 1e-12)  # (B,)
        p = fwd(Z) - cplx.scale(s, tau_p[:, None, None])
        # output nonlinear step (AWGN likelihood)
        denom = (tau_p + psi)[:, None, None]  # (B,1,1)
        s_new = cplx.scale(Y2 - p, 1.0 / denom)
        s = cplx.scale(s, 1.0 - damp) + cplx.scale(s_new, damp)

        # input linear step: tau_r = (Σ |A|² / denom)⁻¹ per coefficient
        tau_r = ((tau_p + psi) / (gA_s * M))[:, None, None]  # (B,1,1)
        r = Z + cplx.scale(adj(s), tau_r)

        # Bernoulli-Gaussian denoiser (complex)
        tr2 = tau_r
        abs_r2 = cplx.abs2(r)  # (B, Zr, Zc)
        # log-likelihood ratio of active vs zero component
        var1 = phib + tr2
        llr = (jnp.log(jnp.maximum(lamb, 1e-12))
               - jnp.log(jnp.maximum(1 - lamb, 1e-12))
               + jnp.log(tr2 / var1)
               + abs_r2 * (1.0 / tr2 - 1.0 / var1))
        pi = jax.nn.sigmoid(llr)  # activity posterior (B, Zr, Zc)
        gain = phib / var1
        x_mmse = cplx.scale(r, pi * gain)
        second = pi * (gain * tr2 + (gain**2) * abs_r2)
        var_x = second - cplx.abs2(x_mmse)
        Z_new = x_mmse
        Z = cplx.scale(Z, 1.0 - damp) + cplx.scale(Z_new, damp)
        tau_x_new = jnp.mean(var_x, axis=(-1, -2))
        tau_x = (1.0 - damp) * tau_x + damp * tau_x_new

        # EM parameter updates
        lam = jnp.clip(jnp.mean(pi, axis=(-1, -2)), 1e-5, 1.0 - 1e-5)
        phi = (jnp.sum(second, axis=(-1, -2))
               / jnp.maximum(jnp.sum(pi, axis=(-1, -2)), 1e-6))
        resid = cplx.sum_abs2(Y2 - fwd(Z), axis=(-1, -2)) / M
        psi = jnp.maximum(resid, 1e-12)

        ys = None
        if track:
            H = synth(Z)
            ys = (cplx.sum_abs2(H - oracle2, axis=(-1, -2))
                  / oracle_energy).astype(jnp.float32)
        return (Z, tau_x, s, lam, phi, psi), ys

    init = (Z0, tau_x0, s0, lam0, phi0, psi0)
    (Zf, *_), trace = jax.lax.scan(body, init, None, length=num_iters)
    H_hat = cplx.matmul(cplx.matmul(
        jnp.broadcast_to(L2, Zf.shape[:-3] + L2.shape), Zf), Rb)
    return H_hat, trace


@dataclasses.dataclass
class AMPResults:
    nmse_trace: np.ndarray  # (n_snr, n_iters, n_channels)
    snr_range: np.ndarray

    def best_db(self) -> np.ndarray:
        avg = self.nmse_trace.mean(-1)
        avg = np.where(np.isfinite(avg), avg, np.inf)
        return 10 * np.log10(avg.min(-1))

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def run_amp_baseline(
    config: Config,
    channel: str = "CDL-C",
    snr_range: Optional[np.ndarray] = None,
    pilot_alpha: float = 0.6,
    lifting: int = 4,
    num_iters: int = 50,
    num_channels: int = 50,
    spacing: float = 0.5,
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 13,
) -> AMPResults:
    """EM-BG-AMP over the SNR grid (test_em_gm_amp.m semantics: NMSE per
    EM iteration, lifted Fourier dictionary, noise = 10^(−SNR/10)·Nt)."""
    if snr_range is None:
        snr_range = np.arange(-10, 35, 5)
    snr_range = np.asarray(snr_range, np.float64)

    train_cfg = dataclasses.replace(config.data, channel=channel)
    train_ds = ChannelDataset(train_seed, train_cfg, norm="global")
    num_pilots = int(np.floor(config.data.num_tx * pilot_alpha))
    val_cfg = dataclasses.replace(
        config.data, channel=channel, spacing_list=(spacing,),
        num_channels=max(num_channels, config.data.num_channels))
    val_ds = ChannelDataset(val_seed, val_cfg, norm=list(train_ds.norm_stats),
                            num_pilots=num_pilots)

    Ld, Rd = lifted_fourier_dicts(config.data.num_tx, config.data.num_rx,
                                  lifting)
    L2, R2 = cplx.from_complex(Ld), cplx.from_complex(Rd)

    X2 = val_ds.hermitian_c2()[:num_channels]
    C = X2.shape[0]
    key = jax.random.key(seed)
    kp, km = jax.random.split(key)
    P2 = cplx.qpsk_pilots(kp, C, config.data.num_tx, num_pilots)
    A2 = cplx.conj_transpose(P2)

    S = len(snr_range)
    npow = np.repeat(10.0 ** (-snr_range / 10.0) * config.data.num_tx,
                     C).astype(np.float32)
    A_b = jnp.tile(A2, (S, 1, 1, 1))
    X_b = jnp.tile(X2, (S, 1, 1, 1))
    Y_b = physics.measure_c2(km, A_b, X_b, jnp.asarray(npow))

    run = jax.jit(lambda a, y, orc: em_bg_amp(
        a, y, L2, R2, num_iters=num_iters, oracle2=orc))
    _, trace = run(A_b, Y_b, X_b)
    trace = np.asarray(trace).reshape(num_iters, S, C)
    return AMPResults(nmse_trace=np.transpose(trace, (1, 0, 2)),
                      snr_range=snr_range)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="EM-BG-AMP baseline")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--num_channels", type=int, default=50)
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args(argv)

    from ..config import default_score_config

    cfg = default_score_config(args.train)
    res = run_amp_baseline(
        cfg, channel=args.train, num_iters=args.iters,
        snr_range=np.asarray(args.snr) if args.snr else None,
        num_channels=args.num_channels)
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  NMSE {res.best_db()[s]:7.2f} dB")
    out = args.output or f"results/amp/{args.train}.npz"
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
