"""EM-GM-AMP compressed-sensing baseline (reference matlab/test_em_gm_amp.m).

The reference script calls EMGMAMP from the (un-vendored, so unrunnable
there) GAMP MATLAB toolbox on a flattened Kronecker-lifted Fourier
operator (test_em_gm_amp.m:101-138). This module provides a runnable
TPU-native equivalent: GAMP with a K-component Bernoulli-Gaussian-mixture
prior whose parameters (sparsity λ, mixture weights ω_k, component
variances φ_k, noise variance ψ) are learned online by EM — Vila &
Schniter's EM-GM-AMP. The reference invokes EMGMAMP with
`optEM.heavy_tailed = true` (test_em_gm_amp.m:55), which fixes the
component means at zero and learns only (ω_k, φ_k); we match that mode.
`em_bg_amp` (the K=1 special case, EM-BG-AMP) is kept as a thin wrapper.

The GAMP recursion uses the *uniform-variance* simplification so the
lifted operator stays implicit (two small matmuls, never materializing
kron(R, A·L), which the reference builds densely at test_em_gm_amp.m:101).

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


def em_gm_amp(
    A2: Array,  # (B, Np, Nt, 2) measurement operator (pilots)
    Y2: Array,  # (B, Np, Nr, 2)
    L2: Array,  # (Nt, Zr, 2) left dictionary
    R2: Array,  # (Zc, Nr, 2) right dictionary
    num_iters: int = 50,
    num_components: int = 3,
    damp: float = 0.7,
    oracle2: Optional[Array] = None,
    init_sparsity: float = 0.05,
    init_var_spread: float = 10.0,
) -> Tuple[Array, Optional[Array]]:
    """Batched EM-GM-AMP (Vila & Schniter; heavy-tailed zero-mean mode, as
    the reference configures EMGMAMP at test_em_gm_amp.m:55).
    Returns (H_hat (B,Nt,Nr,2), nmse_trace or None).

    Prior per coefficient: p(z) = (1−λ)δ(z) + λ·Σ_k ω_k·CN(z; 0, φ_k);
    λ, ω, φ and the noise variance ψ are re-estimated by EM each GAMP
    iteration. Component variances are initialized geometrically spread
    (factor `init_var_spread`) around the moment-matched BG estimate so
    the mixture can capture heavy tails; K=1 reduces exactly to EM-BG-AMP.

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
    # variance from the measurement energy, component variances spread
    # geometrically around it (heavy-tailed init, EMGMAMP's default)
    K = int(num_components)
    psi0 = y_energy / 101.0  # assume SNR0 = 20 dB
    lam0 = jnp.full((B,), init_sparsity, jnp.float32)
    phi_bg = jnp.maximum((y_energy - psi0) / (gA[:, 0, 0] * N * lam0), 1e-12)
    spread = jnp.asarray(
        [init_var_spread ** (k - (K - 1) / 2.0) for k in range(K)],
        jnp.float32)
    phi0 = phi_bg[:, None] * spread[None, :]  # (B, K)
    omega0 = jnp.full((B, K), 1.0 / K, jnp.float32)

    Z0 = jnp.zeros((B, Zr, Zc, 2), jnp.float32)
    tau_x0 = (phi0 * omega0).sum(-1) * lam0  # per-coefficient prior variance
    s0 = jnp.zeros((B, Np_, Nr, 2), jnp.float32)

    gA_s = gA[:, 0, 0]  # (B,) per-coefficient operator energy

    # robust GAMP (the reference enables EMGMAMP's robust_gamp,
    # test_em_gm_amp.m:57): per-sample adaptive damping with step
    # rejection — a candidate step that increases the measurement
    # residual is discarded and the damping halved; accepted steps
    # slowly relax the damping back up. Without this the uniform-variance
    # recursion diverges on non-i.i.d. pilot operators (real CDL data).
    DAMP_MIN, DAMP_MAX, ACCEPT_TOL = 0.02, 0.95, 1.02

    def gamp_step(state, damp_t):
        Z, tau_x, s, lam, omega, phi, psi = state
        d1 = damp_t                        # (B,)
        d3 = damp_t[:, None, None]         # (B,1,1)
        lamb = lam[:, None, None]
        phib = phi[:, None, None, :]      # (B,1,1,K)
        omegab = omega[:, None, None, :]  # (B,1,1,K)

        # output linear step: scalar variance per sample
        tau_p = jnp.maximum(gA_s * N * tau_x, 1e-12)  # (B,)
        p = fwd(Z) - cplx.scale(s, tau_p[:, None, None])
        # output nonlinear step (AWGN likelihood)
        denom = (tau_p + psi)[:, None, None]  # (B,1,1)
        s_new = cplx.scale(Y2 - p, 1.0 / denom)
        s = cplx.scale(s, 1.0 - d3) + cplx.scale(s_new, d3)

        # input linear step: tau_r = (Σ |A|² / denom)⁻¹ per coefficient
        tau_r = ((tau_p + psi) / (gA_s * M))[:, None, None]  # (B,1,1)
        r = Z + cplx.scale(adj(s), tau_r)

        # Bernoulli-Gaussian-mixture denoiser (complex, zero means).
        # Posterior over {null, comp 1..K} per coefficient via log-domain
        # responsibilities; common −log π terms cancel in the softmax.
        tr2 = tau_r                      # (B,1,1)
        abs_r2 = cplx.abs2(r)            # (B, Zr, Zc)
        var1 = phib + tr2[..., None]     # (B,1,1,K) broadcastable
        log_bk = (jnp.log(jnp.maximum(lamb, 1e-12))[..., None]
                  + jnp.log(jnp.maximum(omegab, 1e-12))
                  - jnp.log(var1)
                  - abs_r2[..., None] / var1)        # (B,Zr,Zc,K)
        log_b0 = (jnp.log(jnp.maximum(1 - lamb, 1e-12))
                  - jnp.log(tr2) - abs_r2 / tr2)      # (B,Zr,Zc)
        log_all = jnp.concatenate([log_b0[..., None], log_bk], axis=-1)
        post = jax.nn.softmax(log_all, axis=-1)       # (B,Zr,Zc,1+K)
        pi_k = post[..., 1:]                          # (B,Zr,Zc,K)
        pi = pi_k.sum(-1)                             # activity posterior

        gain_k = phib / var1                          # (B,1,1,K)
        nu_k = gain_k * tr2[..., None]                # posterior var per comp
        # x̂ = Σ_k π_k·γ_k with γ_k = gain_k·r (zero-mean components)
        mean_gain = (pi_k * gain_k).sum(-1)           # (B,Zr,Zc)
        x_mmse = cplx.scale(r, mean_gain)
        # per-component second moment π_k·(|γ_k|² + ν_k)
        second_k = pi_k * (gain_k**2 * abs_r2[..., None] + nu_k)
        second = second_k.sum(-1)
        var_x = second - cplx.abs2(x_mmse)
        Z = cplx.scale(Z, 1.0 - d3) + cplx.scale(x_mmse, d3)
        tau_x_new = jnp.mean(var_x, axis=(-1, -2))
        tau_x = (1.0 - d1) * tau_x + d1 * tau_x_new

        # EM parameter updates (Vila & Schniter eqs. for zero-mean comps)
        sum_pik = jnp.sum(pi_k, axis=(1, 2))          # (B,K)
        sum_pi = jnp.maximum(sum_pik.sum(-1), 1e-6)   # (B,)
        lam = jnp.clip(sum_pi / (Zr * Zc), 1e-5, 1.0 - 1e-5)
        omega = sum_pik / sum_pi[:, None]
        phi = (jnp.sum(second_k, axis=(1, 2))
               / jnp.maximum(sum_pik, 1e-6))          # (B,K)
        resid = cplx.sum_abs2(Y2 - fwd(Z), axis=(-1, -2)) / M
        psi = jnp.maximum(resid, 1e-12)
        return (Z, tau_x, s, lam, omega, phi, psi), resid

    def body(carry, _):
        state, damp_t, resid_prev = carry
        cand, resid_cand = gamp_step(state, damp_t)
        # accept an improving step — or any step once damping has bottomed
        # out (otherwise identical-candidate rejection deadlocks the scan;
        # at DAMP_MIN the harm of a bad step is bounded anyway)
        accept = ((resid_cand <= resid_prev * ACCEPT_TOL)
                  | (damp_t <= DAMP_MIN))  # (B,)

        def sel(new, old):
            a = accept.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(a, new, old)

        state = jax.tree_util.tree_map(sel, cand, state)
        resid_prev = jnp.where(accept, resid_cand, resid_prev)
        damp_t = jnp.where(accept,
                           jnp.minimum(damp_t * 1.1, DAMP_MAX),
                           jnp.maximum(damp_t * 0.5, DAMP_MIN))

        ys = None
        if track:
            H = synth(state[0])
            ys = (cplx.sum_abs2(H - oracle2, axis=(-1, -2))
                  / oracle_energy).astype(jnp.float32)
        return (state, damp_t, resid_prev), ys

    init_state = (Z0, tau_x0, s0, lam0, omega0, phi0, psi0)
    init = (init_state, jnp.full((B,), damp, jnp.float32), y_energy)
    ((Zf, *_), _, _), trace = jax.lax.scan(body, init, None,
                                           length=num_iters)
    H_hat = cplx.matmul(cplx.matmul(
        jnp.broadcast_to(L2, Zf.shape[:-3] + L2.shape), Zf), Rb)
    return H_hat, trace


def em_bg_amp(A2: Array, Y2: Array, L2: Array, R2: Array,
              **kwargs) -> Tuple[Array, Optional[Array]]:
    """EM-BG-AMP: the K=1 (Bernoulli-Gaussian) special case of EM-GM-AMP."""
    return em_gm_amp(A2, Y2, L2, R2, num_components=1, **kwargs)


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
    num_components: int = 3,
    num_channels: int = 50,
    spacing: float = 0.5,
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 13,
) -> AMPResults:
    """EM-GM-AMP over the SNR grid (test_em_gm_amp.m semantics: NMSE per
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

    run = jax.jit(lambda a, y, orc: em_gm_amp(
        a, y, L2, R2, num_iters=num_iters,
        num_components=num_components, oracle2=orc))
    _, trace = run(A_b, Y_b, X_b)
    trace = np.asarray(trace).reshape(num_iters, S, C)
    return AMPResults(nmse_trace=np.transpose(trace, (1, 0, 2)),
                      snr_range=snr_range)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="EM-GM-AMP baseline")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--components", type=int, default=3,
                   help="GM components K (K=1 = EM-BG-AMP)")
    p.add_argument("--num_channels", type=int, default=50)
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="dataset ensemble override (fixed = the paper-matching per-drop coupling)")
    args = p.parse_args(argv)

    from ..config import default_score_config

    cfg = default_score_config(args.train, ray_coupling=args.ray_coupling)
    res = run_amp_baseline(
        cfg, channel=args.train, num_iters=args.iters,
        num_components=args.components,
        snr_range=np.asarray(args.snr) if args.snr else None,
        num_channels=args.num_channels)
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  NMSE {res.best_db()[s]:7.2f} dB")
    out = args.output or f"results/amp/{args.train}.npz"
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
