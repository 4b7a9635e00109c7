"""Approximate-MMSE estimation by posterior-sample averaging.

Reference test_mmse.py: tile each validation channel ×`mmse_avg` (50)
posterior samples (:104,181-192), run the annealed Langevin sampler from a
chosen initialization (Noise / Adjoint / LS, :195-202) with per-SNR tuned
hyper-parameters and early stopping (:121-126, 259-274), then average the
posterior samples into the MMSE estimate.

(The reference script is legacy-broken — absolute imports and hard-coded
checkpoint dirs, SURVEY.md C5 — so this is a reimplementation of its math,
not its plumbing.) The {channels × samples × SNR} product is one flattened
batch; the early-stop step per SNR is handled by reading the NMSE-of-mean
trace at the requested step (min over steps by default).
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
from ..diffusion.sampling import annealed_langevin_posterior_c2
from ..diffusion.sigmas import sigmas_from_config
from .ls import ls_estimate

Array = jax.Array


@dataclasses.dataclass
class MMSEResults:
    nmse_mean_est: np.ndarray  # (n_snr, n_channels) NMSE of the posterior mean
    nmse_single: np.ndarray  # (n_snr, n_channels) NMSE of a single sample
    snr_range: np.ndarray
    mmse_avg: int

    def avg_db(self) -> np.ndarray:
        return 10 * np.log10(self.nmse_mean_est.mean(-1))

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def run_mmse_estimation(
    score_fn,
    config: Config,
    channel: str = "CDL-C",
    snr_range: Optional[np.ndarray] = None,
    pilot_alpha: float = 0.6,
    spacing: float = 0.5,
    num_channels: int = 20,
    mmse_avg: int = 50,
    init: str = "noise",  # {noise, adjoint, ls, lmmse} (test_mmse.py:195-202)
    alpha_step=None,
    beta_noise=None,
    stop_step: Optional[np.ndarray] = None,  # per-SNR early stop (int)
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 31,
    chunk_size: Optional[int] = None,
    sigma_start: Optional[float] = None,
    coef_cap: Optional[str | float] = None,
    progress: bool = False,
) -> MMSEResults:
    """init="lmmse" + sigma_start enable the round-3 warm-start protocol
    (RESULTS.md): chains start at the exact-LMMSE estimate (train-set
    empirical covariance) and the σ-schedule is truncated to σ ≤
    sigma_start — the corrected-temperature (β=1) posterior-averaging
    protocol runs either from noise on the full schedule (reference
    test_mmse.py shape) or warm on the truncated one."""
    cfg = config
    if snr_range is None:
        snr_range = np.arange(-10, 32.5, 2.5)
    snr_range = np.asarray(snr_range, np.float64)
    sampling = cfg.sampling
    alpha_step = sampling.alpha_step if alpha_step is None else alpha_step
    beta_noise = sampling.beta_noise if beta_noise is None else beta_noise
    S_ = len(snr_range)

    def _per_sample(hp, C_, R_):
        """scalar or per-SNR (S,) hyper-parameter → (R·S·C,) per-sample."""
        hp = np.asarray(hp, np.float32)
        if hp.ndim == 0:
            return hp
        assert hp.shape == (S_,)
        return jnp.tile(jnp.repeat(jnp.asarray(hp), C_), (R_,))

    train_cfg = dataclasses.replace(cfg.data, channel=channel)
    train_ds = ChannelDataset(train_seed, train_cfg, norm="global")
    num_pilots = int(np.floor(cfg.data.num_tx * pilot_alpha))
    val_cfg = dataclasses.replace(
        cfg.data, channel=channel, spacing_list=(spacing,),
        num_channels=max(num_channels, cfg.data.num_channels))
    val_ds = ChannelDataset(val_seed, val_cfg, norm=list(train_ds.norm_stats),
                            num_pilots=num_pilots)

    sigmas = sigmas_from_config(cfg.model)
    if sigma_start is not None:
        sig_np = np.asarray(sigmas)
        k0 = int(np.searchsorted(-sig_np, -float(sigma_start)))
        if k0 >= len(sig_np):
            raise ValueError(f"sigma_start={sigma_start} truncates the "
                             "whole schedule")
        sigmas = sigmas[k0:]
    key = jax.random.key(seed)
    kp, km, ki, kr = jax.random.split(key, 4)

    X2 = val_ds.hermitian_c2()[:num_channels]  # (C, Nt, Nr, 2)
    C = X2.shape[0]
    P2 = cplx.qpsk_pilots(kp, C, cfg.data.num_tx, num_pilots)
    A2 = cplx.conj_transpose(P2)

    S = len(snr_range)
    R = mmse_avg
    npow_sc = np.repeat(
        np.asarray(physics.snr_to_noise_power(snr_range, cfg.data.num_tx),
                   np.float32), C)
    A_sc = jnp.tile(A2, (S, 1, 1, 1))
    X_sc = jnp.tile(X2, (S, 1, 1, 1))
    Y_sc = physics.measure_c2(km, A_sc, X_sc, jnp.asarray(npow_sc))

    # tile ×R posterior samples: batch index = r·(S·C) + s·C + c
    A_b = jnp.tile(A_sc, (R, 1, 1, 1))
    Y_b = jnp.tile(Y_sc, (R, 1, 1, 1))
    X_b = jnp.tile(X_sc, (R, 1, 1, 1))
    npow_b = jnp.tile(jnp.asarray(npow_sc), (R,))

    if init == "noise":
        x0_b = cplx.randn(ki, A_b.shape[:1] + X2.shape[1:-1])
    elif init == "adjoint":
        x0_b = cplx.matmul(cplx.conj_transpose(A_b), Y_b)
    elif init == "ls":
        x0_b = ls_estimate(A_b, Y_b, npow_b)
    elif init == "lmmse":
        # warm start at the exact LMMSE estimate (round-3 protocol); solve
        # only the S·C distinct systems, then tile across the R replicas
        from .lmmse import empirical_covariance, lmmse_estimate_c2

        cov = empirical_covariance(train_ds)
        x0_sc, _ = lmmse_estimate_c2(A_sc, Y_sc, np.asarray(npow_sc), cov)
        x0_b = jnp.tile(jnp.asarray(x0_sc), (R, 1, 1, 1))
    else:
        raise ValueError(init)
    if init != "noise":
        # posterior samples still need distinct noise seeds; perturb init
        x0_b = x0_b + cplx.scale(cplx.randn(ki, x0_b.shape[:-1]), 0.01)

    B = A_b.shape[0]
    al_b = jnp.broadcast_to(_per_sample(alpha_step, C, R), (B,))
    be_b = jnp.broadcast_to(_per_sample(beta_noise, C, R), (B,))
    cap_coef_b = None
    if coef_cap is not None:
        if coef_cap == "auto":
            # 0.5/λ_max(AᴴA) per channel — the β=1 stability cap
            A_np = np.asarray(A2)
            Ac = A_np[..., 0] + 1j * A_np[..., 1]
            lam = np.linalg.eigvalsh(
                np.einsum("cpi,cpj->cij", Ac.conj(), Ac))[:, -1]
            cap_c = (0.5 / lam).astype(np.float32)  # (C,)
            cap_coef_b = jnp.tile(jnp.asarray(np.tile(cap_c, S_)), (R,))
        else:
            cap_coef_b = jnp.full((B,), float(coef_cap), jnp.float32)
    cap_b = None
    if stop_step is not None:
        lvls = (np.asarray(stop_step, np.int64)
                // sampling.steps_each).astype(np.int32)
        if lvls.ndim == 0:
            lvls = np.full((S_,), int(lvls), np.int32)
        cap_b = jnp.tile(jnp.repeat(jnp.asarray(lvls), C), (R,))
    chunk = chunk_size or B
    # pad to a whole number of chunks: a ragged final chunk would be a
    # SECOND compiled program (fresh 2311-level scan compiles cost tens of
    # minutes on the tunnel); padded rows are dropped after the run
    B_pad = ((B + chunk - 1) // chunk) * chunk
    if B_pad != B:
        ext = B_pad - B
        # ext may exceed B (chunk > batch): tile enough copies that the
        # pad really reaches B_pad rows — the one-compiled-shape
        # invariant must hold for any (B, chunk) (ADVICE r4)
        reps_pad = -(-ext // B)  # ceil

        def _pad(t):
            return (None if t is None else jnp.concatenate(
                [t] + [t] * reps_pad, axis=0)[:B_pad])

        A_b, Y_b, x0_b = _pad(A_b), _pad(Y_b), _pad(x0_b)
        npow_b = _pad(npow_b)
        al_b, be_b = _pad(al_b), _pad(be_b)
        cap_b, cap_coef_b = _pad(cap_b), _pad(cap_coef_b)
    sampler = jax.jit(lambda a, y, npw, x0, k, al, be, cap, ccap:
                      annealed_langevin_posterior_c2(
                          score_fn, a, y, sigmas, npw, x0, k,
                          alpha_step=al, beta_noise=be,
                          steps_each=sampling.steps_each, oracle=None,
                          capture_level=cap, coef_cap=ccap))
    finals = []
    import sys
    import time

    t0 = time.time()
    for start in range(0, B_pad, chunk):
        sl = slice(start, start + chunk)
        xf, _ = sampler(A_b[sl], Y_b[sl], npow_b[sl], x0_b[sl],
                        jax.random.fold_in(kr, start), al_b[sl], be_b[sl],
                        cap_b[sl] if cap_b is not None else None,
                        cap_coef_b[sl] if cap_coef_b is not None else None)
        finals.append(np.asarray(jax.device_get(xf)))  # c2, real — safe
        if progress:
            done = min(start + chunk, B_pad)
            rate = done / max(time.time() - t0, 1e-9)
            print(f"# mmse {done}/{B_pad} estimates "
                  f"({rate:.1f}/s, eta {(B_pad - done) / rate:.0f}s)",
                  file=sys.stderr, flush=True)
    xf = np.concatenate(finals, 0)[:B].reshape(R, S, C, *X2.shape[1:])

    mean_est = xf.mean(axis=0)  # posterior mean (S, C, Nt, Nr, 2)
    X_np = np.asarray(X2)
    nmse_mean = np.asarray(cplx.nmse(jnp.asarray(mean_est),
                                     jnp.asarray(np.broadcast_to(
                                         X_np, mean_est.shape))))
    nmse_single = np.asarray(cplx.nmse(jnp.asarray(xf[0]),
                                       jnp.asarray(np.broadcast_to(
                                           X_np, xf[0].shape))))
    return MMSEResults(nmse_mean_est=nmse_mean, nmse_single=nmse_single,
                       snr_range=snr_range, mmse_avg=mmse_avg)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Approximate MMSE via posterior-sample averaging")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--num_channels", type=int, default=20)
    p.add_argument("--mmse_avg", type=int, default=50)
    p.add_argument("--init", type=str, default="noise",
                   choices=["noise", "adjoint", "ls", "lmmse"])
    p.add_argument("--alpha_step", type=float, default=None)
    p.add_argument("--chat", type=float, default=None,
                   help="set alpha_step = chat·σ_end², i.e. the per-level "
                        "step α_i = chat·σ_i² (the round-3 lab's capped "
                        "β=1 law; use with --coef_cap auto)")
    p.add_argument("--beta_noise", type=float, default=None)
    p.add_argument("--sigma_start", type=float, default=None,
                   help="truncate the σ-schedule to σ ≤ this (warm-start "
                        "protocol; use with --init lmmse)")
    p.add_argument("--coef_cap", type=str, default=None,
                   help="data-consistency coefficient cap: 'auto' = "
                        "0.5/λ_max(AᴴA) per channel (required for β=1 "
                        "noise-init chains), or a float, or omit for the "
                        "reference rule")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="network compute dtype (bf16 ≈ +10%% NFE/s, "
                        "≤0.01 dB NMSE delta — BENCH.md Precision A/B)")
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--cache", type=str, default="/tmp/sbc_jax_cache")
    args = p.parse_args(argv)

    import jax as _jax

    if args.cache:
        _jax.config.update("jax_compilation_cache_dir", args.cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ..models import make_score_model
    from ..utils.checkpoint import load_checkpoint
    from ..eval.estimate import score_fn_from_params

    ckpt = args.checkpoint or f"models/score/{args.train}/final_model.npz"
    ck = load_checkpoint(ckpt)
    config = ck["config"]
    model = make_score_model(config.model, config.data.channels)
    params = ck["ema"] if ck["ema"] is not None else ck["params"]
    import jax.numpy as _jnp

    score_fn = score_fn_from_params(
        model, params,
        dtype=_jnp.bfloat16 if args.dtype == "bfloat16" else None)

    alpha_step = args.alpha_step
    if args.chat is not None:
        if alpha_step is not None:
            p.error("--chat and --alpha_step are mutually exclusive")
        from ..diffusion.sigmas import sigmas_from_config as _sfc

        alpha_step = float(args.chat) * float(np.asarray(_sfc(
            config.model))[-1]) ** 2

    res = run_mmse_estimation(
        score_fn, config, channel=args.train,
        snr_range=np.asarray(args.snr) if args.snr else None,
        num_channels=args.num_channels, mmse_avg=args.mmse_avg,
        init=args.init, alpha_step=alpha_step,
        beta_noise=args.beta_noise, chunk_size=args.chunk,
        sigma_start=args.sigma_start,
        coef_cap=(args.coef_cap if args.coef_cap in (None, "auto")
                  else float(args.coef_cap)),
        progress=True)
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  MMSE-avg NMSE {res.avg_db()[s]:7.2f} dB  "
              f"(single sample "
              f"{10 * np.log10(res.nmse_single.mean(-1)[s]):7.2f} dB)")
    # resolve the EFFECTIVE beta for the default filename (an unset
    # --beta_noise falls back to the config default inside the run;
    # 'betaNone' in the name misstated the protocol — ADVICE r4)
    beta_eff = (args.beta_noise if args.beta_noise is not None
                else config.sampling.beta_noise)
    out = args.output or (f"results/mmse/{args.train}-{args.init}"
                          f"-beta{beta_eff}.npz")
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
