"""Hyper-parameter grid search (reference tune_hparams_score.py redesigned).

The reference runs the (α_step × β_noise) grid as sequential host loops —
12 combos × 17 SNRs × 6933 steps of separate GPU work
(tune_hparams_score.py:68-148). Here the grid is just MORE BATCH: each
(α, β, SNR, channel) tuple is one row of a flattened batch with per-sample
hyper-parameters, swept in one (chunked, optionally mesh-sharded) scan.
Per-SNR argmin selection reproduces tune_hparams_score.py:150-162.
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
from ..diffusion.sigmas import sigmas_from_config
from .estimate import langevin_chunked

Array = jax.Array


@dataclasses.dataclass
class TuneResults:
    """Mirror of the reference `<ch>-hyperparameters.pt`
    (tune_hparams_score.py:180-189)."""

    nmse_log: np.ndarray  # (n_alpha, n_beta, n_snr, n_steps, n_channels)
    avg_nmse: np.ndarray
    best_nmse: np.ndarray  # (n_alpha, n_beta, n_snr)
    best_alpha_snr: np.ndarray  # (n_snr,)
    best_beta_snr: np.ndarray  # (n_snr,)
    best_step_snr: np.ndarray  # (n_snr,) argmin step index of the best combo
    snr_range: np.ndarray
    alpha_step_range: np.ndarray
    beta_noise_range: np.ndarray

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))

    @classmethod
    def load(cls, path: str) -> "TuneResults":
        with np.load(path) as f:
            return cls(**{k: f[k] for k in f.files})

    def blind_selection(self) -> tuple:
        """Single (α, β, stop step) for ALL SNRs — the blind-SNR protocol.

        The reference deploys one fixed stopping step per pilot density
        when the SNR is unknown at inference (plot_ood_results.py:12-14,
        'Best N in the paper', one β for the whole curve). Selection rule
        here: the (combo, step) minimizing the MEAN OVER SNR POINTS of
        dB-NMSE (scale-invariant across the 40 dB sweep; a linear mean
        would only weigh the lowest-SNR points). Diverged combos are
        NaN→+inf guarded.
        """
        avg = np.where(np.isfinite(self.avg_nmse), self.avg_nmse, np.inf)
        with np.errstate(divide="ignore"):
            db = 10.0 * np.log10(avg)  # (nA, nB, S, steps)
        score = db.mean(axis=2)  # mean over SNR, in dB
        iA, iB, n = np.unravel_index(int(np.argmin(score)), score.shape)
        return (float(self.alpha_step_range[iA]),
                float(self.beta_noise_range[iB]), int(n))

    def save_slim(self, path: str) -> None:
        """Selection tables only (committable; the full per-step log is
        ~350 MB — keep it out of git, ADVICE r3)."""
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        b_alpha, b_beta, b_step = self.blind_selection()
        iA = int(np.argmin(np.abs(self.alpha_step_range - b_alpha)))
        iB = int(np.argmin(np.abs(self.beta_noise_range - b_beta)))
        np.savez(
            path,
            best_alpha_snr=self.best_alpha_snr,
            best_beta_snr=self.best_beta_snr,
            best_step_snr=self.best_step_snr,
            snr_range=self.snr_range,
            alpha_step_range=self.alpha_step_range,
            beta_noise_range=self.beta_noise_range,
            best_nmse=self.best_nmse,
            blind_alpha=b_alpha, blind_beta=b_beta, blind_step=b_step,
            blind_nmse=self.avg_nmse[iA, iB, :, b_step],
        )


def run_hparam_search(
    score_fn,
    config: Config,
    channel: str = "CDL-C",
    snr_range: Optional[np.ndarray] = None,
    alpha_step_range: Sequence[float] = (3e-11, 6e-11, 1e-10, 3e-10),
    beta_noise_range: Sequence[float] = (0.1, 0.01, 0.001),
    spacing: float = 0.5,
    pilot_alpha: float = 0.6,
    num_channels: int = 100,
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 2023,
    chunk_size: Optional[int] = None,
    mesh=None,
) -> TuneResults:
    """Grid defaults follow tune_hparams_score.py:20-24."""
    if snr_range is None:
        snr_range = np.arange(-10, 32.5, 2.5)
    snr_range = np.asarray(snr_range, np.float64)
    alphas = np.asarray(alpha_step_range, np.float64)
    betas = np.asarray(beta_noise_range, np.float64)

    train_cfg = dataclasses.replace(config.data, channel=channel)
    train_ds = ChannelDataset(train_seed, train_cfg,
                              norm=config.data.norm_channels)
    num_pilots = int(np.floor(config.data.num_tx * pilot_alpha))
    val_cfg = dataclasses.replace(
        config.data, channel=channel, spacing_list=(spacing,),
        num_channels=max(num_channels, config.data.num_channels))
    val_ds = ChannelDataset(val_seed, val_cfg, norm=list(train_ds.norm_stats),
                            num_pilots=num_pilots)

    sigmas = sigmas_from_config(config.model)
    key = jax.random.key(seed)
    k_pilot, k_init, k_meas, k_run = jax.random.split(key, 4)

    X = val_ds.hermitian_c2(normalized=True)[:num_channels]  # c2
    C = X.shape[0]
    P = cplx.qpsk_pilots(k_pilot, C, config.data.num_tx, num_pilots)
    A = cplx.conj_transpose(P)
    x_init = cplx.randn(k_init, X.shape[:-1])  # shared across all combos/SNR

    nA, nB, S = len(alphas), len(betas), len(snr_range)
    noise_powers = np.asarray(
        physics.snr_to_noise_power(snr_range, config.data.num_tx), np.float32)

    # one (SNR × channels) measurement set shared across the (α, β) grid —
    # the reference regenerates noise per combo; sharing it removes
    # measurement-noise variance from the comparison (strictly better for
    # hyper-parameter selection, same expectation)
    A_sc = jnp.tile(A, (S, 1, 1, 1))
    X_sc = jnp.tile(X, (S, 1, 1, 1))
    x0_sc = jnp.tile(x_init, (S, 1, 1, 1))
    npow_sc = jnp.repeat(jnp.asarray(noise_powers), C)
    Y_sc = physics.measure_c2(k_meas, A_sc, X_sc, npow_sc)

    G = nA * nB  # grid combos
    reps = (G, 1, 1, 1)
    A_b, X_b, x0_b, Y_b = (jnp.tile(t, reps) for t in (A_sc, X_sc, x0_sc, Y_sc))
    npow_b = jnp.tile(npow_sc, (G,))
    combo_alpha = np.repeat(alphas, nB)  # combo index g = iA*nB + iB
    combo_beta = np.tile(betas, nA)
    al_b = jnp.repeat(jnp.asarray(combo_alpha, jnp.float32), S * C)
    be_b = jnp.repeat(jnp.asarray(combo_beta, jnp.float32), S * C)

    _, trace = langevin_chunked(
        score_fn, A_b, Y_b, sigmas, npow_b, x0_b, k_run, al_b, be_b,
        steps_each=config.sampling.steps_each, oracle2=X_b,
        chunk_size=chunk_size, mesh=mesh)
    n_steps = trace.shape[0]
    nmse_log = np.transpose(
        trace.reshape(n_steps, nA, nB, S, C), (1, 2, 3, 0, 4))

    avg = nmse_log.mean(axis=-1)
    # NaN-safe: diverged (α, β) combos must never win the argmin
    avg_safe = np.where(np.isfinite(avg), avg, np.inf)
    best = avg_safe.min(axis=-1)  # (nA, nB, S)
    best_step = avg_safe.argmin(axis=-1)  # (nA, nB, S)

    # per-SNR best combo (tune_hparams_score.py:155-162)
    best_alpha_snr = np.zeros(S)
    best_beta_snr = np.zeros(S)
    best_step_snr = np.zeros(S, np.int64)
    for s in range(S):
        flat = best[..., s].ravel()
        iA, iB = np.unravel_index(int(np.argmin(flat)), (nA, nB))
        best_alpha_snr[s] = alphas[iA]
        best_beta_snr[s] = betas[iB]
        best_step_snr[s] = best_step[iA, iB, s]

    return TuneResults(
        nmse_log=nmse_log, avg_nmse=avg, best_nmse=best,
        best_alpha_snr=best_alpha_snr, best_beta_snr=best_beta_snr,
        best_step_snr=best_step_snr, snr_range=snr_range,
        alpha_step_range=alphas, beta_noise_range=betas)


def main(argv=None):
    """CLI: reference `tune_hparams_score --channel --alpha_step_range
    --beta_noise_range --pilot_alpha` (tune_hparams_score.py:16-25)."""
    import argparse

    p = argparse.ArgumentParser(description="Langevin hparam grid search")
    p.add_argument("--channel", type=str, default="CDL-C")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--alpha_step_range", nargs="+", type=float,
                   default=[3e-11, 6e-11, 1e-10, 3e-10])
    p.add_argument("--beta_noise_range", nargs="+", type=float,
                   default=[0.1, 0.01, 0.001])
    p.add_argument("--pilot_alpha", type=float, default=0.6)
    p.add_argument("--spacing", type=float, default=0.5)
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--num_channels", type=int, default=50)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--full_log", action="store_true",
                   help="save the full per-step nmse_log (~350 MB) instead "
                        "of the slim selection tables")
    p.add_argument("--cache", type=str, default="/tmp/sbc_jax_cache")
    args = p.parse_args(argv)

    import jax

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ..models import make_score_model
    from ..utils.checkpoint import load_checkpoint
    from .estimate import score_fn_from_params

    ckpt = args.checkpoint or f"models/score/{args.channel}/final_model.npz"
    ck = load_checkpoint(ckpt)
    config = ck["config"]
    model = make_score_model(config.model, config.data.channels)
    params = ck["ema"] if ck["ema"] is not None else ck["params"]
    score_fn = score_fn_from_params(model, params)

    res = run_hparam_search(
        score_fn, config, channel=args.channel,
        snr_range=np.asarray(args.snr) if args.snr else None,
        alpha_step_range=tuple(args.alpha_step_range),
        beta_noise_range=tuple(args.beta_noise_range),
        spacing=args.spacing, pilot_alpha=args.pilot_alpha,
        num_channels=args.num_channels, chunk_size=args.chunk)

    out = args.output or f"results/score/{args.channel}-hyperparameters.npz"
    if args.full_log:
        res.save(out)
    else:
        res.save_slim(out)
    for s, snr in enumerate(res.snr_range):
        db = 10 * np.log10(res.best_nmse[..., s].min())
        print(f"SNR {snr:6.1f} dB  best NMSE {db:7.2f} dB  "
              f"alpha {res.best_alpha_snr[s]:.1e}  beta {res.best_beta_snr[s]:.0e}  "
              f"stop {int(res.best_step_snr[s])}")
    b_alpha, b_beta, b_step = res.blind_selection()
    print(f"blind-SNR selection: alpha {b_alpha:.1e}  beta {b_beta:.0e}  "
          f"stop {b_step}")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
