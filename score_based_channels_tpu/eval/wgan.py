"""WGAN latent-optimization channel estimation (reference test_wgan.py).

Inversion: optimize z with Adam on ‖G(z)·P − Y‖² + λ‖z‖² for 5000 steps,
logging oracle NMSE / measurement / regularizer at every step
(test_wgan.py:139-176). The (λ × lr × pilot_α × SNR × channel) product is
flattened into one batch with a hand-rolled per-sample Adam (per-sample
learning rates — one compiled scan for the whole grid), replacing the
reference's sequential meta-loop (test_wgan.py:82,102).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..config import Config
from ..data.dataset import ChannelDataset
from ..models.dcgan import DCGAN_G
from ..train.wgan import WGANTrainConfig
from ..utils.checkpoint import load_checkpoint

Array = jax.Array


def wgan_invert(
    generator_apply,  # z (B, nz) -> channels c2 (B, Nr, Nt, 2)
    z0: Array,  # (B, nz)
    P2: Array,  # (B, Nt, Np, 2) pilots
    Y2: Array,  # (B, Nr, Np, 2) measurements
    l2lam: Array,  # scalar or (B,)
    lr: Array,  # scalar or (B,)
    num_steps: int = 5000,
    oracle2: Optional[Array] = None,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Array, Optional[np.ndarray]]:
    """Per-sample-Adam latent optimization; returns (final channels, traces).

    traces = (oracle_nmse, meas_loss, reg_loss) each (num_steps, B).
    """
    B = z0.shape[0]
    l2lam = jnp.broadcast_to(jnp.asarray(l2lam, jnp.float32), (B,))
    lr = jnp.broadcast_to(jnp.asarray(lr, jnp.float32), (B,))
    track = oracle2 is not None
    if track:
        oracle_energy = cplx.sum_abs2(oracle2, axis=(-1, -2))

    def sample_losses(z):
        gen = generator_apply(z)  # (B, Nr, Nt, 2)
        meas = cplx.matmul(gen, P2)  # (B, Nr, Np, 2)
        meas_loss = cplx.sum_abs2(meas - Y2, axis=(-1, -2))  # (B,)
        reg_loss = jnp.sum(z * z, axis=-1)  # (B,)
        return meas_loss, reg_loss, gen

    def total_loss(z):
        meas_loss, reg_loss, gen = sample_losses(z)
        return jnp.mean(meas_loss + l2lam * reg_loss), (meas_loss, reg_loss,
                                                        gen)

    grad_fn = jax.grad(total_loss, has_aux=True)

    def body(carry, i):
        z, m, v = carry
        g, (meas_loss, reg_loss, gen) = grad_fn(z)
        # mean over batch in the loss ⇒ rescale grads to per-sample scale
        g = g * B
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        t = i + 1
        mhat = m / (1 - beta1**t)
        vhat = v / (1 - beta2**t)
        z = z - lr[:, None] * mhat / (jnp.sqrt(vhat) + eps)
        ys = None
        if track:
            nm = (cplx.sum_abs2(gen - oracle2, axis=(-1, -2))
                  / oracle_energy).astype(jnp.float32)
            ys = (nm, meas_loss.astype(jnp.float32),
                  reg_loss.astype(jnp.float32))
        return (z, m, v), ys

    init = (z0, jnp.zeros_like(z0), jnp.zeros_like(z0))
    (zf, _, _), traces = jax.lax.scan(
        body, init, jnp.arange(num_steps, dtype=jnp.float32))
    _, _, gen_final = sample_losses(zf)
    return gen_final, traces


@dataclasses.dataclass
class WGANEvalResults:
    oracle_log: np.ndarray  # (nL, nR, nA, S, steps, C)
    meas_log: np.ndarray
    reg_log: np.ndarray
    snr_range: np.ndarray
    l2lam_range: np.ndarray
    lr_range: np.ndarray
    pilot_alpha_range: np.ndarray

    def best_nmse_db(self) -> np.ndarray:
        """min over steps of mean over channels, then min over (λ, lr)."""
        avg = self.oracle_log.mean(-1).min(-1)  # (nL, nR, nA, S)
        return 10 * np.log10(avg.min(axis=(0, 1)))  # (nA, S)

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def run_wgan_eval(
    config: Config,
    checkpoint: str,
    channel: str = "CDL-C",
    snr_range: Optional[np.ndarray] = None,
    l2lam_range: Sequence[float] = (0.1, 0.3, 1.0, 3.0),
    lr_range: Sequence[float] = (0.03, 0.01, 0.003, 0.001),
    pilot_alpha_range: Sequence[float] = (0.6,),
    num_steps: int = 5000,
    num_channels: int = 100,
    train_seed: int = 1234,
    val_seed: int = 4321,
    seed: int = 2021,
    chunk_size: Optional[int] = None,
    noise_convention: str = "reference",
    restarts: int = 1,
) -> WGANEvalResults:
    """Reference grids: λ∈{.1,.3,1,3}, lr∈{.03,.01,.003,.001}, SNR −10…15
    step 2.5, noise WITHOUT the Nt factor (test_wgan.py:74-80).

    noise_convention: "reference" keeps test_wgan.py:75's noise
    10^(−SNR/10) (its SNR axis sits ≈10·log10(64)=18 dB left of every
    other baseline's); "aligned" uses the pipeline-wide
    10^(−SNR/10)·Nt (test_score.py:75) so the WGAN row is SNR-comparable
    in the flagship table (VERDICT r3 weak #4).

    restarts: R independent z inits per (λ, lr, SNR, channel); the
    reported chain per cell is the restart with the LOWEST final
    objective (measurement + λ·reg — measurable at deployment, no
    oracle), addressing Adam-basin sensitivity of the non-convex
    inversion (round-5 WGAN-gap work; the reference uses one fixed
    z init, test_wgan.py:96-97)."""
    if snr_range is None:
        snr_range = np.arange(-10, 17.5, 2.5)
    snr_range = np.asarray(snr_range, np.float64)

    ck = load_checkpoint(checkpoint)
    meta_tc = ck["metadata"].get("tc", {})
    tc = WGANTrainConfig(**meta_tc) if meta_tc else WGANTrainConfig()
    isize = (config.data.num_rx, config.data.num_tx)
    netG = DCGAN_G(isize=isize, nz=tc.nz, ngf=tc.ngf,
                   n_extra_layers=tc.n_extra_layers)
    g_params = ck["params"]["gen"]
    g_stats = ck["params"].get("gen_stats", {})

    def gen_apply(z):
        return netG.apply({"params": g_params, "batch_stats": g_stats}, z,
                          train=False)

    # entrywise normalization with TRAIN stats (test_wgan.py:52,116)
    train_cfg = dataclasses.replace(config.data, channel=channel)
    train_ds = ChannelDataset(train_seed, train_cfg, norm="entrywise")

    nL, nR = len(l2lam_range), len(lr_range)
    nA, S, C = len(pilot_alpha_range), len(snr_range), num_channels
    oracle_log = np.zeros((nL, nR, nA, S, num_steps, C), np.float32)
    meas_log = np.zeros_like(oracle_log)
    reg_log = np.zeros_like(oracle_log)

    key = jax.random.key(seed)
    # fixed global init z (test_wgan.py:96-97); with restarts > 1, R
    # independent draws per channel (restart axis OUTERMOST in the batch)
    k_z, key = jax.random.split(key)
    R = int(restarts)
    z_init = jax.random.normal(k_z, (R, C, tc.nz))

    for i_al, pilot_alpha in enumerate(pilot_alpha_range):
        num_pilots = int(np.floor(config.data.num_tx * pilot_alpha))
        val_cfg = dataclasses.replace(
            config.data, channel=channel,
            num_channels=max(C, config.data.num_channels))
        val_ds = ChannelDataset(val_seed, val_cfg,
                                norm=list(train_ds.norm_stats),
                                num_pilots=num_pilots)
        # non-Hermitian view (test_wgan.py:123-126)
        Hn = val_ds.normalized()[:C]  # (C, Nr, Nt) complex host
        X2 = cplx.from_complex(Hn)
        k = jax.random.fold_in(key, i_al)
        kp, km = jax.random.split(k)
        P2 = cplx.qpsk_pilots(kp, C, config.data.num_tx, num_pilots)

        # reference: noise = 10^(−SNR/10), NO Nt factor (test_wgan.py:75);
        # aligned: ·Nt, the convention of every other baseline
        nt_fac = (config.data.num_tx if noise_convention == "aligned"
                  else 1.0)
        npow = np.repeat(10.0 ** (-snr_range / 10.0) * nt_fac,
                         C).astype(np.float32)
        P_sc = jnp.tile(P2, (S, 1, 1, 1))
        X_sc = jnp.tile(X2, (S, 1, 1, 1))
        Y_sc = cplx.matmul(X_sc, P_sc)
        w = cplx.randn(km, Y_sc.shape[:-1])
        Y_sc = Y_sc + w * jnp.sqrt(jnp.asarray(npow))[:, None, None, None]

        G = nL * nR
        P_b = jnp.tile(P_sc, (R * G, 1, 1, 1))
        X_b = jnp.tile(X_sc, (R * G, 1, 1, 1))
        Y_b = jnp.tile(Y_sc, (R * G, 1, 1, 1))
        z_b = jnp.reshape(
            jnp.tile(z_init[:, None], (1, G * S, 1, 1)), (-1, tc.nz))
        lam_b = jnp.tile(jnp.repeat(
            jnp.asarray(np.repeat(l2lam_range, nR), jnp.float32), S * C),
            (R,))
        lr_b = jnp.tile(jnp.repeat(
            jnp.asarray(np.tile(lr_range, nL), jnp.float32), S * C), (R,))

        run = jax.jit(lambda z0, p, y, lam, lr_, orc: wgan_invert(
            gen_apply, z0, p, y, lam, lr_, num_steps=num_steps, oracle2=orc))
        B = P_b.shape[0]
        chunk = chunk_size or B
        tr_o, tr_m, tr_r = [], [], []
        for start in range(0, B, chunk):
            sl = slice(start, start + chunk)
            _, (o, m, r) = run(z_b[sl], P_b[sl], Y_b[sl], lam_b[sl],
                               lr_b[sl], X_b[sl])
            tr_o.append(np.asarray(o))
            tr_m.append(np.asarray(m))
            tr_r.append(np.asarray(r))
        lam_np = np.asarray(lam_b).reshape(R, nL, nR, S, C)
        for logs, parts in ((oracle_log, tr_o), (meas_log, tr_m),
                            (reg_log, tr_r)):
            t = np.concatenate(parts, axis=1).reshape(
                num_steps, R, nL, nR, S, C)
            if R > 1:
                # per-cell restart selection by FINAL objective (no oracle)
                tm = np.concatenate(tr_m, axis=1).reshape(
                    num_steps, R, nL, nR, S, C)
                trg = np.concatenate(tr_r, axis=1).reshape(
                    num_steps, R, nL, nR, S, C)
                obj = tm[-1] + lam_np * trg[-1]  # (R, nL, nR, S, C)
                pick = np.argmin(obj, axis=0)[None, None]  # (1,1,nL,nR,S,C)
                t = np.take_along_axis(t, np.broadcast_to(
                    pick, (num_steps, 1) + t.shape[2:]), axis=1)
            logs[:, :, i_al] = np.transpose(
                t[:, 0].reshape(num_steps, nL, nR, S, C), (1, 2, 3, 0, 4))

    return WGANEvalResults(
        oracle_log=oracle_log, meas_log=meas_log, reg_log=reg_log,
        snr_range=snr_range, l2lam_range=np.asarray(l2lam_range),
        lr_range=np.asarray(lr_range),
        pilot_alpha_range=np.asarray(pilot_alpha_range))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="WGAN latent-inversion estimation")
    p.add_argument("--model", type=str, default="CDL-C")
    p.add_argument("--channel", type=str, default="CDL-C")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--spacing", type=float, default=0.5)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--num_channels", type=int, default=100)
    p.add_argument("--l2lam_range", nargs="+", type=float,
                   default=[0.1, 0.3, 1.0, 3.0])
    p.add_argument("--lr_range", nargs="+", type=float,
                   default=[0.03, 0.01, 0.003, 0.001])
    p.add_argument("--alpha_range", nargs="+", type=float, default=[0.6])
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--snr", nargs="+", type=float, default=None)
    p.add_argument("--restarts", type=int, default=1,
                   help="independent z inits per cell; the reported chain "
                        "is the restart with the lowest final objective "
                        "(measurement + lambda*reg — no oracle)")
    p.add_argument("--noise_convention", type=str, default="reference",
                   choices=["reference", "aligned"],
                   help="reference = test_wgan.py:75 (no Nt factor, SNR "
                        "axis ~18 dB off the other baselines); aligned = "
                        "the pipeline-wide 10^(-SNR/10)*Nt")
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="override the dataset ensemble (fixed = the "
                        "paper-matching per-drop coupling)")
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args(argv)

    from ..config import default_score_config

    cfg = default_score_config(args.model)
    if args.ray_coupling:
        import dataclasses as _dc

        cfg = cfg.replace(data=_dc.replace(cfg.data,
                                           ray_coupling=args.ray_coupling))
    ckpt = args.checkpoint or f"models/wgan/{args.model}_{args.spacing:.2f}.npz"
    res = run_wgan_eval(
        cfg, ckpt, channel=args.channel,
        snr_range=np.asarray(args.snr) if args.snr else None,
        l2lam_range=tuple(args.l2lam_range), lr_range=tuple(args.lr_range),
        pilot_alpha_range=tuple(args.alpha_range), num_steps=args.steps,
        num_channels=args.num_channels, chunk_size=args.chunk,
        noise_convention=args.noise_convention, restarts=args.restarts)
    db = res.best_nmse_db()
    for i_al, al in enumerate(res.pilot_alpha_range):
        for s, snr in enumerate(res.snr_range):
            print(f"alpha {al} SNR {snr:6.1f} dB NMSE {db[i_al, s]:7.2f} dB")
    out = args.output or (f"results/wgan/model-{args.model}_"
                          f"channel-{args.channel}.npz")
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
