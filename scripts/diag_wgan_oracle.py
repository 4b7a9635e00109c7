"""WGAN fixed-ensemble gap: oracle decomposition (VERDICT r4 item 2).

The flagship aligned-noise WGAN row floors at -4.73 dB on the fixed
ensemble while a perfect rank-30-complex (nz=60 real) representation
floors at -9.19 dB (RESULTS.md "WGAN floor") — a ~4.5 dB unattributed
gap. This script splits it by fitting min_z ||G(z) - H||^2 DIRECTLY per
validation channel (no measurement operator, no noise, lambda=0):

    NMSE_repr(H)  = min_z ||G(z) - H||^2 / ||H||^2      (this script)
    NMSE_total(H) = the measured inversion row (-4.73 dB floor)
    inversion gap = NMSE_total - NMSE_repr   (in dB, per channel mean)

The oracle fit reuses the production inversion engine (eval/wgan.py
wgan_invert) with identity "pilots" P = I_Nt so meas = G(z) and
Y = H exactly; it sweeps an lr grid x R random z restarts so the fit
measures the GENERATOR's representation capacity, not one Adam basin
(test_wgan.py:145-176 is the protocol whose gap is being attributed).

Usage: python scripts/diag_wgan_oracle.py [checkpoint] [--ray_coupling fixed]
Writes results/baselines/wgan_oracle_<tag>.npz and prints the
decomposition table.
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sbc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from score_based_channels_tpu import cplx
from score_based_channels_tpu.config import default_score_config
from score_based_channels_tpu.data.dataset import ChannelDataset
from score_based_channels_tpu.eval.wgan import wgan_invert
from score_based_channels_tpu.models.dcgan import DCGAN_G
from score_based_channels_tpu.train.wgan import WGANTrainConfig
from score_based_channels_tpu.utils.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?",
                   default="models/wgan/CDL-C-fixed_0.50.npz")
    p.add_argument("--ray_coupling", default="fixed",
                   choices=["random", "fixed"])
    p.add_argument("--channel", default="CDL-C")
    p.add_argument("--num_channels", type=int, default=100)
    p.add_argument("--restarts", type=int, default=8)
    p.add_argument("--lr", nargs="+", type=float, default=[0.03, 0.01, 0.003])
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--chunk", type=int, default=1200)
    p.add_argument("--tag", default=None)
    args = p.parse_args()

    cfg = default_score_config(args.channel, ray_coupling=args.ray_coupling)
    ck = load_checkpoint(args.checkpoint)
    meta_tc = ck["metadata"].get("tc", {})
    tc = WGANTrainConfig(**meta_tc) if meta_tc else WGANTrainConfig()
    netG = DCGAN_G(isize=(cfg.data.num_rx, cfg.data.num_tx), nz=tc.nz,
                   ngf=tc.ngf, n_extra_layers=tc.n_extra_layers)
    g_params = ck["params"]["gen"]
    g_stats = ck["params"].get("gen_stats", {})

    def gen_apply(z):
        return netG.apply({"params": g_params, "batch_stats": g_stats}, z,
                          train=False)

    # entrywise normalization with TRAIN stats — identical to the
    # inversion row being decomposed (eval/wgan.py:157-181)
    train_ds = ChannelDataset(
        1234, dataclasses.replace(cfg.data, channel=args.channel),
        norm="entrywise")
    val_ds = ChannelDataset(
        4321, dataclasses.replace(cfg.data, channel=args.channel),
        norm=list(train_ds.norm_stats))
    C = args.num_channels
    Hn = val_ds.normalized()[:C]  # (C, Nr, Nt) complex host
    X2 = cplx.from_complex(Hn)
    Nt = cfg.data.num_tx

    # identity pilots: meas = G(z) · I = G(z), Y = H (exact, noiseless)
    I2 = np.zeros((Nt, Nt, 2), np.float32)
    I2[np.arange(Nt), np.arange(Nt), 0] = 1.0

    R, nLr = args.restarts, len(args.lr)
    B = C * R * nLr  # batch index = ((i_lr · R) + r) · C + c
    P_b = jnp.tile(jnp.asarray(I2)[None], (B, 1, 1, 1))
    X_b = jnp.tile(jnp.asarray(X2), (R * nLr, 1, 1, 1))
    Y_b = X_b
    lr_b = jnp.repeat(jnp.asarray(args.lr, jnp.float32), R * C)
    key = jax.random.key(909)
    z0 = jax.random.normal(key, (B, tc.nz))

    run = jax.jit(lambda z, pp, yy, lam, lr_, orc: wgan_invert(
        gen_apply, z, pp, yy, lam, lr_, num_steps=args.steps, oracle2=orc))

    t0 = time.time()
    traces = []
    chunk = min(args.chunk, B)
    for start in range(0, B, chunk):
        sl = slice(start, min(start + chunk, B))
        n_valid = P_b[sl].shape[0]
        idx = (np.arange(start, start + chunk) % B
               if n_valid < chunk else None)
        take = (lambda t: t[jnp.asarray(idx)]) if idx is not None \
            else (lambda t: t[sl])
        _, (o, m, r) = run(take(z0), take(P_b), take(Y_b),
                           jnp.zeros((chunk,), jnp.float32), take(lr_b),
                           take(X_b))
        traces.append(np.asarray(o)[:, :n_valid])
        print(f"# oracle fit {min(start + chunk, B)}/{B} "
              f"[{time.time() - t0:.0f}s]", file=sys.stderr, flush=True)
    o = np.concatenate(traces, axis=1)  # (steps, B)
    o = o.reshape(args.steps, nLr, R, C)

    # per-channel best over (lr, restart, step) = representation error
    best_pc = o.min(axis=(0, 1, 2))  # (C,)
    # single-basin protocol (1 restart, per-lr): optimization sensitivity
    single_pc = o[:, :, 0, :].min(axis=0)  # (nLr, C)

    repr_db = 10 * np.log10(best_pc.mean())
    print(f"\noracle representation floor (min over {nLr} lr x {R} "
          f"restarts x {args.steps} steps, {C} channels):")
    print(f"  mean NMSE = {repr_db:.2f} dB")
    for i, lr in enumerate(args.lr):
        print(f"  single-restart lr={lr}: "
              f"{10 * np.log10(single_pc[i].mean()):.2f} dB")
    print(f"  per-channel p10/p50/p90: "
          f"{10 * np.log10(np.percentile(best_pc, 10)):.2f} / "
          f"{10 * np.log10(np.percentile(best_pc, 50)):.2f} / "
          f"{10 * np.log10(np.percentile(best_pc, 90)):.2f} dB")

    tag = args.tag or ("fixed" if args.ray_coupling == "fixed" else "random")
    out = f"results/baselines/wgan_oracle_{tag}.npz"
    import os

    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, best_per_channel=best_pc, single_per_channel=single_pc,
             lr_range=np.asarray(args.lr), restarts=R, steps=args.steps,
             trace_mean=o.mean(-1).min(axis=2))  # (steps, nLr) mean curve
    print(f"saved {out} [{time.time() - t0:.0f}s total]")


if __name__ == "__main__":
    main()
