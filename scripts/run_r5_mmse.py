"""Round-5 MMSE-at-scale: symmetrize ensembles + per-SNR chat (VERDICT r4 item 6).

Round 4 left the two headline MMSE rows asymmetric: random ensemble =
noise-init beta=1 (CDL-C-noise-beta1.0.npz) while the fixed-ensemble
flagship row = LMMSE-warm beta=1. And the noise-init gap to the genie
bound grew to 0.89 dB at 30 dB with one globally-calibrated chat.

Phases (run separately; the TPU tunnel is single-process):
  --phase fixed    fixed-ensemble noise-init beta=1 at the reference scale
                   (100 ch x 17 SNR x 50 samples), global-chat calibration
                   identical to the r4 random run -> the symmetric row.
  --phase persnr   per-SNR chat calibration (full 17-SNR grid, 8 ch x 8
                   replicas per chat value) followed by a production run
                   with the per-SNR alpha array (run_mmse_estimation
                   broadcasts per-SNR hyper-parameters per sample) ->
                   closes the high-SNR gap of the global-chat law.
                   --ensemble picks the checkpoint/dataset.

Protocol constants shared with scripts/run_mmse_scale.py: beta=1 chains
(replica diversity), coef_cap auto = 0.5/lambda_max data-term stability
cap, capped step law alpha_i = chat * sigma_i^2
(reference protocol: test_mmse.py:104,181-192).
"""

import argparse
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sbc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from score_based_channels_tpu.baselines.mmse import run_mmse_estimation
from score_based_channels_tpu.diffusion.sigmas import sigmas_from_config
from score_based_channels_tpu.eval.estimate import score_fn_from_params
from score_based_channels_tpu.models import make_score_model
from score_based_channels_tpu.utils.checkpoint import load_checkpoint

CKPTS = {
    "random": "models/score/CDL-C/final_model.npz",
    "fixed": "models/score/CDL-C-fixedcoupling/final_model.npz",
}
CHAT_GRID = (0.01, 0.03, 0.1)
# the per-SNR phase extends the grid upward: the global-chat law's gap
# grows with SNR (0.89 dB at 30 dB), i.e. high SNR wants a stronger step.
# Descending order: the NEW upper value calibrates first, so a wall-clock
# cutoff mid-grid still answers the high-SNR question (order does not
# affect the argmin).
CHAT_GRID_PERSNR = (0.3, 0.1, 0.03, 0.01)


def load_score_fn(ensemble):
    ck = load_checkpoint(CKPTS[ensemble])
    config = ck["config"]
    model = make_score_model(config.model, config.data.channels)
    score_fn = score_fn_from_params(
        model, ck["ema"] if ck["ema"] is not None else ck["params"],
        dtype=jnp.bfloat16)
    sigma_end = float(np.asarray(sigmas_from_config(config.model))[-1])
    return score_fn, config, sigma_end


def phase_fixed():
    """Global-chat calibration + production on the FIXED ensemble —
    protocol-identical to the committed random-ensemble run."""
    score_fn, config, sigma_end = load_score_fn("fixed")
    t0 = time.time()
    cal_snr = np.array([0.0, 10.0, 20.0, 30.0])
    best = (None, np.inf)
    for chat in CHAT_GRID:
        res = run_mmse_estimation(
            score_fn, config, snr_range=cal_snr, num_channels=8, mmse_avg=8,
            init="noise", beta_noise=1.0, alpha_step=chat * sigma_end**2,
            coef_cap="auto", chunk_size=256, progress=True)
        score = float(np.mean(res.avg_db()))
        print(f"# calib chat={chat}: avg_db={np.round(res.avg_db(), 2)} "
              f"mean={score:.2f} [{time.time()-t0:.0f}s]", flush=True)
        if score < best[1]:
            best = (chat, score)
    chat = best[0]
    print(f"# production run (fixed ensemble) with chat={chat}", flush=True)
    res = run_mmse_estimation(
        score_fn, config, num_channels=100, mmse_avg=50,
        init="noise", beta_noise=1.0, alpha_step=chat * sigma_end**2,
        coef_cap="auto", chunk_size=256, progress=True)
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  MMSE-avg NMSE {res.avg_db()[s]:7.2f} dB "
              f"(single {10*np.log10(res.nmse_single.mean(-1)[s]):7.2f} dB)",
              flush=True)
    out = "results/mmse/CDL-C-fixed-noise-beta1.0.npz"
    res.save(out)
    print(f"saved {out} (chat={chat}) [{time.time()-t0:.0f}s total]")


def phase_persnr(ensemble, num_channels=100):
    """Per-SNR chat: calibrate on the full 17-SNR grid, produce with the
    per-SNR alpha array."""
    score_fn, config, sigma_end = load_score_fn(ensemble)
    t0 = time.time()
    snr_range = np.arange(-10, 32.5, 2.5)
    S = len(snr_range)
    grid = CHAT_GRID_PERSNR
    cal = np.full((len(grid), S), np.inf)
    for i, chat in enumerate(grid):
        res = run_mmse_estimation(
            score_fn, config, snr_range=snr_range, num_channels=8,
            mmse_avg=8, init="noise", beta_noise=1.0,
            alpha_step=chat * sigma_end**2, coef_cap="auto",
            chunk_size=256, progress=True)
        db = res.avg_db()
        cal[i] = np.where(np.isfinite(db), db, np.inf)  # diverged → never wins
        print(f"# calib chat={chat}: {np.round(cal[i], 2)} "
              f"[{time.time()-t0:.0f}s]", flush=True)
    chat_snr = np.asarray(grid)[np.argmin(cal, axis=0)]  # (S,)
    print(f"# per-SNR chat: {chat_snr}", flush=True)
    alpha_snr = (chat_snr * sigma_end**2).astype(np.float32)
    res = run_mmse_estimation(
        score_fn, config, snr_range=snr_range, num_channels=num_channels,
        mmse_avg=50,
        init="noise", beta_noise=1.0, alpha_step=alpha_snr,
        coef_cap="auto", chunk_size=256, progress=True)
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  chat {chat_snr[s]}  MMSE-avg NMSE "
              f"{res.avg_db()[s]:7.2f} dB "
              f"(single {10*np.log10(res.nmse_single.mean(-1)[s]):7.2f} dB)",
              flush=True)
    tag = "" if ensemble == "random" else f"-{ensemble}"
    out = f"results/mmse/CDL-C{tag}-noise-beta1.0-persnr.npz"
    res.save(out)
    np.savez(out.replace(".npz", "-chat.npz"), chat_snr=chat_snr,
             snr_range=snr_range, cal_db=cal,
             chat_grid=np.asarray(grid))
    print(f"saved {out} [{time.time()-t0:.0f}s total]")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--phase", required=True, choices=["fixed", "persnr"])
    p.add_argument("--ensemble", default="random",
                   choices=["random", "fixed"])
    p.add_argument("--num_channels", type=int, default=100,
                   help="persnr production scale (the calibration gain "
                        "measurement tolerates 50 when wall-clock is "
                        "tight; the global-chat row stays at 100)")
    args = p.parse_args()
    if args.phase == "fixed":
        phase_fixed()
    else:
        phase_persnr(args.ensemble, num_channels=args.num_channels)
