"""Reference-scale approximate-MMSE run (VERDICT r3 item 2).

Protocol of reference test_mmse.py:104,181-192 — tile each of 100
validation channels x 50 posterior samples across the full 17-point SNR
grid and average — with the round-3 corrected temperature: beta=1 chains
(beta=0.01 replica chains collapse, RESULTS.md), the capped
data-consistency coefficient (0.5/lambda_max stability bound), and the
capped step law alpha_i = chat * sigma_i^2.

Phase 1 calibrates chat on a small grid (8 channels x 4 SNRs x 8
replicas = one 256-chunk, the SAME compiled program as production);
phase 2 runs the full 100x17x50 grid with the winner and saves
results/mmse/<model>-noise-beta1.0.npz.

Usage: python scripts/run_mmse_scale.py [checkpoint] (TPU, ~2 h)
"""

import sys
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

CKPT = sys.argv[1] if len(sys.argv) > 1 else "models/score/CDL-C/final_model.npz"
TAG = sys.argv[2] if len(sys.argv) > 2 else "CDL-C"

ck = load_checkpoint(CKPT)
config = ck["config"]
model = make_score_model(config.model, config.data.channels)
score_fn = score_fn_from_params(
    model, ck["ema"] if ck["ema"] is not None else ck["params"],
    dtype=jnp.bfloat16)
sigma_end = float(np.asarray(sigmas_from_config(config.model))[-1])

t0 = time.time()
cal_snr = np.array([0.0, 10.0, 20.0, 30.0])
best = (None, np.inf)
for chat in (0.01, 0.03, 0.1):
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
print(f"# production run with chat={chat}", flush=True)
res = run_mmse_estimation(
    score_fn, config, num_channels=100, mmse_avg=50,
    init="noise", beta_noise=1.0, alpha_step=chat * sigma_end**2,
    coef_cap="auto", chunk_size=256, progress=True)
for s, snr in enumerate(res.snr_range):
    print(f"SNR {snr:6.1f} dB  MMSE-avg NMSE {res.avg_db()[s]:7.2f} dB  "
          f"(single {10*np.log10(res.nmse_single.mean(-1)[s]):7.2f} dB)",
          flush=True)
out = f"results/mmse/{TAG}-noise-beta1.0.npz"
res.save(out)
print(f"saved {out} (chat={chat}) [{time.time()-t0:.0f}s total]")
