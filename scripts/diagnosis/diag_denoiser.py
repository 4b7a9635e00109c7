"""Diagnostic: learned score (Tweedie denoiser) vs genie Gaussian Wiener.

For x~data (normalized c2 view), x~ = x + sigma*z (z iid N(0,1) per real
entry, the DSM corruption model), compare:
  - model:   x^ = x~ + sigma^2 * s_theta(x~, sigma)   (Tweedie)
  - wiener:  complex Wiener filter with the ANALYTIC TR 38.901 covariance
             (the Gaussian-genie denoiser; chanstats.analytic_full_covariance)
  - wiener-emp: same with the empirical covariance of the 2000 training
             channels (what a Gaussian fit of the train set achieves)

If the model loses to Wiener at the sigmas that matter for posterior
widths (0.05..1), the learned prior is the Fig-5c bottleneck; if it wins,
the sampler dynamics are.
"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sbc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from score_based_channels_tpu.models import make_score_model
from score_based_channels_tpu.utils.checkpoint import load_checkpoint
from score_based_channels_tpu.eval.estimate import score_fn_from_params
from score_based_channels_tpu.data.dataset import ChannelDataset
from score_based_channels_tpu.eval.chanstats import analytic_full_covariance
from score_based_channels_tpu.diffusion.sigmas import sigmas_from_config

ck = load_checkpoint("models/score/CDL-C/final_model.npz")
cfg = ck["config"]
model = make_score_model(cfg.model, cfg.data.channels)
params = ck["ema"]
score_fn = score_fn_from_params(model, params)

train_ds = ChannelDataset(1234, cfg.data, norm=cfg.data.norm_channels)
val_cfg = dataclasses.replace(cfg.data, num_channels=2000)
val_ds = ChannelDataset(4321, val_cfg, norm=list(train_ds.norm_stats))

X2 = val_ds.hermitian_c2(normalized=True)[:128]          # (C, Nt, Nr, 2)
Xc = np.asarray(val_ds.hermitian(normalized=True)[:128]) # complex (C,Nt,Nr)
C_, Nt, Nr = Xc.shape
print("per-complex-entry variance of normalized val:",
      float(np.mean(np.abs(Xc) ** 2)))

# analytic covariance (vec col-major over (Nt, Nr): idx = t + Nt*r)
Cov = analytic_full_covariance("CDL-C", num_rx=Nr, num_tx=Nt, spacing=0.5)
# empirical covariance of TRAIN channels (Gaussian fit of train set)
Htr = np.asarray(train_ds.hermitian(normalized=True))    # (N, Nt, Nr)
V = Htr.reshape(Htr.shape[0], -1, order="F")             # (N, n) col-major vec
Cov_emp = (V.T @ V.conj()) / V.shape[0]  # E[v v^H], C_ij = E[v_i v_j*]

sigmas = np.asarray(sigmas_from_config(cfg.model))
# pick levels covering sigma in [0.01, 4]
want = [4.0, 2.0, 1.0, 0.6, 0.4, 0.25, 0.15, 0.1, 0.06, 0.03, 0.015]
lvls = [int(np.argmin(np.abs(sigmas - w))) for w in want]

n = Nt * Nr
I = np.eye(n)
Xv = Xc.reshape(C_, n, order="F")                        # (C, n)
den = float(np.sum(np.abs(Xv) ** 2))

key = jax.random.key(7)
fwd = jax.jit(lambda x, s: score_fn(x, s))
print(f"{'sigma':>8} {'model':>8} {'wiener':>8} {'wien-cj':>8} {'wien-emp':>9}  (NMSE dB)")
for lv in lvls:
    s = float(sigmas[lv])
    key, kz = jax.random.split(key)
    z = jax.random.normal(kz, X2.shape, jnp.float32)
    xt = X2 + s * z
    sc = fwd(xt, jnp.float32(s))
    xhat = np.asarray(xt + s * s * sc)
    err_m = float(np.sum((xhat - np.asarray(X2)) ** 2))
    nm_model = 10 * np.log10(err_m / den)

    # complex Wiener: noise var per complex entry = 2 sigma^2
    xt_np = np.asarray(xt)
    zt = (xt_np[..., 0] + 1j * xt_np[..., 1]).reshape(C_, n, order="F")
    out = []
    for Cv in (Cov, Cov.conj(), Cov_emp):
        W = np.linalg.solve((Cv + 2 * s * s * I).T, Cv.T).T  # C (C+2s2 I)^-1
        xw = zt @ W.T
        out.append(10 * np.log10(np.sum(np.abs(xw - Xv) ** 2) / den))
    print(f"{s:8.4f} {nm_model:8.2f} {out[0]:8.2f} {out[1]:8.2f} {out[2]:9.2f}")
