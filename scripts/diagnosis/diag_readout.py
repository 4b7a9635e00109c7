"""Experiment: mean-seeking readouts for the Langevin estimate path.

Traces, per step, the NMSE of BOTH the raw iterate (reference semantics)
and the Tweedie-denoised readout x0 = x + sigma_i^2 * posterior_score
(one fused elementwise op; the score is already computed). Also sweeps
small/zero beta. Goal: reach genie LMMSE - within 1 dB at SNR <= 10 dB
(-4.28/-9.85/-17.40 at -10/0/10).
"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sbc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from score_based_channels_tpu import cplx, physics
from score_based_channels_tpu.models import make_score_model
from score_based_channels_tpu.utils.checkpoint import load_checkpoint
from score_based_channels_tpu.eval.estimate import score_fn_from_params
from score_based_channels_tpu.data.dataset import ChannelDataset
from score_based_channels_tpu.diffusion.sigmas import sigmas_from_config

ck = load_checkpoint("models/score/CDL-C/final_model.npz")
cfg = ck["config"]
model = make_score_model(cfg.model, cfg.data.channels)
score_fn = score_fn_from_params(model, ck["ema"], dtype=jnp.bfloat16)

train_ds = ChannelDataset(1234, cfg.data, norm=cfg.data.norm_channels)
val_cfg = dataclasses.replace(cfg.data, num_channels=2000)
val_ds = ChannelDataset(4321, val_cfg, norm=list(train_ds.norm_stats),
                        num_pilots=38)

sigmas = sigmas_from_config(cfg.model)
NC = 64
X2 = val_ds.hermitian_c2(normalized=True)[:NC]
key = jax.random.key(2023)
kp, ki, km, kr = jax.random.split(key, 4)
P2 = cplx.qpsk_pilots(kp, NC, 64, 38)
A2 = cplx.conj_transpose(P2)
x0 = cplx.randn(ki, X2.shape[:-1])

snrs = np.array([-10.0, 0.0, 10.0])
S = len(snrs)
npow = np.asarray(physics.snr_to_noise_power(snrs, 64), np.float32)

A_b = jnp.tile(A2, (S, 1, 1, 1))
X_b = jnp.tile(X2, (S, 1, 1, 1))
x0_b = jnp.tile(x0, (S, 1, 1, 1))
np_b = jnp.repeat(jnp.asarray(npow), NC)
Y_b = physics.measure_c2(km, A_b, X_b, np_b)

oracle_energy = cplx.sum_abs2(X_b, axis=(-1, -2))


def run(alpha, beta, steps_each=3):
    Ah = cplx.conj_transpose(A_b)
    npb = np_b[:, None, None, None]
    sigma_end = sigmas[-1]

    def level_step(carry, sigma):
        x, k = carry
        a_i = alpha * (sigma / sigma_end) ** 2
        denom = npb / 2.0 + sigma**2
        traces = []
        for _ in range(steps_each):
            k, kz = jax.random.split(k)
            score = score_fn(x, sigma)
            mg = cplx.matmul(Ah, cplx.matmul(A_b, x) - Y_b)
            post_score = score - mg / denom
            z = cplx.randn(kz, x.shape[:-1])
            x = x + a_i * post_score + jnp.sqrt(2.0 * a_i * beta) * z
            # readouts on the NEW x (need one more score for exact Tweedie of
            # new x; use current-step score as the reference does for raw)
            err_raw = cplx.sum_abs2(x - X_b, axis=(-1, -2)) / oracle_energy
            x0h = x + sigma**2 * post_score  # Tweedie with stale score (cheap)
            err_den = cplx.sum_abs2(x0h - X_b, axis=(-1, -2)) / oracle_energy
            traces.append(jnp.stack([err_raw, err_den]))
        return (x, k), jnp.stack(traces)

    (_, _), tr = jax.lax.scan(level_step, (x0_b, kr), sigmas)
    # tr: (L, steps_each, 2, B)
    L = tr.shape[0]
    return np.asarray(tr.reshape(L * steps_each, 2, S, NC).mean(-1))


genie = {-10.0: -4.28, 0.0: -9.85, 10.0: -17.40}
for alpha, beta in [(1e-10, 0.01), (1e-10, 1e-4), (3e-10, 1e-4),
                    (3e-10, 0.0), (1e-9, 0.0)]:
    tr = run(alpha, beta)
    msg = [f"a={alpha:.0e} b={beta:g}:"]
    for s, snr in enumerate(snrs):
        raw = 10 * np.log10(tr[:, 0, s])
        den = 10 * np.log10(tr[:, 1, s])
        msg.append(f"  SNR{snr:+.0f}: raw {raw.min():6.2f}@{raw.argmin()}"
                   f" den {den.min():6.2f}@{den.argmin()}"
                   f" (genie {genie[float(snr)]})")
    print("\n".join(msg), flush=True)
