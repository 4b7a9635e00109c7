"""Experiment: two-regime step-size law.

alpha_i = chat(sigma_i) * sigma_i^2 with chat = alpha/sigma_end^2 (the
reference law) for sigma > sigma_sw, and chat = c_late below. Large
c_late lets every late level equilibrate (contraction ~ 3*c_late*lam per
level) so the iterate tracks the annealed posterior MAP instead of
freezing with ~sigma_f dispersion.
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
sig_np = np.asarray(sigmas)
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


STEPS_EACH = 3
Ah_b = cplx.conj_transpose(A_b)
npb_ = np_b[:, None, None, None]


@jax.jit
def _run_jit(al, beta):
    def level_step(carry, lev):
        sigma, a_i = lev
        x, k = carry
        denom = npb_ / 2.0 + sigma**2
        traces = []
        for _ in range(STEPS_EACH):
            k, kz = jax.random.split(k)
            score = score_fn(x, sigma)
            mg = cplx.matmul(Ah_b, cplx.matmul(A_b, x) - Y_b)
            post_score = score - mg / denom
            z = cplx.randn(kz, x.shape[:-1])
            x = x + a_i * post_score + jnp.sqrt(2.0 * a_i * beta) * z
            err_raw = cplx.sum_abs2(x - X_b, axis=(-1, -2)) / oracle_energy
            traces.append(err_raw)
        return (x, k), jnp.stack(traces)

    (_, _), tr = jax.lax.scan(level_step, (x0_b, kr), (sigmas, al))
    return tr


def run(alphas_per_level, beta):
    al = jnp.asarray(alphas_per_level, jnp.float32)
    tr = _run_jit(al, jnp.float32(beta))
    L = tr.shape[0]
    return np.asarray(tr.reshape(L * STEPS_EACH, S, NC).mean(-1))


sigma_end = sig_np[-1]
genie = {-10.0: -4.28, 0.0: -9.85, 10.0: -17.40}
base_alpha = 1e-10
ref_law = base_alpha * (sig_np / sigma_end) ** 2  # = chat_early * sigma^2

for c_late, sw, beta in [(0.03, 1.0, 1e-4), (0.1, 1.0, 1e-4),
                         (0.3, 1.0, 1e-4), (0.1, 3.0, 1e-4),
                         (0.1, 1.0, 1e-2)]:
    al = np.where(sig_np > sw, ref_law, c_late * sig_np**2)
    tr = run(al, beta)
    msg = [f"c_late={c_late} sw={sw} b={beta:g}:"]
    for s, snr in enumerate(snrs):
        raw = 10 * np.log10(tr[:, s])
        msg.append(f"  SNR{snr:+.0f}: {raw.min():6.2f}@{raw.argmin()}"
                   f" final {raw[-1]:6.2f} (genie {genie[float(snr)]})")
    print("\n".join(msg), flush=True)
