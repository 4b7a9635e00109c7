"""TPU sampler lab: runtime-configurable Langevin variants, ONE compile.

All knobs are device inputs: sigma schedule (L,), per-level alpha (L,),
data-consistency coefficient cap (scalar; large value = reference
behavior), beta (scalar). The 2311-level scan compiles once (~30 min on
this tunnel) and every config thereafter runs in ~15 s.

Usage: python scripts_lab_sampler.py [config names...]
"""
import dataclasses
import sys
import time
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

sigmas_std = np.asarray(sigmas_from_config(cfg.model))
L = sigmas_std.shape[0]
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
Ah_b = cplx.conj_transpose(A_b)
npb_ = np_b[:, None, None, None]
STEPS_EACH = 3


@jax.jit
def run_lab_g(A, Y, X, x0, npw, k0, sig, al, coef_cap, beta):
    """Generic lab: all data + schedule as runtime inputs -> (trace, x_fin)."""
    Ah = cplx.conj_transpose(A)
    npb = npw[:, None, None, None]
    oe = cplx.sum_abs2(X, axis=(-1, -2))

    def level_step(carry, lev):
        sigma, a_i = lev
        x, k = carry
        denom = npb / 2.0 + sigma**2
        coef = jnp.minimum(a_i / denom, coef_cap)
        traces = []
        for _ in range(STEPS_EACH):
            k, kz = jax.random.split(k)
            score = score_fn(x, sigma)
            mg = cplx.matmul(Ah, cplx.matmul(A, x) - Y)
            z = cplx.randn(kz, x.shape[:-1])
            x = (x + a_i * score - coef * mg
                 + jnp.sqrt(2.0 * a_i * beta) * z)
            err = cplx.sum_abs2(x - X, axis=(-1, -2)) / oe
            traces.append(err)
        return (x, k), jnp.stack(traces)

    (x_fin, _), tr = jax.lax.scan(level_step, (x0, k0), (sig, al))
    return tr, x_fin


@jax.jit
def run_lab_h(A, Y, X, x0, npw, k0, sig, al, beta_vec, coef_cap, w):
    """Lab v3: per-level beta (L,) and trajectory-mean weights w (L,).
    Returns (trace, x_final, x_weighted_mean) — the weighted mean is the
    ergodic-average readout sum_i w_i x_i / sum_i w_i over levels (taken
    after each level's last inner step)."""
    Ah = cplx.conj_transpose(A)
    npb = npw[:, None, None, None]
    oe = cplx.sum_abs2(X, axis=(-1, -2))

    def level_step(carry, lev):
        sigma, a_i, b_i, w_i = lev
        x, acc, k = carry
        denom = npb / 2.0 + sigma**2
        coef = jnp.minimum(a_i / denom, coef_cap)
        traces = []
        for _ in range(STEPS_EACH):
            k, kz = jax.random.split(k)
            score = score_fn(x, sigma)
            mg = cplx.matmul(Ah, cplx.matmul(A, x) - Y)
            z = cplx.randn(kz, x.shape[:-1])
            x = (x + a_i * score - coef * mg
                 + jnp.sqrt(2.0 * a_i * b_i) * z)
            err = cplx.sum_abs2(x - X, axis=(-1, -2)) / oe
            traces.append(err)
        acc = acc + w_i * x
        return (x, acc, k), jnp.stack(traces)

    acc0 = jnp.zeros_like(x0)
    (x_fin, acc, _), tr = jax.lax.scan(
        level_step, (x0, acc0, k0), (sig, al, beta_vec, w))
    return tr, x_fin, acc / jnp.sum(w)


def run_lab(sig, al, coef_cap, beta):
    tr, _ = run_lab_g(A_b, Y_b, X_b, x0_b, np_b, kr,
                      jnp.asarray(sig, jnp.float32),
                      jnp.asarray(al, jnp.float32),
                      jnp.float32(coef_cap), jnp.float32(beta))
    return tr


GENIE = {-10.0: -4.28, 0.0: -9.85, 10.0: -17.40}


def report(name, tr):
    tr = np.asarray(tr.reshape(L * STEPS_EACH, S, NC).mean(-1))
    msg = [f"{name}:"]
    for s, snr in enumerate(snrs):
        db = 10 * np.log10(tr[:, s])
        msg.append(f"  SNR{snr:+.0f}: best {db.min():6.2f}@{db.argmin()}"
                   f" final {db[-1]:6.2f} (genie {GENIE[float(snr)]})")
    print("\n".join(msg), flush=True)


def main():
    t0 = time.time()
    lam_max = 173.7  # lambda_max(A^H A), 38 QPSK pilots (surrogate measured)
    configs = {}
    for chat in (0.01, 0.03, 0.1, 0.3):
        configs[f"cap0.5_chat{chat}"] = dict(
            sig=sigmas_std, al=chat * sigmas_std**2,
            coef_cap=0.5 / lam_max, beta=0.01)
    configs["reference_tuned"] = dict(   # sanity: must reproduce -1/-6.7/-14.3
        sig=sigmas_std, al=1e-10 * (sigmas_std / sigmas_std[-1]) ** 2,
        coef_cap=1e9, beta=0.01)
    names = sys.argv[1:] or list(configs)
    for nm in names:
        c = configs[nm]
        tr = run_lab(jnp.asarray(c["sig"], jnp.float32),
                     jnp.asarray(c["al"], jnp.float32),
                     jnp.float32(c["coef_cap"]), jnp.float32(c["beta"]))
        report(f"{nm} [{time.time()-t0:.0f}s]", tr)


def main_avg():
    """Posterior-diversity experiment: S=3 SNRs x NC2=8 channels x R=8
    replicas sharing (A, Y); does beta~1 restore sample diversity so the
    R-average approaches the genie bound?"""
    t0 = time.time()
    S2, NC2, R = 3, 8, 8
    X2s = X2[:NC2]
    ka, kb, kc, kd = jax.random.split(jax.random.key(77), 4)
    P2s = cplx.qpsk_pilots(ka, NC2, 64, 38)
    A2s = cplx.conj_transpose(P2s)
    A_sc = jnp.tile(A2s, (S2, 1, 1, 1))
    X_sc = jnp.tile(X2s, (S2, 1, 1, 1))
    np_sc = jnp.repeat(jnp.asarray(npow), NC2)
    Y_sc = physics.measure_c2(kb, A_sc, X_sc, np_sc)
    # replicas share measurements; fresh init per replica
    reps = (R, 1, 1, 1)
    A_r, Y_r, X_r = (jnp.tile(t, reps) for t in (A_sc, Y_sc, X_sc))
    np_r = jnp.tile(np_sc, (R,))
    x0_r = cplx.randn(kc, A_r.shape[:1] + X2.shape[1:-1])

    lam_max = 173.7
    cfgs = {
        "std_b0.01": (1e-10 * (sigmas_std / sigmas_std[-1]) ** 2, 1e9, 0.01),
        "std_b0.3": (1e-10 * (sigmas_std / sigmas_std[-1]) ** 2, 1e9, 0.3),
        "std_b1.0": (1e-10 * (sigmas_std / sigmas_std[-1]) ** 2, 1e9, 1.0),
        "cap_chat0.01_b1.0": (0.01 * sigmas_std**2, 0.5 / lam_max, 1.0),
        "cap_chat0.03_b1.0": (0.03 * sigmas_std**2, 0.5 / lam_max, 1.0),
        "cap_chat0.1_b1.0": (0.1 * sigmas_std**2, 0.5 / lam_max, 1.0),
        "cap_chat0.03_b0.5": (0.03 * sigmas_std**2, 0.5 / lam_max, 0.5),
        "cap_chat0.1_b0.5": (0.1 * sigmas_std**2, 0.5 / lam_max, 0.5),
    }
    import os
    want = os.environ.get("AVG_CONFIGS")
    if want:
        cfgs = {k: v for k, v in cfgs.items() if k in want.split(",")}
    for nm, (al, cap, beta) in cfgs.items():
        tr, xf = run_lab_g(A_r, Y_r, X_r, x0_r, np_r, kd,
                           jnp.asarray(sigmas_std, jnp.float32),
                           jnp.asarray(al, jnp.float32),
                           jnp.float32(cap), jnp.float32(beta))
        tr = np.asarray(tr.reshape(L * STEPS_EACH, R, S2, NC2).mean(-1))
        xf = np.asarray(xf).reshape(R, S2, NC2, *xf.shape[1:])
        xm = xf.mean(0)
        Xs_np = np.asarray(X_sc).reshape(S2, NC2, *xf.shape[3:])
        oe = (Xs_np ** 2).sum((-1, -2, -3))
        e_mean = (((xm - Xs_np) ** 2).sum((-1, -2, -3)) / oe).mean(-1)
        e_one = (((xf[0] - Xs_np) ** 2).sum((-1, -2, -3)) / oe).mean(-1)
        msg = [f"{nm} [{time.time()-t0:.0f}s]:"]
        for s, snr in enumerate(snrs):
            db_tr = 10 * np.log10(tr[:, 0, s])  # replica 0 trace
            msg.append(
                f"  SNR{snr:+.0f}: single best {db_tr.min():6.2f}@"
                f"{db_tr.argmin()} final {10*np.log10(e_one[s]):6.2f}"
                f" | mean-of-{R} final {10*np.log10(e_mean[s]):6.2f}"
                f" (genie {GENIE[float(snr)]})")
        print("\n".join(msg), flush=True)


def main_tail():
    """Ergodic-average (single-trajectory posterior-mean) experiment:
    64 channels x 3 SNRs, weighted trajectory mean over a level window."""
    t0 = time.time()
    lam_max = 173.7
    Xs_np = np.asarray(X_b)
    oe = (Xs_np ** 2).sum((-1, -2, -3))
    for nm, chat, beta, lo_frac in [
        ("chat0.01_b1_tail45-65%", 0.01, 1.0, (0.45, 0.65)),
        ("chat0.01_b1_tail40-80%", 0.01, 1.0, (0.40, 0.80)),
        ("chat0.01_b1_tail50-100%", 0.01, 1.0, (0.50, 1.00)),
        ("chat0.01_b0.5_tail45-65%", 0.01, 0.5, (0.45, 0.65)),
        ("ref_b0.01_tail40-50%", None, 0.01, (0.40, 0.50)),
    ]:
        if chat is None:
            al = 1e-10 * (sigmas_std / sigmas_std[-1]) ** 2
            cap = 1e9
        else:
            al = chat * sigmas_std**2
            cap = 0.5 / lam_max
        w = np.zeros(L, np.float32)
        w[int(lo_frac[0] * L):int(lo_frac[1] * L)] = 1.0
        tr, xf, xm = run_lab_h(
            A_b, Y_b, X_b, x0_b, np_b, kr,
            jnp.asarray(sigmas_std, jnp.float32),
            jnp.asarray(al, jnp.float32),
            jnp.full((L,), beta, jnp.float32),
            jnp.float32(cap), jnp.asarray(w))
        tr = np.asarray(tr.reshape(L * STEPS_EACH, S, NC).mean(-1))
        xm = np.asarray(xm)
        e_m = (((xm - Xs_np) ** 2).sum((-1, -2, -3)) / oe).reshape(S, NC)
        msg = [f"{nm} [{time.time()-t0:.0f}s]:"]
        for s, snr in enumerate(snrs):
            db = 10 * np.log10(tr[:, s])
            msg.append(
                f"  SNR{snr:+.0f}: single best {db.min():6.2f}@{db.argmin()}"
                f" | tail-mean {10*np.log10(e_m[s].mean()):6.2f}"
                f" (genie {GENIE[float(snr)]})")
        print("\n".join(msg), flush=True)


def main_init():
    """Warm-start experiment: initialize chains at LS / empirical-LMMSE
    estimates (+ exploration noise) so slow prior-dominated modes start at
    their conditional-mean values (reference test_mmse.py:195-202 offers
    noise/adjoint/LS inits). S=3 x NC2=8 x R=8 replicas, shared Y."""
    t0 = time.time()
    S2, NC2, R = 3, 8, 8
    X2s = X2[:NC2]
    ka, kb, kc, kd = jax.random.split(jax.random.key(77), 4)
    P2s = cplx.qpsk_pilots(ka, NC2, 64, 38)
    A2s = cplx.conj_transpose(P2s)
    A_sc = jnp.tile(A2s, (S2, 1, 1, 1))
    X_sc = jnp.tile(X2s, (S2, 1, 1, 1))
    np_sc = jnp.repeat(jnp.asarray(npow), NC2)
    Y_sc = physics.measure_c2(kb, A_sc, X_sc, np_sc)
    reps = (R, 1, 1, 1)
    A_r, Y_r, X_r = (jnp.tile(t, reps) for t in (A_sc, Y_sc, X_sc))
    np_r = jnp.tile(np_sc, (R,))

    # empirical-covariance LMMSE warm start (host, one solve per SNR group)
    Htr = np.asarray(train_ds.hermitian(normalized=True))
    Vtr = Htr.reshape(Htr.shape[0], -1, order="F")
    Cov = (Vtr.T @ Vtr.conj()) / Vtr.shape[0]
    A_h = np.asarray(A_sc)
    Y_h = np.asarray(Y_sc)
    A_np = A_h[..., 0] + 1j * A_h[..., 1]
    Y_np = Y_h[..., 0] + 1j * Y_h[..., 1]
    x_lmmse = np.zeros((S2 * NC2, 64, 16), np.complex64)
    for i in range(S2 * NC2):
        M = np.kron(np.eye(16), A_np[i])
        y = Y_np[i].reshape(-1, order="F")
        G_ = M @ Cov @ M.conj().T + float(np_sc[i]) * np.eye(M.shape[0])
        xh = Cov @ M.conj().T @ np.linalg.solve(G_, y)
        x_lmmse[i] = xh.reshape(64, 16, order="F")
    x_lmmse2 = jnp.stack([jnp.asarray(x_lmmse.real),
                          jnp.asarray(x_lmmse.imag)], axis=-1)
    err0 = np.asarray(cplx.sum_abs2(x_lmmse2 - X_sc, axis=(-1, -2)))
    oe0 = np.asarray(cplx.sum_abs2(X_sc, axis=(-1, -2)))
    nm0 = (err0 / oe0).reshape(S2, NC2).mean(-1)
    print("LMMSE-emp init NMSE:",
          [round(float(10 * np.log10(v)), 2) for v in nm0], flush=True)

    from score_based_channels_tpu.baselines.ls import ls_estimate
    x_ls2 = ls_estimate(A_sc, Y_sc, np_sc)

    lam_max = 173.7
    Xs_np = np.asarray(X_sc).reshape(S2, NC2, 64, 16, 2)
    oe = (Xs_np ** 2).sum((-1, -2, -3))
    for nm, init2, noise_scale, chat, beta in [
        ("ls-init_ref_b0.01", x_ls2, 0.3, None, 0.01),
        ("lmmse-init_ref_b0.01", x_lmmse2, 0.3, None, 0.01),
        ("lmmse-init_ref_b0.01_ns1", x_lmmse2, 1.0, None, 0.01),
        ("lmmse-init_chat0.01_b1", x_lmmse2, 0.3, 0.01, 1.0),
        ("lmmse-init_chat0.01_b0.1", x_lmmse2, 0.3, 0.01, 0.1),
    ]:
        if chat is None:
            al = 1e-10 * (sigmas_std / sigmas_std[-1]) ** 2
            cap = 1e9
        else:
            al = chat * sigmas_std**2
            cap = 0.5 / lam_max
        x0_r = (jnp.tile(init2, reps)
                + noise_scale * cplx.randn(kc, (R * S2 * NC2, 64, 16)))
        tr, xf, _ = run_lab_h(
            A_r, Y_r, X_r, x0_r, np_r, kd,
            jnp.asarray(sigmas_std, jnp.float32),
            jnp.asarray(al, jnp.float32),
            jnp.full((L,), beta, jnp.float32),
            jnp.float32(cap), jnp.zeros((L,), jnp.float32) + 1e-9)
        tr = np.asarray(tr.reshape(L * STEPS_EACH, R, S2, NC2).mean(-1))
        xf = np.asarray(xf).reshape(R, S2, NC2, 64, 16, 2)
        xm = xf.mean(0)
        e_mean = (((xm - Xs_np) ** 2).sum((-1, -2, -3)) / oe).mean(-1)
        e_one = (((xf[0] - Xs_np) ** 2).sum((-1, -2, -3)) / oe).mean(-1)
        msg = [f"{nm} [{time.time()-t0:.0f}s]:"]
        for s, snr in enumerate(snrs):
            db_tr = 10 * np.log10(tr[:, 0, s])
            msg.append(
                f"  SNR{snr:+.0f}: single best {db_tr.min():6.2f}@"
                f"{db_tr.argmin()} final {10*np.log10(e_one[s]):6.2f}"
                f" | mean-of-{R} {10*np.log10(e_mean[s]):6.2f}"
                f" (genie {GENIE[float(snr)]})")
        print("\n".join(msg), flush=True)


def main_trunc():
    """Truncated-schedule refinement from an LMMSE warm start: geometric
    sigma_start -> sigma_end over the SAME 2311 levels (slower decay =
    more mixing per decade), init = LMMSE + sigma_start*z."""
    t0 = time.time()
    S2, NC2, R = 3, 8, 8
    X2s = X2[:NC2]
    ka, kb, kc, kd = jax.random.split(jax.random.key(77), 4)
    P2s = cplx.qpsk_pilots(ka, NC2, 64, 38)
    A2s = cplx.conj_transpose(P2s)
    A_sc = jnp.tile(A2s, (S2, 1, 1, 1))
    X_sc = jnp.tile(X2s, (S2, 1, 1, 1))
    np_sc = jnp.repeat(jnp.asarray(npow), NC2)
    Y_sc = physics.measure_c2(kb, A_sc, X_sc, np_sc)
    reps = (R, 1, 1, 1)
    A_r, Y_r, X_r = (jnp.tile(t, reps) for t in (A_sc, Y_sc, X_sc))
    np_r = jnp.tile(np_sc, (R,))

    Htr = np.asarray(train_ds.hermitian(normalized=True))
    Vtr = Htr.reshape(Htr.shape[0], -1, order="F")
    Cov = (Vtr.T @ Vtr.conj()) / Vtr.shape[0]
    A_h = np.asarray(A_sc)
    Y_h = np.asarray(Y_sc)
    A_np = A_h[..., 0] + 1j * A_h[..., 1]
    Y_np = Y_h[..., 0] + 1j * Y_h[..., 1]
    x_lmmse = np.zeros((S2 * NC2, 64, 16), np.complex64)
    for i in range(S2 * NC2):
        M = np.kron(np.eye(16), A_np[i])
        y = Y_np[i].reshape(-1, order="F")
        G_ = M @ Cov @ M.conj().T + float(np_sc[i]) * np.eye(M.shape[0])
        xh = Cov @ M.conj().T @ np.linalg.solve(G_, y)
        x_lmmse[i] = xh.reshape(64, 16, order="F")
    x_lmmse2 = jnp.stack([jnp.asarray(x_lmmse.real),
                          jnp.asarray(x_lmmse.imag)], axis=-1)

    lam_max = 173.7
    Xs_np = np.asarray(X_sc).reshape(S2, NC2, 64, 16, 2)
    oe = (Xs_np ** 2).sum((-1, -2, -3))
    sigma_end = sigmas_std[-1]
    import os
    spec = os.environ.get(
        "TRUNC_CONFIGS",
        "0.7:n1:ref:0.01,0.25:n1:ref:0.01,0.7:n1:c0.01:1.0,"
        "0.25:n1:c0.01:1.0,0.7:n1:ref:0.3")
    cfg_list = []
    for item in spec.split(","):
        ss, nz, law, bb = item.split(":")
        cfg_list.append((f"trunc{ss}_{nz}_{law}_b{bb}", float(ss),
                         float(nz[1:]), law, float(bb)))
    for nm, s_start, noise_mult, law, beta in cfg_list:
        if law == "tail":
            # PRODUCTION SHAPE: the standard schedule truncated at
            # sigma_start (alpha=0 no-op padding keeps the compiled L)
            k0_lvl = int(np.searchsorted(-sigmas_std, -s_start))
            sig = np.concatenate([np.full(k0_lvl, sigmas_std[k0_lvl]),
                                  sigmas_std[k0_lvl:]])
            al = np.concatenate([
                np.zeros(k0_lvl),
                1e-10 * (sigmas_std[k0_lvl:] / sigma_end) ** 2])
            cap = 1e9
        else:
            sig = s_start * (sigma_end / s_start) ** (np.arange(L) / (L - 1))
            if law == "ref":
                al = 1e-10 * (sig / sigma_end) ** 2
                cap = 1e9
            else:
                al = float(law[1:]) * sig**2
                cap = 0.5 / lam_max
        x0_r = (jnp.tile(x_lmmse2, reps)
                + (noise_mult * s_start * np.sqrt(2.0))
                * cplx.randn(kc, (R * S2 * NC2, 64, 16)))
        tr, xf, _ = run_lab_h(
            A_r, Y_r, X_r, x0_r, np_r, kd,
            jnp.asarray(sig, jnp.float32),
            jnp.asarray(al, jnp.float32),
            jnp.full((L,), beta, jnp.float32),
            jnp.float32(cap), jnp.zeros((L,), jnp.float32) + 1e-9)
        tr = np.asarray(tr.reshape(L * STEPS_EACH, R, S2, NC2).mean(-1))
        xf = np.asarray(xf).reshape(R, S2, NC2, 64, 16, 2)
        xm = xf.mean(0)
        e_mean = (((xm - Xs_np) ** 2).sum((-1, -2, -3)) / oe).mean(-1)
        e_one = (((xf[0] - Xs_np) ** 2).sum((-1, -2, -3)) / oe).mean(-1)
        msg = [f"{nm} [{time.time()-t0:.0f}s]:"]
        for s, snr in enumerate(snrs):
            db_tr = 10 * np.log10(tr[:, 0, s])
            msg.append(
                f"  SNR{snr:+.0f}: single best {db_tr.min():6.2f}@"
                f"{db_tr.argmin()} final {10*np.log10(e_one[s]):6.2f}"
                f" | mean-of-{R} {10*np.log10(e_mean[s]):6.2f}"
                f" (genie {GENIE[float(snr)]})")
        print("\n".join(msg), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "avg":
        main_avg()
    elif len(sys.argv) > 1 and sys.argv[1] == "tail":
        main_tail()
    elif len(sys.argv) > 1 and sys.argv[1] == "init":
        main_init()
    elif len(sys.argv) > 1 and sys.argv[1] == "trunc":
        main_trunc()
    else:
        main()
