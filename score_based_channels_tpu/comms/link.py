"""End-to-end coded link simulation (reference matlab/test_end_to_end.m +
testPackets.m, TPU-native).

Per packet (testPackets.m): LDPC-encode 324 info bits → 648 coded bits →
interleave → QPSK (324 symbols) → Ns=4 spatial streams × 81 symbol slots →
random Gaussian precoding V ∈ C^{Nt×Ns} (testPackets.m:87-94) → channel
H ∈ C^{Nr×Nt} → y = H·V·s + n. The receiver computes exact-ML MIMO LLRs
(ComputeLLRMIMO 'ml') using either the TRUE H or an ESTIMATED H
(test_end_to_end.m:13-26 loads saved estimates), de-interleaves, decodes,
and logs BER / BLER for both CSI modes.

Whole-packet-batch vectorization: every stage is batched over packets; the
LLR enumeration and min-sum decode run as single jitted calls.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from .ldpc import LDPCCode, make_wifi_ldpc, minsum_decode
from .mimo import mimo_kbest_llr, mimo_ml_llr, mimo_zf_sic_llr
from .modulation import qpsk_modulate

Array = jax.Array


@dataclasses.dataclass
class LinkResults:
    snr_range: np.ndarray
    ber_ideal: np.ndarray  # (n_snr,)
    ber_est: np.ndarray
    bler_ideal: np.ndarray
    bler_est: np.ndarray

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def _interleaver(n: int, seed: int = 11) -> np.ndarray:
    """Fixed-seed random interleaver — semantically identical to the
    reference's `rng(inter_seed); P = randperm(N)` (testPackets.m:96-99);
    only the PRNG differs, which is immaterial for a random permutation."""
    return np.random.default_rng(seed).permutation(n)


def simulate_packets(
    key: Array,
    H_true2: Array,  # (B, Nr, Nt, 2) true channels (one per packet)
    H_est2: Array,  # (B, Nr, Nt, 2) estimated channels
    snr_db: float,
    code: LDPCCode,
    n_streams: int = 4,
    num_bp_iters: int = 25,
    max_log: bool = False,
    detector: str = "ml",  # ComputeLLRMIMO.m mode: ml | kbest | zf-sic
    seed: int = 5,
) -> Tuple[dict, dict]:
    """One SNR point over a batch of packets → (ideal-CSI, est-CSI) stats."""
    B, Nr, Nt, _ = H_true2.shape
    n, k = code.n, code.k
    n_sym = n // 2
    assert n_sym % n_streams == 0
    L = n_sym // n_streams  # symbol slots per packet

    key_np = np.random.default_rng(seed + int(snr_db * 10) % 97)
    bits = key_np.integers(0, 2, size=(B, k), dtype=np.uint8)
    cw = code.encode(bits)  # (B, n)
    perm = _interleaver(n)
    cw_i = cw[:, perm]

    syms = qpsk_modulate(jnp.asarray(cw_i))  # (B, n_sym, 2)
    # slot layout: s (B, L, Ns, 2)
    s = syms.reshape(B, L, n_streams, 2)

    # random Gaussian precoding, unit average column power
    kv, kn = jax.random.split(key)
    V = cplx.randn(kv, (B, Nt, n_streams)) * np.float32(1.0 / np.sqrt(Nt))
    Heff_true = cplx.matmul(H_true2, V)  # (B, Nr, Ns, 2)
    Heff_est = cplx.matmul(H_est2, V)

    # transmit: y (B, L, Nr, 2) = s @ Heffᵀ + n
    y = cplx.matmul(s, cplx.transpose(Heff_true))  # (B, L, Ns)@(Ns,Nr)
    # per-component noise var from SNR against unit-power symbols through
    # the normalized precoder: signal power per rx antenna ≈ ‖Heff row‖²/Ns
    sig_pow = jnp.mean(cplx.abs2(Heff_true)) * n_streams
    noise_pow = sig_pow * 10.0 ** (-snr_db / 10.0)
    w = cplx.randn(kn, y.shape[:-1])
    y = y + w * jnp.sqrt(noise_pow)

    out = {}
    for name, Heff in (("ideal", Heff_true), ("est", Heff_est)):
        if detector == "ml":
            llr = mimo_ml_llr(y, Heff, noise_pow / 2.0, n_streams=n_streams,
                              max_log=max_log)  # (B, L, 2Ns)
        elif detector == "kbest":
            llr = mimo_kbest_llr(y, Heff, noise_pow / 2.0,
                                 n_streams=n_streams)
        elif detector == "zf-sic":
            llr = mimo_zf_sic_llr(y, Heff, noise_pow / 2.0,
                                  n_streams=n_streams)
        else:
            raise ValueError(f"unknown detector {detector!r}")
        llr_flat = llr.reshape(B, n)
        # de-interleave
        llr_d = jnp.zeros_like(llr_flat).at[:, perm].set(llr_flat)
        bits_hat, _ = minsum_decode(llr_d, jnp.asarray(code.H, jnp.float32),
                                    num_iters=num_bp_iters)
        bits_hat = np.asarray(bits_hat)
        # info bits live at code.perm[:k] positions of the codeword
        info_hat = bits_hat[:, code.perm[:k]]
        bit_errs = (info_hat != bits).sum(-1)
        out[name] = {
            "ber": float(bit_errs.sum()) / (B * k),
            "bler": float((bit_errs > 0).mean()),
        }
    return out["ideal"], out["est"]


def run_link_simulation(
    H_true: np.ndarray,  # (B, Nr, Nt) complex or (B, Nr, Nt, 2) c2
    H_est: np.ndarray,
    snr_range=np.arange(-10, 12.5, 2.5),
    n_streams: int = 4,
    num_bp_iters: int = 25,
    detector: str = "ml",
    seed: int = 0,
) -> LinkResults:
    """BER/BLER sweep with ideal vs estimated CSI (test_end_to_end.m:38-60)."""
    code = make_wifi_ldpc()
    to2 = lambda H: (cplx.from_complex(H) if np.asarray(H).ndim == 3
                     or np.iscomplexobj(H) else jnp.asarray(H, jnp.float32))
    H_true2 = to2(H_true)
    H_est2 = to2(H_est)

    key = jax.random.key(seed)
    bi, be, li, le = [], [], [], []
    per_snr_est = H_est2.ndim == 5  # (S, B, Nr, Nt, 2): SNR-matched estimates
    for i, snr in enumerate(np.asarray(snr_range, np.float64)):
        est_i = H_est2[i] if per_snr_est else H_est2
        ideal, est = simulate_packets(
            jax.random.fold_in(key, i), H_true2, est_i, float(snr), code,
            n_streams=n_streams, num_bp_iters=num_bp_iters,
            detector=detector)
        bi.append(ideal["ber"])
        be.append(est["ber"])
        li.append(ideal["bler"])
        le.append(est["bler"])
    return LinkResults(
        snr_range=np.asarray(snr_range, np.float64),
        ber_ideal=np.asarray(bi), ber_est=np.asarray(be),
        bler_ideal=np.asarray(li), bler_est=np.asarray(le))


def main(argv=None):
    """CLI: coded BER/BLER with estimated vs ideal CSI
    (test_end_to_end.m:38-60 — estimation and data SNRs are matched).

    Backend: auto (default) runs on the TPU when one is present — the
    round-2 Pallas fused BP iteration (kernels/ldpc_minsum.py) replaced
    the XLA decoder body whose HLO crashed the tunnel compiler, so the
    production link path now exercises the kernel end-to-end (BENCH.md
    "LDPC decoder kernel"). `--backend cpu` keeps the jnp-oracle path.
    """
    import argparse

    import jax

    p = argparse.ArgumentParser(description="End-to-end coded link sim")
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "cpu"])
    p.add_argument("--channels", type=str, required=True,
                   help="npz from `estimate --save_channels` (est_* and "
                        "oracle_* arrays)")
    p.add_argument("--spacing_idx", type=int, default=0)
    p.add_argument("--alpha_idx", type=int, default=0)
    p.add_argument("--snr", nargs="+", type=float, default=None,
                   help="subset of the estimation SNR grid to simulate")
    p.add_argument("--streams", type=int, default=4)
    p.add_argument("--bp_iters", type=int, default=25)
    p.add_argument("--detector", type=str, default="ml",
                   choices=["ml", "kbest", "zf-sic"],
                   help="soft demapper (ComputeLLRMIMO.m mode): exact-ML "
                        "enumeration, K-best tree search, or ZF-SIC")
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args(argv)

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    with np.load(args.channels) as f:
        tag = f"sp{args.spacing_idx}_al{args.alpha_idx}"
        est = f[f"est_{tag}"]  # (S, C, Nt, Nr) complex, Hermitian view
        oracle = f[f"oracle_{tag}"]  # (C, Nt, Nr)
        snr_grid = f["snr_range"]

    # Hermitian → physical H (C, Nr, Nt)
    H_true = np.conj(np.swapaxes(oracle, -1, -2))
    H_est = np.conj(np.swapaxes(est, -1, -2))  # (S, C, Nr, Nt)

    if args.snr is not None:
        sel = [int(np.argmin(np.abs(snr_grid - s))) for s in args.snr]
        snr_grid = snr_grid[sel]
        H_est = H_est[sel]

    res = run_link_simulation(
        H_true, cplx.from_complex(H_est), snr_range=snr_grid,
        n_streams=args.streams, num_bp_iters=args.bp_iters,
        detector=args.detector)
    for i, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  BER ideal {res.ber_ideal[i]:.4f} "
              f"est {res.ber_est[i]:.4f}  BLER ideal {res.bler_ideal[i]:.3f} "
              f"est {res.bler_est[i]:.3f}")
    out = args.output or "results/link/results.npz"
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
