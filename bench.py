"""Benchmark: channel estimates/s/chip through the full Langevin schedule.

Headline workload (BASELINE.md): one channel estimate = 2311 σ-levels × 3
inner steps = 6933 score-network forwards (NCSNv2-Deepest, 5.9M params, on
C^{64×16}) plus the data-consistency matmuls — reference test_score.py's
per-curve cost is 100 channels × 17 SNRs of that. Here the whole
{channels × SNR} grid is one batched `lax.scan`.

The reference publishes NO throughput numbers (SURVEY.md §6). For
`vs_baseline` we anchor the reference's single-GPU rate to a MEASUREMENT:
the reference's own torch model + inner loop (test_score.py:147-171,
incl. its per-step host sync) measured on this host's CPU runs at
164.9 NFE/s = 0.0238 full-schedule estimates/s (batch 100, 4 threads;
BENCH.md "Reference baseline"). Scaling by a documented ~50× V100-class
GPU/CPU factor for small-batch convnets gives ≈1.2 estimates/s, matching
the original engineering estimate (~12 ms/forward at batch 100). Our own
JAX pipeline on the SAME CPU does 190 NFE/s — same-silicon parity — so
vs_baseline measures hardware + sync-free-scan design, not implementation
slop. Change REF_ESTIMATES_PER_S if a GPU measurement becomes available.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import argparse
import json
import sys
import time

import numpy as np

REF_ESTIMATES_PER_S = 1.2  # documented estimate, see module docstring


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU run to validate the harness")
    p.add_argument("--batch", type=int, default=None,
                   help="channel-estimate batch (default 256, smoke 8)")
    p.add_argument("--levels", type=int, default=None,
                   help="σ-levels (default full 2311, smoke 24)")
    p.add_argument("--checkpoint", type=str,
                   default="models/score/CDL-C/final_model.npz",
                   help="optional trained checkpoint (random init if absent)")
    p.add_argument("--precision", type=str, default=None,
                   choices=["default", "high", "highest"],
                   help="global matmul precision (TPU: default=1-pass bf16, "
                        "highest=3-pass; parity budget 0.25 dB)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="score-network compute dtype (Langevin state stays "
                        "f32). Default bfloat16: +10%% over f32 (convs "
                        "already run bf16 operands at default precision; "
                        "this removes the f32 activation traffic) and "
                        "full-schedule NMSE matches f32 within 0.01 dB at "
                        "every SNR (BENCH.md 'Precision A/B')")
    p.add_argument("--pallas-norm", action="store_true",
                   help="use the fused Pallas InstanceNorm++ kernel")
    p.add_argument("--profile", type=str, default=None,
                   help="capture a jax.profiler trace of the timed run "
                        "into this directory (view with xprof/tensorboard)")
    args = p.parse_args()

    if args.smoke:
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the 2311-level scan costs ~1 min to
    # compile; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/sbc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    if args.pallas_norm:
        from score_based_channels_tpu.kernels import set_kernels_enabled

        set_kernels_enabled(True)
    import jax.numpy as jnp

    from score_based_channels_tpu import cplx, physics
    from score_based_channels_tpu.config import Config, ModelConfig
    from score_based_channels_tpu.diffusion.sampling import (
        annealed_langevin_posterior_c2,
    )
    from score_based_channels_tpu.diffusion.sigmas import get_sigmas
    from score_based_channels_tpu.models import make_score_model

    levels = args.levels or (24 if args.smoke else 2311)
    batch = args.batch or (8 if args.smoke else 256)
    steps_each = 3
    num_pilots = 38  # pilot_alpha 0.6 (test_score.py:21,100)

    cfg = Config()
    mcfg = ModelConfig(num_classes=levels)
    model = make_score_model(mcfg)
    sigmas = get_sigmas(mcfg.sigma_begin, mcfg.sigma_end, levels)

    key = jax.random.key(0)
    k_init, k_pilot, k_x, k_meas, k_run = jax.random.split(key, 5)
    x_dummy = jnp.zeros((1, 64, 16, 2), jnp.float32)
    params = model.init(k_init, x_dummy, jnp.float32(1.0))["params"]
    import os

    if os.path.exists(args.checkpoint):
        from score_based_channels_tpu.utils.checkpoint import load_checkpoint

        ck = load_checkpoint(args.checkpoint)
        params = ck["ema"] if ck["ema"] is not None else ck["params"]
        print(f"# loaded {args.checkpoint}", file=sys.stderr)

    from score_based_channels_tpu.eval.estimate import score_fn_from_params

    score_fn = score_fn_from_params(model, params, dtype=jnp.dtype(args.dtype))

    # synthetic workload in c2 (throughput is oracle-independent; the TPU
    # path is complex-free by design, see cplx.py)
    X = cplx.randn(k_x, (batch, 64, 16))
    P = cplx.qpsk_pilots(k_pilot, batch, 64, num_pilots)
    A = cplx.conj_transpose(P)
    noise_power = float(physics.snr_to_noise_power(10.0, 64))
    Y = physics.measure_c2(k_meas, A, X, noise_power)
    x0 = cplx.randn(jax.random.fold_in(k_x, 1), (batch, 64, 16))

    @jax.jit
    def run(a, y, x0, k):
        xf, trace = annealed_langevin_posterior_c2(
            score_fn, a, y, sigmas, noise_power, x0, k,
            alpha_step=3e-11, beta_noise=0.01, steps_each=steps_each,
            oracle=X)
        return trace.mean(axis=1), jnp.abs(xf).mean()

    t0 = time.time()
    trace, _ = run(A, Y, x0, k_run)
    jax.block_until_ready(trace)
    compile_and_first = time.time() - t0
    print(f"# first run (incl. compile): {compile_and_first:.1f}s",
          file=sys.stderr)

    if args.profile:
        with jax.profiler.trace(args.profile):
            t0 = time.time()
            trace, _ = run(A, Y, x0, jax.random.fold_in(k_run, 1))
            jax.block_until_ready(trace)
            dt = time.time() - t0
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)
    else:
        t0 = time.time()
        trace, _ = run(A, Y, x0, jax.random.fold_in(k_run, 1))
        jax.block_until_ready(trace)
        dt = time.time() - t0

    nfes = batch * levels * steps_each
    est_per_s = batch / dt
    # normalize to the reference's full 2311-level schedule
    est_per_s_full = est_per_s * levels / 2311.0
    print(f"# {dt:.2f}s for {batch} estimates × {levels} levels "
          f"({nfes / dt:.0f} NFE/s, {est_per_s_full:.2f} full-schedule est/s)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "channel estimates/s/chip (full 6933-NFE schedule)",
        "value": round(est_per_s_full, 3),
        "unit": "estimates/s",
        "vs_baseline": round(est_per_s_full / REF_ESTIMATES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
