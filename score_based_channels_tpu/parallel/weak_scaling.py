"""Weak-scaling measurement of the sharded Langevin sweep (VERDICT r2 #8).

Runs the mesh-sharded posterior sampler at 1/2/4/8 virtual CPU devices
with a FIXED per-device batch and reports wall time per config — the
multi-chip extrapolation basis for the BASELINE "20x with scaling" claim
when no multi-chip hardware exists. Each device count runs in a fresh
subprocess (`XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu`), because the device count is fixed at backend init.

Honesty note (recorded with the results): the host has a small number of
physical cores, so once N_devices exceeds the core count the slowdown
measures core oversubscription, not collective overhead. The measurement
isolates the sharding machinery (sharded inputs, replicated params, the
trace gather) — the quantity that must stay near-flat for ICI scaling.

Usage:  python -m score_based_channels_tpu.parallel.weak_scaling \
            [--devices 1 2 4 8] [--per_device 8] [--stride 100]
Child:  ... weak_scaling --child N  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _child(n_devices: int, per_device: int, stride: int, reps: int) -> None:
    import jax

    # the session image pins an experimental TPU platform via config
    # defaults that ignore JAX_PLATFORMS (see tests/conftest.py); force CPU
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from .. import cplx, physics
    from ..config import Config
    from ..diffusion.sampling import annealed_langevin_posterior_c2
    from ..diffusion.sigmas import sigmas_from_config, subsample_schedule
    from ..models import make_score_model
    from .mesh import data_sharding, make_mesh

    assert jax.device_count() >= n_devices, (
        f"{jax.device_count()} devices visible, need {n_devices}")
    mesh = make_mesh(n_devices)

    cfg = Config()
    model = make_score_model(cfg.model, cfg.data.channels)
    B = per_device * n_devices
    key = jax.random.key(0)
    kp, ki, kx, km = jax.random.split(key, 4)
    params = model.init(kp, jnp.zeros((1, 64, 16, 2)), jnp.float32(1.0))[
        "params"]

    def score_fn(x, sigma):
        return model.apply({"params": params}, x, sigma)

    sigmas, alpha_scale = subsample_schedule(
        sigmas_from_config(cfg.model), stride)
    X2 = cplx.randn(kx, (B, 64, 16))
    P2 = cplx.qpsk_pilots(kp, B, 64, 38)
    A2 = cplx.conj_transpose(P2)
    npow = jnp.full((B,), float(physics.snr_to_noise_power(10.0, 64)))
    Y2 = physics.measure_c2(km, A2, X2, npow)
    x0 = cplx.randn(ki, (B, 64, 16))

    sh = lambda t: jax.device_put(t, data_sharding(mesh, t.ndim))
    A2, Y2, X2, x0, npow = map(sh, (A2, Y2, X2, x0, npow))

    run = jax.jit(lambda a, y, npw, xi, k: annealed_langevin_posterior_c2(
        score_fn, a, y, sigmas, npw, xi, k,
        alpha_step=3e-11 * alpha_scale, beta_noise=0.01, steps_each=3,
        oracle=X2))

    out = run(A2, Y2, npow, x0, ki)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(A2, Y2, npow, x0, ki)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    nfes = B * sigmas.shape[0] * 3
    print(json.dumps({"devices": n_devices, "batch": B,
                      "per_device": per_device, "levels": int(sigmas.shape[0]),
                      "wall_s": round(dt, 3),
                      "nfe_per_s": round(nfes / dt, 1)}))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--per_device", type=int, default=8)
    p.add_argument("--stride", type=int, default=100)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--child", type=int, default=None)
    args = p.parse_args(argv)

    if args.child is not None:
        _child(args.child, args.per_device, args.stride, args.reps)
        return

    print(f"# weak scaling: fixed per-device batch {args.per_device}, "
          f"level stride {args.stride}, {os.cpu_count()} physical cores")
    for n in args.devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}")
        r = subprocess.run(
            [sys.executable, "-m",
             "score_based_channels_tpu.parallel.weak_scaling",
             "--child", str(n), "--per_device", str(args.per_device),
             "--stride", str(args.stride), "--reps", str(args.reps)],
            env=env, capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
        if r.returncode != 0:
            print(f"# devices={n} FAILED:\n{r.stderr[-2000:]}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
