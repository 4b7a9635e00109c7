"""Multi-process distributed smoke: sharded train step + sweep chunk.

The reference is single-process (SURVEY.md §2.4); this framework makes
multi-host first-class. This module is the executable proof: each OS
process calls `jax.distributed.initialize`, all processes build ONE
global ('data',) mesh spanning every device of every process, and run

  1. a data-parallel DSM train step (batch sharded, model replicated,
     gradient psum inserted by XLA — crossing the process boundary),
  2. a checkpoint round-trip: process 0 saves the post-step state with
     utils.checkpoint, every process restores it and asserts bitwise
     equality with its live replicated state, and
  3. a sharded annealed-Langevin sweep chunk (the inference path) driven
     by the RESTORED EMA network — the full train → checkpoint →
     estimate cycle across the process boundary,

then print a per-process result line whose VALUES MUST AGREE across
processes (the computation is globally SPMD).

Run one worker per host/process:

    python -m score_based_channels_tpu.parallel.mp_smoke \
        --coordinator localhost:49732 --num_processes 2 --process_id 0 &
    python -m score_based_channels_tpu.parallel.mp_smoke \
        --coordinator localhost:49732 --num_processes 2 --process_id 1

On CPU (testing) set XLA_FLAGS=--xla_force_host_platform_device_count=K
per process first; on a TPU pod omit --coordinator and let
`multihost.initialize()` auto-detect. tests/test_multiprocess.py drives
the 2-process CPU case end-to-end in CI.
"""

from __future__ import annotations

import argparse
import os


def run_smoke(platform: str | None = None) -> dict:
    """Sharded train step + Langevin sweep chunk on the global mesh.

    Call AFTER jax.distributed.initialize. Returns {"loss", "nmse_db"} —
    identical on every participating process.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import Config, DataConfig, ModelConfig, TrainingConfig
    from ..diffusion.ema import ema_init
    from ..diffusion.sampling import annealed_langevin_posterior_c2
    from ..diffusion.sigmas import get_sigmas, sigmas_from_config
    from ..models import make_score_model
    from ..train import ScoreTrainState, make_optimizer, make_score_train_step
    from .. import cplx, physics
    from .mesh import make_mesh

    n_dev = jax.device_count()
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    batch = 2 * n_dev

    cfg = Config(
        model=ModelConfig(ngf=8, num_classes=16),
        training=TrainingConfig(batch_size=batch),
        data=DataConfig(num_channels=batch),
    )
    model = make_score_model(cfg.model)
    sigmas = sigmas_from_config(cfg.model)
    tx = make_optimizer(cfg.optim)
    train_step, _ = make_score_train_step(
        model, tx, sigmas, cfg.model.ema_rate, cfg.training.anneal_power)

    # --- 1. data-parallel train step --------------------------------------
    # init the replicated state INSIDE jit so every process holds the same
    # global array (multi-controller SPMD; no host broadcast needed)
    def init_state():
        x1 = jnp.zeros((1, cfg.data.num_tx, cfg.data.num_rx, 2), jnp.float32)
        params = model.init(jax.random.key(0), x1, jnp.float32(1.0))["params"]
        return ScoreTrainState(
            params=params, opt_state=tx.init(params),
            ema_params=ema_init(params), step=jnp.zeros((), jnp.int32))

    state = jax.jit(init_state, out_shardings=repl)()

    # the global batch: every process materializes only its local shards
    x_sh = NamedSharding(mesh, P("data", None, None, None))
    rng = np.random.default_rng(7)
    x_np = rng.standard_normal(
        (batch, cfg.data.num_tx, cfg.data.num_rx, 2)).astype(np.float32)
    x = jax.make_array_from_callback(x_np.shape, x_sh, lambda idx: x_np[idx])

    state, loss = train_step(state, x, jax.random.key(1))
    loss = float(loss)  # replicated scalar → addressable everywhere

    # --- 2. checkpoint round-trip across the process boundary --------------
    # Process 0 writes the post-step state (params/EMA/config in one
    # artifact, utils/checkpoint.py); everyone restores and asserts bitwise
    # equality with the live replicated state — covering the reference's
    # save→load contract (train_score.py:211-216 → test_score.py:33-36)
    # under multi-controller SPMD.
    from jax.experimental import multihost_utils

    from ..utils.checkpoint import load_checkpoint, save_checkpoint

    ckpt_path = os.environ.get("MP_SMOKE_CKPT", "/tmp/mp_smoke_ckpt.npz")
    if jax.process_index() == 0:
        save_checkpoint(ckpt_path, cfg, state.params,
                        ema_params=state.ema_params)
    multihost_utils.sync_global_devices("mp_smoke_ckpt_saved")
    restored = load_checkpoint(ckpt_path)
    for name, live, back in (("params", state.params, restored["params"]),
                             ("ema", state.ema_params,
                              restored["ema"])):
        live_np = jax.tree_util.tree_map(np.asarray, live)
        flat_l, td_l = jax.tree_util.tree_flatten(live_np)
        flat_r, td_r = jax.tree_util.tree_flatten(back)
        assert td_l == td_r, f"{name}: restored treedef mismatch"
        for a, b in zip(flat_l, flat_r):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"{name} round-trip")
    ema_restored = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, restored["ema"]), repl)

    # --- 3. sharded inference sweep chunk (restored EMA network) -----------
    Nt, Nr, Np_ = cfg.data.num_tx, cfg.data.num_rx, 10
    sig = get_sigmas(5.0, 0.01, 20)
    crandn = lambda *s: (rng.standard_normal(s) + 1j * rng.standard_normal(s)
                         ).astype(np.complex64) / np.sqrt(2)
    H = crandn(batch, Nt, Nr)
    A = crandn(batch, Np_, Nt)
    Y = A @ H
    c2sh = NamedSharding(mesh, P("data", None, None, None))
    mk = lambda a: jax.make_array_from_callback(
        a.shape, c2sh, lambda idx: a[idx])
    A2, Y2, X2 = (mk(np.asarray(cplx.from_complex(v))) for v in (A, Y, H))
    x0 = jax.jit(
        lambda k: cplx.randn(k, (batch, Nt, Nr)),
        out_shardings=c2sh)(jax.random.key(2))

    from ..eval.estimate import score_fn_from_params

    score_fn = score_fn_from_params(model, ema_restored)

    @jax.jit
    def sweep(a, y, x0, oracle):
        _, trace = annealed_langevin_posterior_c2(
            score_fn, a, y, sig,
            jnp.float32(0.01), x0, jax.random.key(3),
            alpha_step=1e-6, beta_noise=0.001, steps_each=2, oracle=oracle)
        return trace[-1].mean()  # global mean: crosses the process boundary

    nmse = float(sweep(A2, Y2, x0, X2))
    return {"loss": loss, "nmse_db": 10 * np.log10(nmse), "ckpt": "ok",
            "num_processes": jax.process_count(), "num_devices": n_dev}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (omit on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu) before init")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .multihost import initialize

    initialize(coordinator_address=args.coordinator,
               num_processes=args.num_processes, process_id=args.process_id)
    out = run_smoke()
    # one parseable line per process; values must agree across processes
    print(f"MP_SMOKE_OK pid={jax.process_index()} "
          f"procs={out['num_processes']} devs={out['num_devices']} "
          f"loss={out['loss']:.6f} nmse_db={out['nmse_db']:.4f} "
          f"ckpt={out['ckpt']}", flush=True)


if __name__ == "__main__":
    main()
