"""WGAN (weight-clipping) trainer for the generative channel prior.

Reference train_wgan.py: critic clip ±0.01, Diters=5 per generator step
(boosted to 100 for the first 25 and every 500th generator iteration,
:134-137), RMSProp 5e-5 (:107-108), batch 200, 3000 epochs, ENTRYWISE
normalization (:39), training on the non-Hermitian 'H' view (:150).

Critic convention (traced from :157-168): D minimizes D(real) − D(fake);
G minimizes D(fake).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..data.dataset import ChannelDataset
from ..models.dcgan import DCGAN_D, DCGAN_G
from ..utils.checkpoint import save_checkpoint

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WGANTrainConfig:
    nz: int = 60
    ndf: int = 64
    ngf: int = 128
    n_extra_layers: int = 1  # spacing 0.5 ⇒ 1 (train_wgan.py:71-74)
    batch_size: int = 200
    n_epochs: int = 3000
    lr_d: float = 5e-5
    lr_g: float = 5e-5
    clamp: float = 0.01
    d_iters: int = 5
    d_iters_boost: int = 100
    boost_until: int = 25
    boost_every: int = 500
    seed: int = 2020


class WGANState(struct.PyTreeNode):
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    gen_iterations: Array


def train_wgan(
    config: Config,
    tc: WGANTrainConfig = WGANTrainConfig(),
    train_seed: int = 1234,
    checkpoint_path: Optional[str] = None,
    n_epochs: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
) -> Tuple[WGANState, dict]:
    n_epochs = n_epochs if n_epochs is not None else tc.n_epochs
    data_cfg = dataclasses.replace(config.data, noise_std=0.0)
    ds = ChannelDataset(train_seed, data_cfg, norm="entrywise")
    # non-Hermitian real view (B, Nr, Nt, 2) — train_wgan.py:150 uses 'H'
    H = np.stack([ds.normalized().real, ds.normalized().imag], -1)
    H = jnp.asarray(H, jnp.float32)
    isize = (config.data.num_rx, config.data.num_tx)

    netG = DCGAN_G(isize=isize, nz=tc.nz, ngf=tc.ngf,
                   n_extra_layers=tc.n_extra_layers)
    netD = DCGAN_D(isize=isize, ndf=tc.ndf, n_extra_layers=tc.n_extra_layers)
    txG = optax.rmsprop(tc.lr_g, decay=0.99, eps=1e-8)
    txD = optax.rmsprop(tc.lr_d, decay=0.99, eps=1e-8)

    key = jax.random.key(tc.seed)
    key, kg, kd, kz = jax.random.split(key, 4)
    g_vars = netG.init(kg, jnp.zeros((2, tc.nz)), train=True)
    d_vars = netD.init(kd, jnp.zeros((2,) + isize + (2,)), train=True)
    state = WGANState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        g_opt=txG.init(g_vars["params"]), d_opt=txD.init(d_vars["params"]),
        gen_iterations=jnp.zeros((), jnp.int32))

    clamp = tc.clamp

    def _clip(params):
        return jax.tree_util.tree_map(
            lambda p: jnp.clip(p, -clamp, clamp), params)

    @partial(jax.jit, donate_argnums=(0,))
    def d_step(state: WGANState, real: Array, key: Array):
        d_params = _clip(state.d_params)  # train_wgan.py:143-144

        z = jax.random.normal(key, (real.shape[0], tc.nz))
        fake, g_stats = netG.apply(
            {"params": state.g_params, "batch_stats": state.g_stats}, z,
            train=True, mutable=["batch_stats"])
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(p):
            dr, st1 = netD.apply({"params": p, "batch_stats": state.d_stats},
                                 real, train=True, mutable=["batch_stats"])
            df, st2 = netD.apply({"params": p,
                                  "batch_stats": st1["batch_stats"]},
                                 fake, train=True, mutable=["batch_stats"])
            return dr - df, (dr, df, st2["batch_stats"])

        (loss, (dr, df, d_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_params)
        updates, d_opt = txD.update(grads, state.d_opt, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return state.replace(d_params=d_params, d_opt=d_opt, d_stats=d_stats,
                             g_stats=g_stats["batch_stats"]), loss, dr, df

    @partial(jax.jit, donate_argnums=(0,))
    def g_step(state: WGANState, key: Array):
        z = jax.random.normal(key, (tc.batch_size, tc.nz))

        def loss_fn(p):
            fake, st = netG.apply({"params": p, "batch_stats": state.g_stats},
                                  z, train=True, mutable=["batch_stats"])
            df = netD.apply({"params": state.d_params,
                             "batch_stats": state.d_stats}, fake, train=False)
            return df, st["batch_stats"]

        (loss, g_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        updates, g_opt = txG.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return state.replace(g_params=g_params, g_opt=g_opt,
                             g_stats=g_stats,
                             gen_iterations=state.gen_iterations + 1), loss

    n = H.shape[0]
    bs = min(tc.batch_size, n)
    d_log, g_log = [], []
    t0 = time.time()
    for epoch in range(n_epochs):
        gi = int(state.gen_iterations)
        d_iters = (tc.d_iters_boost
                   if gi < tc.boost_until or gi % tc.boost_every == 0
                   else tc.d_iters)
        for _ in range(d_iters):
            key, k_idx, k_z = jax.random.split(key, 3)
            idx = jax.random.choice(k_idx, n, (bs,), replace=False)
            state, dl, dr, df = d_step(state, H[idx], k_z)
        key, k_g = jax.random.split(key)
        state, gl = g_step(state, k_g)
        d_log.append(float(dl))
        g_log.append(float(gl))
        if (epoch + 1) % 100 == 0:
            log_fn(f"epoch {epoch + 1}/{n_epochs} D {d_log[-1]:.4f} "
                   f"G {g_log[-1]:.4f} "
                   f"({(epoch + 1) / (time.time() - t0):.2f} epochs/s)")

    logs = {"d_log": np.asarray(d_log), "g_log": np.asarray(g_log),
            "norm_mean_r": np.real(ds.mean), "norm_mean_i": np.imag(ds.mean),
            "norm_std": np.asarray(ds.std, np.float32)}
    if checkpoint_path:
        save_checkpoint(
            checkpoint_path, config,
            params={"gen": state.g_params, "disc": state.d_params,
                    "gen_stats": state.g_stats, "disc_stats": state.d_stats},
            extra_arrays=logs,
            metadata={"tc": dataclasses.asdict(tc)})
        log_fn(f"saved {checkpoint_path}")
    return state, logs


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Train the WGAN channel prior")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--spacing", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--nz", type=int, default=60,
                   help="latent dimension (reference: 60, aux_gan.py:58; "
                        "round-3 analysis: 60 real dims cannot cover the "
                        "rank-36-complex CDL ensemble — the measured WGAN "
                        "floor is manifold-capacity-limited, RESULTS.md)")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--cache", type=str, default="/tmp/sbc_jax_cache")
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="dataset ensemble override (fixed = the paper-matching per-drop coupling)")
    args = p.parse_args(argv)

    import jax as _jax

    if args.cache:
        _jax.config.update("jax_compilation_cache_dir", args.cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ..config import default_score_config

    cfg = default_score_config(args.train, ray_coupling=args.ray_coupling)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, spacing_list=(args.spacing,)))
    out = args.output or f"models/wgan/{args.train}_{args.spacing:.2f}.npz"
    train_wgan(cfg, tc=WGANTrainConfig(nz=args.nz), checkpoint_path=out,
               n_epochs=args.epochs)


if __name__ == "__main__":
    main()
