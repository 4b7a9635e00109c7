"""LDAMP training — one model per training SNR (reference train_ldamp.py).

Recipe (train_ldamp.py:38-97): FlippedUNet backbone, 10 unrolls, batch 128,
Adam 1e-3 with StepLR ×0.1 at epoch 16 of 24, e2e MSE on the UNnormalized
Hermitian channel (:117-120), training noise amplitude 10^(−SNR/20)·√Nt
(:66 — amplitude, not power, per the reference's own TODO note).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import cplx
from ..config import Config
from ..data.dataset import ChannelDataset
from ..models.ldamp import LDAMP
from ..utils.checkpoint import save_checkpoint

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LDAMPTrainConfig:
    alpha: float = 0.6  # pilot fraction
    max_unrolls: int = 10
    chans: int = 16
    num_pools: int = 3
    shared_nets: bool = False
    lr: float = 1e-3
    batch_size: int = 128
    n_epochs: int = 24
    decay_epochs: int = 16
    decay_gamma: float = 0.1
    seed: int = 0


class LDAMPTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: Array


def make_ldamp_model(tc: LDAMPTrainConfig) -> LDAMP:
    return LDAMP(max_unrolls=tc.max_unrolls, shared_nets=tc.shared_nets,
                 chans=tc.chans, num_pools=tc.num_pools)


def train_ldamp_snr(
    config: Config,
    train_snr: float,
    tc: LDAMPTrainConfig = LDAMPTrainConfig(),
    train_seed: int = 1234,
    checkpoint_path: Optional[str] = None,
    n_epochs: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
) -> Tuple[Any, dict]:
    """Train one LDAMP model at one SNR; returns (params, logs)."""
    n_epochs = n_epochs if n_epochs is not None else tc.n_epochs
    num_pilots = int(config.data.num_tx * tc.alpha)
    # training noise amplitude (train_ldamp.py:66); dataset divides by √2
    noise_std = 10 ** (-train_snr / 20.0) * np.sqrt(config.data.num_tx)
    data_cfg = dataclasses.replace(config.data, noise_std=float(noise_std),
                                   num_pilots=num_pilots)
    ds = ChannelDataset(train_seed, data_cfg, norm="global")

    model = make_ldamp_model(tc)
    sched = optax.exponential_decay(
        tc.lr, transition_steps=tc.decay_epochs * max(1, len(ds) // tc.batch_size),
        decay_rate=tc.decay_gamma, staircase=True)
    tx = optax.adam(sched)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: LDAMPTrainState, batch, key):
        def loss_fn(params):
            h = model.apply({"params": params}, batch["Y_herm"],
                            batch["P_herm"], batch["eig1"], key,
                            tc.max_unrolls)
            # e2e MSE on unnormalized Hermitian channel (train_ldamp.py:117-120)
            mse = jnp.mean(cplx.sum_abs2(h - batch["H_herm_cplx"],
                                         axis=(-1, -2)))
            nmse = jnp.mean(cplx.nmse(h, batch["H_herm_cplx"]))
            return mse, nmse

        (loss, nmse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (LDAMPTrainState(params=params, opt_state=opt_state,
                                step=state.step + 1), loss, nmse)

    key = jax.random.key(tc.seed)
    key, k_init, k_batch0 = jax.random.split(key, 3)
    b0 = _device_batch(ds, k_batch0, min(2, len(ds)))
    # init with the FULL unroll count so every denoiser's params exist
    params = model.init(k_init, b0["Y_herm"], b0["P_herm"], b0["eig1"],
                        jax.random.key(0), tc.max_unrolls)["params"]
    state = LDAMPTrainState(params=params, opt_state=tx.init(params),
                            step=jnp.zeros((), jnp.int32))

    batch_size = min(tc.batch_size, len(ds))
    loss_log, nmse_log = [], []
    t0 = time.time()
    for epoch in range(n_epochs):
        for _ in range(max(1, len(ds) // batch_size)):
            key, k_b, k_s = jax.random.split(key, 3)
            batch = _device_batch(ds, k_b, batch_size)
            state, loss, nmse = train_step(state, batch, k_s)
            loss_log.append(float(loss))
            nmse_log.append(float(nmse))
        log_fn(f"SNR {train_snr:.1f} epoch {epoch} loss {loss_log[-1]:.3f} "
               f"NMSE {10 * np.log10(max(nmse_log[-1], 1e-12)):.2f} dB "
               f"({int(state.step) / (time.time() - t0):.2f} steps/s)")

    logs = {"loss_log": np.asarray(loss_log), "nmse_log": np.asarray(nmse_log)}
    if checkpoint_path:
        save_checkpoint(checkpoint_path, config, params=state.params,
                        extra_arrays=logs,
                        metadata={"train_snr": train_snr,
                                  "alpha": tc.alpha,
                                  "tc": dataclasses.asdict(tc)})
        log_fn(f"saved {checkpoint_path}")
    return state.params, logs


def _device_batch(ds: ChannelDataset, key, batch_size):
    """Host batch → c2 device arrays for the LDAMP graph."""
    b = ds.sample_batch(key, batch_size)
    return {
        "Y_herm": cplx.from_complex(np.asarray(b["Y_herm"])),
        "P_herm": cplx.from_complex(np.asarray(b["P_herm"])),
        "H_herm_cplx": cplx.from_complex(np.asarray(b["H_herm_cplx"])),
        "eig1": jnp.asarray(np.asarray(b["eig1"])),
    }


def train_ldamp_all_snrs(
    config: Config,
    snr_range: Sequence[float] = tuple(np.arange(-10, 35, 5)),
    tc: LDAMPTrainConfig = LDAMPTrainConfig(),
    out_dir: str = "models/ldamp-FlippedUNet",
    n_epochs: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
) -> None:
    """Reference sweep: one model per SNR in −10…30 step 5 (train_ldamp.py:23-24,36)."""
    import os

    ch = config.data.channel
    for snr in snr_range:
        path = os.path.join(out_dir, f"train-{ch}",
                            f"model_snr{snr:.2f}_alpha{tc.alpha:.2f}.npz")
        train_ldamp_snr(config, float(snr), tc, checkpoint_path=path,
                        n_epochs=n_epochs, log_fn=log_fn)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Train LDAMP (one model per SNR)")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--alpha", type=float, default=0.6)
    p.add_argument("--snr_range", nargs="+", type=float,
                   default=list(np.arange(-10, 35, 5)))
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--model_dir", type=str,
                   default="models/ldamp-FlippedUNet")
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
    tc = LDAMPTrainConfig(alpha=args.alpha)
    train_ldamp_all_snrs(cfg, snr_range=args.snr_range, tc=tc,
                         out_dir=args.model_dir, n_epochs=args.epochs)


if __name__ == "__main__":
    main()
