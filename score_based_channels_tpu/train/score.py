"""Data-parallel DSM trainer for the score network.

TPU rethink of reference train_score.py:145-208:
  - one jitted train step (DSM loss → Adam(eps=1e-3) → EMA) with donated
    state; batch sharded over the ('data',) mesh, params replicated — XLA
    inserts the gradient all-reduce,
  - EMA is a shadow pytree in the train state (no model rebuild per
    validation round, unlike reference ema.py:30-41),
  - validation DSM on the EMA shadow every `log_every_steps`
    (train_score.py:176-196),
  - checkpoint keeps config + losses (train_score.py:211-216).

Recipe parity: batch 32, 400 epochs, Adam lr=1e-4 eps=1e-3, EMA 0.999,
anneal_power 2, geometric σ (train_score.py:34-67, 98-101).
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

from ..config import Config
from ..data.dataset import ChannelDataset
from ..diffusion.dsm import anneal_dsm_loss
from ..diffusion.ema import ema_init, ema_update
from ..diffusion.sigmas import sigmas_from_config
from ..models import make_score_model
from ..parallel.mesh import data_sharding, make_mesh, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint

Array = jax.Array


class ScoreTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema_params: Any
    step: Array


def make_optimizer(optim_cfg) -> optax.GradientTransformation:
    """Optimizer factory (reference ncsnv2/losses/__init__.py:3-13)."""
    name = optim_cfg.optimizer.lower()
    if name == "adam":
        # torch Adam semantics: eps OUTSIDE the sqrt; optax.adam matches.
        adam = optax.amsgrad if optim_cfg.amsgrad else optax.adam
        tx = adam(optim_cfg.lr, b1=optim_cfg.beta1, b2=optim_cfg.beta2,
                  eps=optim_cfg.eps)
        if optim_cfg.weight_decay:
            # torch couples weight decay into the Adam gradient
            # (ncsnv2/losses/__init__.py:5-7 passes weight_decay to Adam),
            # so decay is applied before the Adam transform for either variant
            tx = optax.chain(
                optax.add_decayed_weights(optim_cfg.weight_decay), tx)
        return tx
    if name == "rmsprop":
        return optax.rmsprop(optim_cfg.lr, decay=0.99, eps=1e-8)
    if name == "sgd":
        return optax.sgd(optim_cfg.lr, momentum=0.9)
    raise NotImplementedError(f"Optimizer {optim_cfg.optimizer} not understood.")


def make_score_train_step(
    model, tx: optax.GradientTransformation, sigmas: Array,
    ema_rate: float, anneal_power: float, batch_sharding=None,
) -> Tuple[Callable, Callable]:
    """Build (jitted single step, jitted scanned chunk runner).

    The chunk runner is the production path: it keeps `log_every_steps`
    train steps entirely on device in one `lax.scan` — the host only sees
    state + a loss vector per chunk. This removes the per-step
    host↔device round-trips (`int(step)`, `float(loss)`, per-batch
    `device_put`) that the reference's Python loop suffers from
    (SURVEY.md §3.2) and that round 1 had reintroduced.
    """

    def apply_fn(params, x, used_sigmas):
        return model.apply({"params": params}, x, used_sigmas)

    def step(state: ScoreTrainState, x: Array, key: Array):
        def loss_fn(params):
            return anneal_dsm_loss(apply_fn, params, x, sigmas, key,
                                   anneal_power=anneal_power)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, ema_rate)
        return (
            ScoreTrainState(params=params, opt_state=opt_state,
                            ema_params=ema_params, step=state.step + 1),
            loss,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: ScoreTrainState, x: Array, key: Array):
        return step(state, x, key)

    @partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state: ScoreTrainState, x_all: Array, idx: Array,
                    base_key: Array):
        """Run idx.shape[0] steps on device. idx: (L, batch) gather indices
        into the HBM-resident x_all; per-step RNG is fold_in(base_key,
        global step) so results are chunk-size invariant."""

        def body(carry, idx_row):
            st = carry
            x = jnp.take(x_all, idx_row, axis=0)
            if batch_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, batch_sharding)
            k = jax.random.fold_in(base_key, st.step)
            st, loss = step(st, x, k)
            return st, loss

        return jax.lax.scan(body, state, idx)

    return train_step, train_chunk


def make_eval_loss(model, sigmas: Array, anneal_power: float) -> Callable:
    def apply_fn(params, x, used_sigmas):
        return model.apply({"params": params}, x, used_sigmas)

    @jax.jit
    def eval_loss(params, x, key):
        return anneal_dsm_loss(apply_fn, params, x, sigmas, key,
                               anneal_power=anneal_power)

    return eval_loss


class ScoreTrainer:
    """Full training run orchestrator (reference train_score.py recipe)."""

    def __init__(self, config: Config, use_mesh: bool = True,
                 num_devices: Optional[int] = None):
        self.config = config
        self.model = make_score_model(config.model, config.data.channels)
        self.sigmas = sigmas_from_config(config.model)
        self.tx = make_optimizer(config.optim)
        self.mesh = (make_mesh(num_devices)
                     if use_mesh and config.training.data_parallel else None)
        batch_sharding = (data_sharding(self.mesh, 4)
                          if self.mesh is not None else None)
        self.train_step, self.train_chunk = make_score_train_step(
            self.model, self.tx, self.sigmas, config.model.ema_rate,
            config.training.anneal_power, batch_sharding=batch_sharding)
        self.eval_loss = make_eval_loss(
            self.model, self.sigmas, config.training.anneal_power)

    def init_state(self, key: Array) -> ScoreTrainState:
        sample = jnp.zeros(
            (1, self.config.data.num_tx, self.config.data.num_rx,
             self.config.data.channels), jnp.float32)
        params = self.model.init(key, sample, jnp.float32(1.0))["params"]
        state = ScoreTrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema_params=ema_init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicate(self.mesh))
        return state

    def _shard(self, x: Array) -> Array:
        if self.mesh is None:
            return x
        n_dev = self.mesh.devices.size
        if x.shape[0] % n_dev != 0:
            # non-divisible batches (e.g. the fixed validation set) are
            # replicated — correctness over marginal layout efficiency
            return jax.device_put(x, replicate(self.mesh))
        return jax.device_put(x, data_sharding(self.mesh, x.ndim))

    def restore_state(self, checkpoint_path: str) -> ScoreTrainState:
        """Resume: rebuild the full train state (params/EMA/optimizer/step)
        from a checkpoint — the capability the reference only has in its
        dead vendored runner (ncsn_runner.py:67-76; SURVEY.md §5)."""
        from ..utils.checkpoint import load_checkpoint

        ck = load_checkpoint(checkpoint_path)
        key = jax.random.key(0)
        state = self.init_state(key)
        params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        ema = (jax.tree_util.tree_map(jnp.asarray, ck["ema"])
               if ck["ema"] is not None else params)
        opt_state = state.opt_state
        if ck["opt_leaves"] is not None:
            treedef = jax.tree_util.tree_structure(state.opt_state)
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(l) for l in ck["opt_leaves"]])
        step = jnp.asarray(ck["metadata"].get("steps", 0), jnp.int32)
        state = ScoreTrainState(params=params, opt_state=opt_state,
                                ema_params=ema, step=step)
        if self.mesh is not None:
            state = jax.device_put(state, replicate(self.mesh))
        return state

    def train(
        self,
        train_seed: int = 1234,
        val_seed: int = 4321,
        rng_seed: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        n_epochs: Optional[int] = None,
        resume_from: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        metrics_path: Optional[str] = None,
    ) -> Tuple[ScoreTrainState, dict]:
        cfg = self.config
        n_epochs = n_epochs if n_epochs is not None else cfg.training.n_epochs
        rng_seed = rng_seed if rng_seed is not None else cfg.training.seed

        # datasets: train stats normalize validation (train_score.py:84)
        train_ds = ChannelDataset(train_seed, cfg, norm=cfg.data.norm_channels)
        val_ds = ChannelDataset(val_seed, cfg, norm=list(train_ds.norm_stats))
        x_train = np.asarray(train_ds.network_input())
        x_val = self._shard(val_ds.network_input())

        # RNG streams derived once from the seed so resume is deterministic:
        # same seed → same shuffles and per-step keys regardless of restarts
        root = jax.random.key(rng_seed)
        k_init, k_perm, base_key, k_val_root = jax.random.split(root, 4)
        if resume_from:
            state = self.restore_state(resume_from)
        else:
            state = self.init_state(k_init)
        start_step = int(state.step)

        from ..utils.metrics import MetricsLogger

        metrics = MetricsLogger(metrics_path)
        batch = cfg.training.batch_size
        n = x_train.shape[0]
        steps_per_epoch = n // batch  # drop_last=True (train_score.py:75)
        total_steps = n_epochs * steps_per_epoch

        # stage the whole training tensor in HBM once (dataset is ~MBs,
        # SURVEY §2.4 host-data-loading row); per-step batches are gathered
        # on device inside the scanned chunk — no per-step device_put
        x_all = jnp.asarray(x_train)
        if self.mesh is not None:
            x_all = jax.device_put(x_all, replicate(self.mesh))

        # per-epoch shuffles, precomputed (deterministic in the seed)
        idx_all = np.concatenate([
            np.asarray(jax.random.permutation(
                jax.random.fold_in(k_perm, e), n))[:steps_per_epoch * batch]
            for e in range(n_epochs)
        ]).reshape(total_steps, batch).astype(np.int32)

        train_loss_log, val_loss_log = [], []
        running = None
        chunk_len = max(1, cfg.training.log_every_steps)
        t0 = time.time()
        done = start_step
        while done < total_steps:
            idx = idx_all[done:done + chunk_len]
            state, losses = self.train_chunk(state, x_all, jnp.asarray(idx),
                                             base_key)
            done += idx.shape[0]
            losses = np.asarray(losses)  # ONE device→host sync per chunk
            for loss_f in losses.tolist():
                running = (loss_f if running is None
                           else 0.99 * running + 0.01 * loss_f)
            train_loss_log.extend(losses.tolist())
            epoch = (done - 1) // steps_per_epoch
            v = float(self.eval_loss(state.ema_params, x_val,
                                     jax.random.fold_in(k_val_root, done)))
            val_loss_log.append(v)
            sps = (done - start_step) / (time.time() - t0)
            log_fn(f"Epoch {epoch}, Step {done}, "
                   f"Train Loss (EMA) {running:.3f}, Val. Loss {v:.3f}, "
                   f"{sps:.2f} steps/s")
            metrics.log("val", epoch=epoch, step=done,
                        train_loss_ema=running, val_loss=v, steps_per_s=sps)

        logs = {"train_loss": np.asarray(train_loss_log),
                "val_loss": np.asarray(val_loss_log),
                "norm_stats": np.asarray([np.real(train_ds.mean),
                                          float(train_ds.std)])}
        if checkpoint_path:
            save_checkpoint(
                checkpoint_path, cfg,
                params=state.params, ema_params=state.ema_params,
                opt_state_leaves=jax.tree_util.tree_leaves(state.opt_state),
                extra_arrays=logs,
                metadata={"steps": int(state.step)})
            log_fn(f"saved checkpoint to {checkpoint_path}")
        return state, logs


def main(argv=None):
    """CLI: the reference `python -m ...train_score --train CDL-C` recipe
    (train_score.py:20-23), TPU-native."""
    import argparse

    p = argparse.ArgumentParser(description="Train the score model (DSM+EMA)")
    p.add_argument("--train", type=str, default="CDL-C",
                   help="CDL profile to train on")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--train_size", type=int, default=None,
                   help="training realizations (reference uses 200; the "
                        "built-in CDL generator allows arbitrarily more)")
    p.add_argument("--output", type=str, default=None,
                   help="checkpoint path (default models/score/<ch>/final_model.npz)")
    p.add_argument("--ray_coupling", type=str, default="random",
                   choices=["random", "fixed"],
                   help="generator ensemble (DataConfig.ray_coupling): "
                        "'fixed' trains on the per-drop-conditioned "
                        "ensemble — the reference-data hypothesis "
                        "(RESULTS.md round 3)")
    p.add_argument("--cache", type=str, default="/tmp/sbc_jax_cache")
    args = p.parse_args(argv)

    import jax

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import dataclasses as _dc

    from ..config import default_score_config

    cfg = default_score_config(args.train)
    if args.train_size:
        cfg = cfg.replace(data=_dc.replace(cfg.data,
                                           num_channels=args.train_size))
    if args.ray_coupling != "random":
        cfg = cfg.replace(data=_dc.replace(cfg.data,
                                           ray_coupling=args.ray_coupling))
    out = args.output or f"models/score/{args.train}/final_model.npz"
    trainer = ScoreTrainer(cfg)
    trainer.train(checkpoint_path=out, n_epochs=args.epochs)


if __name__ == "__main__":
    main()
