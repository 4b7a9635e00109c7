"""LDAMP evaluation over SNR (reference test_ldamp.py semantics).

Loads the per-SNR checkpoints produced by train/ldamp.py, rebuilds each
model, and logs NMSE on the validation channels at its matching SNR.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np

from .. import cplx
from ..config import Config
from ..data.dataset import ChannelDataset
from ..train.ldamp import LDAMPTrainConfig, make_ldamp_model, _device_batch
from ..utils.checkpoint import load_checkpoint

Array = jax.Array


@dataclasses.dataclass
class LDAMPResults:
    nmse: np.ndarray  # (n_snr, n_channels)
    snr_range: np.ndarray

    def avg_db(self) -> np.ndarray:
        return 10 * np.log10(self.nmse.mean(-1))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **dataclasses.asdict(self))


def run_ldamp_eval(
    config: Config,
    channel: str = "CDL-C",
    snr_range: Sequence[float] = tuple(np.arange(-10, 35, 5)),
    alpha: float = 0.6,
    model_dir: str = "models/ldamp-FlippedUNet",
    num_channels: int = 100,
    val_seed: int = 4321,
    seed: int = 17,
) -> LDAMPResults:
    num_pilots = int(config.data.num_tx * alpha)
    out = np.zeros((len(snr_range), num_channels), np.float32)
    key = jax.random.key(seed)

    for i, snr in enumerate(snr_range):
        path = os.path.join(model_dir, f"train-{channel}",
                            f"model_snr{snr:.2f}_alpha{alpha:.2f}.npz")
        ck = load_checkpoint(path)
        meta = ck["metadata"]
        tc = LDAMPTrainConfig(**meta["tc"]) if "tc" in meta else LDAMPTrainConfig()
        model = make_ldamp_model(tc)

        noise_std = 10 ** (-snr / 20.0) * np.sqrt(config.data.num_tx)
        val_cfg = dataclasses.replace(
            config.data, channel=channel, noise_std=float(noise_std),
            num_pilots=num_pilots,
            num_channels=max(num_channels, config.data.num_channels))
        ds = ChannelDataset(val_seed, val_cfg, norm="global")
        k_b, k_m = jax.random.split(jax.random.fold_in(key, i))
        batch = _device_batch(ds, k_b, min(num_channels, len(ds)))
        h = model.apply({"params": ck["params"]}, batch["Y_herm"],
                        batch["P_herm"], batch["eig1"], k_m, tc.max_unrolls)
        out[i, :h.shape[0]] = np.asarray(
            cplx.nmse(h, batch["H_herm_cplx"]))
    return LDAMPResults(nmse=out, snr_range=np.asarray(snr_range, np.float64))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Evaluate LDAMP per-SNR models")
    p.add_argument("--train", type=str, default="CDL-C")
    p.add_argument("--alpha", type=float, default=0.6)
    p.add_argument("--snr_range", nargs="+", type=float,
                   default=list(np.arange(-10, 35, 5)))
    p.add_argument("--num_channels", type=int, default=100)
    p.add_argument("--model_dir", type=str,
                   default="models/ldamp-FlippedUNet")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ray_coupling", type=str, default=None,
                   choices=["random", "fixed"],
                   help="dataset ensemble override (fixed = the paper-matching per-drop coupling)")
    args = p.parse_args(argv)

    from ..config import default_score_config

    cfg = default_score_config(args.train, ray_coupling=args.ray_coupling)
    res = run_ldamp_eval(cfg, channel=args.train, snr_range=args.snr_range,
                         alpha=args.alpha, model_dir=args.model_dir,
                         num_channels=args.num_channels)
    for s, snr in enumerate(res.snr_range):
        print(f"SNR {snr:6.1f} dB  NMSE {res.avg_db()[s]:7.2f} dB")
    out = args.output or f"results/ldamp/{args.train}_alpha{args.alpha:.2f}.npz"
    res.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
