"""Channel dataset: realizations → normalized device arrays + pilot synthesis.

TPU-native rethink of the reference `Channels` torch Dataset
(loaders.py:8-107). The whole dataset (200×16×64 complex64 ≈ 0.8 MB per
profile) trivially fits in HBM, so instead of a per-item __getitem__ +
DataLoader workers we keep everything as batched arrays and synthesize
pilots/measurements on device with explicit jax.random keys.

Semantics preserved from the reference:
  - only subcarrier 0 of each file is used (loaders.py:33),
  - 'global' norm: mean=0, std over the full complex train tensor
    (loaders.py:47-49); 'entrywise': per-entry mean/std over realizations
    (loaders.py:44-46); explicit [mean, std] pass-through for val/test
    normalization with TRAIN stats (test_score.py:101),
  - per-sample QPSK pilots P ∈ C^{Nt×Np} with entries (±1±j)/√2
    (loaders.py:52-55),
  - measurement Y = H·P + n with per-component noise amplitude
    noise_std/√2 (loaders.py:57-80),
  - the Hermitian network view H^H (loaders.py:87-99) — here NHWC.

Deliberate deviation: `eig1` is the true largest eigenvalue of P·Pᴴ via
eigvalsh (the reference takes the *first, unsorted* eigenvalue from
np.linalg.eigvals at loaders.py:83-85 — which works only by accident of
LAPACK ordering; LDAMP divides by λ_max, aux_models.py:137).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DataConfig
from ..physics import complex_to_nhwc, qpsk_pilots
from .cdl import generate_cdl_channels
from .io import load_output_h

Array = jax.Array
NormSpec = Union[None, str, Tuple[np.ndarray, np.ndarray], list]


def channel_filename(data_dir: str, profile: str, num_tx: int, num_rx: int,
                     spacing: float, seed: int, ext: str = "npz") -> str:
    """Reference artifact naming (loaders.py:23-24), configurable extension."""
    return os.path.join(
        data_dir, f"{profile}_Nt{num_tx}_Nr{num_rx}_ULA{spacing:.2f}_seed{seed}.{ext}"
    )


class ChannelDataset:
    """Channel realizations for one (profile, seed) across spacings."""

    def __init__(
        self,
        seed: int,
        config: Union[Config, DataConfig],
        norm: NormSpec = None,
        num_pilots: Optional[int] = None,
    ):
        data = config.data if isinstance(config, Config) else config
        self.config = data
        self.seed = seed
        self.num_pilots = int(num_pilots if num_pilots is not None
                              else data.num_pilots)

        chans = []
        self.filenames = []
        for spacing in data.spacing_list:
            if data.source == "file":
                path = None
                for ext in ("npz", "mat", "h5"):
                    cand = channel_filename(data.data_dir, data.channel,
                                            data.num_tx, data.num_rx,
                                            spacing, seed, ext)
                    if os.path.exists(cand):
                        path = cand
                        break
                if path is None:
                    raise FileNotFoundError(
                        f"no channel file for {data.channel} spacing {spacing} "
                        f"seed {seed} under {data.data_dir}")
                self.filenames.append(path)
                output_h = load_output_h(path)
            else:
                output_h = generate_cdl_channels(
                    seed=seed, profile=data.channel,
                    num_channels=data.num_channels, num_rx=data.num_rx,
                    num_tx=data.num_tx, spacing=spacing,
                    ray_coupling=getattr(data, "ray_coupling", "random"))
            # keep only the first subcarrier (loaders.py:33)
            chans.append(np.asarray(output_h[:, 0], np.complex64))
        self.channels = np.reshape(
            np.asarray(chans), (-1, chans[0].shape[-2], chans[0].shape[-1]))

        # normalization stats (loaders.py:41-49)
        if isinstance(norm, (tuple, list)):
            self.mean, self.std = norm[0], norm[1]
        elif norm == "entrywise":
            self.mean = np.mean(self.channels, axis=0)
            self.std = np.std(self.channels, axis=0)
        elif norm == "global":
            self.mean = 0.0
            self.std = float(np.std(self.channels))
        elif norm is None:
            self.mean, self.std = 0.0, 1.0
        else:
            raise ValueError(f"unknown norm {norm!r}")

        self.noise_amp = data.noise_std / np.sqrt(2.0)  # loaders.py:58

    def __len__(self) -> int:
        return self.channels.shape[0]

    @property
    def norm_stats(self) -> Tuple[np.ndarray, np.ndarray]:
        return (self.mean, self.std)

    # ------------------------------------------------------------------
    # batched device-side views
    # ------------------------------------------------------------------

    def normalized(self) -> np.ndarray:
        """(N, Nr, Nt) complex64 HOST array, (H − mean)/std (loaders.py:68-69).

        Complex math stays on the host: the TPU backend has no complex
        support (see cplx.py); device work uses the c2 views below.
        """
        return ((self.channels - self.mean) / self.std).astype(np.complex64)

    def hermitian(self, normalized: bool = True) -> np.ndarray:
        """H^H → (N, Nt, Nr) complex64 host array (loaders.py:88-89)."""
        h = self.normalized() if normalized else self.channels
        return np.conj(np.swapaxes(h, -1, -2))

    def hermitian_c2(self, normalized: bool = True) -> Array:
        """H^H in c2 → (N, Nt, Nr, 2) float32 device array."""
        from .. import cplx

        return cplx.from_complex(self.hermitian(normalized=normalized))

    def network_input(self) -> Array:
        """(N, Nt, Nr, 2) float32 NHWC — the score-net view (loaders.py:90-91)."""
        return self.hermitian_c2(normalized=True)

    def sample_batch(self, key: Array, batch_size: Optional[int] = None,
                     with_measurements: bool = True) -> dict:
        """Assemble a training/eval batch mirroring loaders.py:97-106.

        Returns a dict of device arrays:
          H           (B, Nr, Nt)     normalized complex channel
          H_herm      (B, Nt, Nr, 2)  normalized Hermitian, NHWC real
          H_herm_cplx (B, Nt, Nr)     UNnormalized Hermitian complex
          P           (B, Nt, Np)     QPSK pilots
          P_herm      (B, Np, Nt)     conj-transposed pilots (= operator A)
          Y           (B, Nr, Np)     unnormalized measurements H·P (+noise)
          Y_herm      (B, Np, Nr)
          eig1        (B,)            λ_max(P·Pᴴ)
          sigma_n     ()              per-component noise amplitude
          idx         (B,)            realization indices
        """
        # complex math pinned to the host CPU backend — the TPU rejects
        # complex dtypes (cplx.py); downstream device work converts to c2
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return self._sample_batch_cpu(key, batch_size, with_measurements)

    def _sample_batch_cpu(self, key, batch_size, with_measurements) -> dict:
        n = len(self)
        k_idx, k_pilot, k_noise = jax.random.split(key, 3)
        if batch_size is None:
            idx = jnp.arange(n)
        else:
            idx = jax.random.choice(k_idx, n, (batch_size,), replace=False)

        H_raw = jnp.asarray(self.channels)[idx]  # (B, Nr, Nt) unnormalized
        H_norm = (H_raw - self.mean) / self.std
        H_herm_norm = jnp.conj(jnp.swapaxes(H_norm, -1, -2))
        H_herm_raw = jnp.conj(jnp.swapaxes(H_raw, -1, -2))

        b = H_raw.shape[0]
        P = qpsk_pilots(k_pilot, b, self.config.num_tx, self.num_pilots)
        out = {
            "H": H_norm.astype(jnp.complex64),
            "H_herm": complex_to_nhwc(H_herm_norm).astype(jnp.float32),
            "H_herm_cplx": H_herm_raw.astype(jnp.complex64),
            "P": P,
            "P_herm": jnp.conj(jnp.swapaxes(P, -1, -2)),
            "sigma_n": jnp.asarray(self.noise_amp, jnp.float32),
            "idx": idx,
        }
        if with_measurements:
            Y = jnp.matmul(H_raw, P)  # (B, Nr, Np); loaders.py:77
            if self.noise_amp > 0:
                kr, ki = jax.random.split(k_noise)
                Y = Y + self.noise_amp * (
                    jax.random.normal(kr, Y.shape)
                    + 1j * jax.random.normal(ki, Y.shape))
            out["Y"] = Y.astype(jnp.complex64)
            out["Y_herm"] = jnp.conj(jnp.swapaxes(Y, -1, -2))
            gram = jnp.matmul(P, jnp.conj(jnp.swapaxes(P, -1, -2)))
            out["eig1"] = jnp.linalg.eigvalsh(gram)[..., -1].astype(jnp.float32)
        return out
