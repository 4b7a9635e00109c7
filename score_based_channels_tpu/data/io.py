"""Channel-file I/O: MATLAB .mat (v5 and v7.3/HDF5) and .npz.

The reference consumes MATLAB artifacts `output_h` of shape
(num_channels, num_subcarriers, Nr, Nt) via hdf5storage
(loaders.py:29-33, generate_data.m:36-38). Here we read both .mat
generations without hdf5storage: scipy.io for v5, h5py for v7.3 (HDF5),
handling MATLAB's column-major transposition and compound complex dtype.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_output_h(path: str) -> np.ndarray:
    """Load `output_h` → (N, S, Nr, Nt) complex64 from .mat/.h5/.npz."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return np.asarray(f["output_h"], np.complex64)
    try:
        import scipy.io as sio

        contents = sio.loadmat(path)
        return np.asarray(contents["output_h"], np.complex64)
    except NotImplementedError:
        pass  # v7.3 → HDF5
    import h5py

    with h5py.File(path, "r") as f:
        ds = f["output_h"][...]
        if ds.dtype.names and {"real", "imag"} <= set(ds.dtype.names):
            arr = ds["real"] + 1j * ds["imag"]
        else:
            arr = ds
        # MATLAB HDF5 stores column-major: dims arrive reversed
        return np.ascontiguousarray(np.transpose(arr)).astype(np.complex64)


def save_output_h(path: str, output_h: np.ndarray) -> None:
    """Save in the loadable format implied by the extension (.npz or .mat v5)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".npz"):
        np.savez_compressed(path, output_h=np.asarray(output_h, np.complex64))
    elif path.endswith(".mat"):
        import scipy.io as sio

        sio.savemat(path, {"output_h": np.asarray(output_h, np.complex64)})
    else:
        raise ValueError(f"unsupported extension: {path}")
