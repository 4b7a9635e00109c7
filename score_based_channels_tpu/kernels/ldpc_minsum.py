"""Pallas-TPU fused LDPC min-sum BP iteration.

One belief-propagation iteration of the normalized min-sum decoder
(comms/ldpc.py:minsum_decode, the TPU-native equivalent of the
reference's MATLAB `ldpcDecode` call in testPackets.m) reads the
(B, m, n) check-to-variable message tensor and produces the next one.
The jnp formulation needs several full-tensor materializations per
iteration — variable totals, variable-to-check messages, |msg| with the
mask applied, the argmin one-hot, the sign field — and XLA keeps fusion
boundaries between the three reduction families (sum over checks, min
over variables, sign-parity over variables), so each BP iteration makes
~6 HBM round trips over the 0.84 MB/packet message slab.

This kernel does the WHOLE iteration in one pass: each grid step loads a
batch tile of messages into VMEM (TB=2 packets ⇒ 1.7 MB/slab for the
802.11n (648, 324) code; larger tiles overflow VMEM once the pipeline
double-buffers the ~8 live message-sized temporaries), computes totals, extrinsic min1/min2 (exact
first-occurrence tie semantics, matching the jnp path bit for bit), and
the parity sign on-chip, and writes only the new messages: 2 HBM passes
instead of ~6.

Unlike the InstanceNorm++ kernel (see instance_norm.py — XLA wins there
because it fuses the norm into the producing conv), the BP iteration has
NO producing op to fuse into: the message tensor round-trips HBM between
iterations no matter what, so a fused single-pass kernel is a structural
win, not a trade. Measured on the real link-sim workload (v5e, B=100
packets, 25 iterations, (648,324) code): see BENCH.md "LDPC decoder
kernel" — the kernel is enabled by default on TPU (minsum_decode
use_pallas=None → auto), with the jnp path as the parity oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e9


def _bp_iter_kernel(llr_ref, mask_ref, c2v_ref, out_ref, *,
                    normalize: float, n: int):
    c2v = c2v_ref[...]            # (TB, m, n) masked messages
    llr = llr_ref[...]            # (TB, 1, n)
    mask = mask_ref[...]          # (1, m, n)

    # variable totals and extrinsic variable→check messages (c2v is
    # re-masked here so external callers may pass unmasked messages; the
    # jnp oracle applies the same mask to its carry)
    c2v = c2v * mask
    total = llr + jnp.sum(c2v, axis=1, keepdims=True)
    c_in = (total - c2v) * mask

    # per-check-row min / second-min of |msg| with first-occurrence tie
    # semantics (identical to the jnp path's argmin + one_hot)
    absm = jnp.where(mask > 0, jnp.abs(c_in), _BIG)
    min1 = jnp.min(absm, axis=2, keepdims=True)
    idxs = jax.lax.broadcasted_iota(jnp.int32, absm.shape, 2)
    amin = jnp.min(jnp.where(absm <= min1, idxs, n), axis=2, keepdims=True)
    one = idxs == amin
    min2 = jnp.min(jnp.where(one, _BIG, absm), axis=2, keepdims=True)
    mag = jnp.where(one, min2, min1) * normalize

    # row sign parity (product of signs) via negative-count parity
    sgn = jnp.where(mask > 0,
                    jnp.sign(c_in) + (c_in == 0).astype(jnp.float32), 1.0)
    neg = jnp.sum(jnp.where(c_in < 0, 1, 0) * (mask > 0), axis=2,
                  keepdims=True)
    row_sign = 1.0 - 2.0 * (neg % 2).astype(jnp.float32)

    out_ref[...] = row_sign * sgn * mag * mask


@functools.partial(jax.jit,
                   static_argnames=("normalize", "tile_b", "interpret"))
def bp_iteration_pallas(
    c2v: Array,      # (B, m, n) current check→variable messages (masked)
    llr: Array,      # (B, n) channel LLRs
    mask: Array,     # (m, n) float 0/1 parity-check mask
    normalize: float = 0.75,
    tile_b: int = 2,
    interpret: bool = False,
) -> Array:
    """One fused normalized-min-sum BP iteration; returns new c2v."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:
        vmem = None

    B, m, n = c2v.shape
    pad = (-B) % tile_b
    if pad:
        c2v = jnp.concatenate(
            [c2v, jnp.zeros((pad, m, n), c2v.dtype)], axis=0)
        llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
    Bp = B + pad

    def spec(shape, index_map):
        if vmem is not None:
            return pl.BlockSpec(shape, index_map, memory_space=vmem)
        return pl.BlockSpec(shape, index_map)

    grid_spec = pl.GridSpec(
        grid=(Bp // tile_b,),
        in_specs=[
            spec((tile_b, 1, n), lambda i: (i, 0, 0)),
            spec((1, m, n), lambda i: (0, 0, 0)),
            spec((tile_b, m, n), lambda i: (i, 0, 0)),
        ],
        out_specs=spec((tile_b, m, n), lambda i: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_bp_iter_kernel, normalize=normalize, n=n),
        out_shape=jax.ShapeDtypeStruct((Bp, m, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(llr.reshape(Bp, 1, n).astype(jnp.float32),
      mask.reshape(1, m, n).astype(jnp.float32),
      c2v.astype(jnp.float32))
    return out[:B]


def _bench(argv=None):
    """Timed XLA-vs-Pallas A/B on the real link-sim decode workload."""
    import argparse
    import time

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=100)
    p.add_argument("--iters", type=int, default=25)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    from ..comms.ldpc import make_wifi_ldpc, minsum_decode

    code = make_wifi_ldpc()
    H = jnp.asarray(code.H, jnp.float32)
    key = jax.random.key(0)
    bits = jax.random.bernoulli(key, 0.5, (args.batch, code.k))
    import numpy as np

    cw = code.encode(np.asarray(bits, np.uint8))
    llr = jnp.asarray(1 - 2 * cw.astype(np.float32)) * 4.0 \
        + 1.5 * jax.random.normal(jax.random.key(1), (args.batch, code.n))

    for use_pallas in (False, True):
        fn = jax.jit(lambda l: minsum_decode(
            l, H, num_iters=args.iters, use_pallas=use_pallas)[0])
        out = jax.block_until_ready(fn(llr))
        t0 = time.time()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn(llr))
        dt = (time.time() - t0) / args.reps
        ber = float(jnp.mean(out != jnp.asarray(cw)))
        print(f"use_pallas={use_pallas}: {dt * 1e3:.2f} ms "
              f"({args.batch * args.iters / dt:.0f} packet-iters/s, "
              f"BER {ber:.4f})")


if __name__ == "__main__":
    _bench()
