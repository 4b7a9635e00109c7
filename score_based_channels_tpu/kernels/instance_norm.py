"""Pallas-TPU fused InstanceNorm++ (+ optional ELU) kernel.

InstanceNorm++ (reference normalization.py:150-176; see
models/layers.py:InstanceNorm2dPlus) needs three reduction families per
call — per-(b,c) spatial mean/variance, and mean/variance across channels
of the spatial means — followed by the normalize/affine chain. Under XLA
these reductions break elementwise fusion, costing several HBM round trips
over the activation. This kernel does the whole op (optionally with the
following ELU) in ONE pass: each grid step loads one sample's (H, W, C)
block into VMEM, computes all statistics on-chip, and writes the result.

The feature map is tiny (≤ 64·16·128 floats = 512 KB ≪ VMEM), so a
one-sample block always fits.

Used by models/layers.InstanceNorm2dPlus when kernels are enabled
(set_kernels_enabled(True)); the jnp path remains the reference
implementation and the parity oracle.

MEASURED VERDICT (v5e, bench.py --pallas-norm): at this model's tensor
sizes (≤ 256×64×16×32) the kernel is ~10× SLOWER than XLA's fused
reductions. Round 1 blamed grid-launch overhead; the round-2 xprof trace
(BENCH.md "Where the time actually goes") shows the true mechanism is
FUSION-BOUNDARY HBM TRAFFIC: XLA fuses the norm's reductions and
elementwise tail into the producing convolution's fusion, so the
statistics read VMEM-resident data (measured effective bandwidth of the
norm-side "loop fusion" ops: ~3.3 TB/s ≈ 4× HBM peak — impossible unless
the reads never leave the chip). ANY standalone kernel at a pallas_call
boundary must round-trip the activation through HBM (33.5 MB for the
256×64×16×32 layer ⇒ ≥82 µs at the 819 GB/s peak vs ~12 µs for XLA's
fused cost) — a structural ~6× loss no grid/block shape can recover.
The same argument closes the Pallas axis for every non-conv-subsuming
kernel in this model; and a conv-subsuming mega-kernel would have to
beat XLA's conv fusions, which already run at 41% of bf16 FLOP peak on
shapes whose 32/64-wide channels structurally cap MXU lane utilization
at 25–50%. Kernels therefore default OFF (jnp path is the reference
implementation); per SURVEY.md §7.2 step 8, Pallas is only adopted
"where profiles justify", and here the profile says XLA wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_ENABLED = False


def set_kernels_enabled(enabled: bool) -> None:
    """Globally toggle Pallas kernels (checked at trace time)."""
    global _ENABLED
    _ENABLED = enabled


def kernels_enabled() -> bool:
    return _ENABLED


def _inp_kernel(x_ref, alpha_ref, gamma_ref, beta_ref, out_ref, *,
                fuse_elu: bool):
    x = x_ref[0]  # (H, W, C)
    h_, w_, c = x.shape
    n = h_ * w_

    # per-channel spatial stats (biased variance, torch InstanceNorm2d)
    means = jnp.sum(x, axis=(0, 1)) / n  # (C,)
    var = jnp.sum(x * x, axis=(0, 1)) / n - means * means
    inv = jax.lax.rsqrt(var + 1e-5)

    # channel-mean statistics (UNBIASED variance, normalization.py:166)
    m = jnp.sum(means) / c
    cdiff = means - m
    v = jnp.sum(cdiff * cdiff) / (c - 1)
    means_hat = cdiff * jax.lax.rsqrt(v + 1e-5)  # (C,)

    alpha = alpha_ref[0]
    gamma = gamma_ref[0]
    beta = beta_ref[0]
    scale = gamma * inv
    shift = gamma * (means_hat * alpha - means * inv) + beta
    out = x * scale + shift
    if fuse_elu:
        out = jnp.where(out > 0, out, jnp.expm1(out))
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("fuse_elu", "interpret"))
def instance_norm_plus_pallas(
    x: Array,
    alpha: Array,
    gamma: Array,
    beta: Array,
    fuse_elu: bool = False,
    interpret: bool = False,
) -> Array:
    """InstanceNorm++ over NHWC x; one grid step per batch element."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # CPU interpret path
        vmem = None

    b, h, w, c = x.shape
    spec = lambda shape, index_map: pl.BlockSpec(
        shape, index_map, memory_space=vmem) if vmem is not None else \
        pl.BlockSpec(shape, index_map)

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            spec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            spec((1, c), lambda i: (0, 0)),
            spec((1, c), lambda i: (0, 0)),
            spec((1, c), lambda i: (0, 0)),
        ],
        out_specs=spec((1, h, w, c), lambda i: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_inp_kernel, fuse_elu=fuse_elu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(x, alpha.reshape(1, c), gamma.reshape(1, c), beta.reshape(1, c))
