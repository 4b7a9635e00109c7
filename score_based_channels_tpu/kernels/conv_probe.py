"""Pallas conv prototypes for the score-net's dominant shapes (perf probe).

VERDICT r3 item 1 asks for kernel-level DATA on whether hand-written
Pallas can beat XLA's conv codegen on this model's shapes — the
64×16/32-ch, 32×8/64-ch and 8×2/128-ch 3×3 convs that make up 85% of
device time (BENCH.md trace attribution; reference workload
test_score.py:135-171). Two formulations:

  - per-tap accumulation: out = Σ_t shift(x, t) @ W_t — one (M, Cin) ×
    (Cin, Cout) MXU dot per live kernel tap, no patch materialization.
    Dead dilated taps (offset past the spatial extent) are statically
    skipped, like models/layers.py Conv2d's pruning.
  - im2col: materialize the (M, K=taps·Cin) patch in VMEM scratch, one
    big dot. Larger K amortizes the MXU K-dimension when Cin < 128.

plus a fused n-conv chain (weights + activations VMEM-resident across
the whole chain, ELU between convs) probing the VMEM-persistence
hypothesis: whether removing XLA's inter-conv fusion boundaries pays.

Layout: activations (S=H·W, B, C) with s-major rows — a spatial shift by
(dy, dx) is a row shift by dy·W+dx on the flattened s axis plus a
validity mask, so conv = shifted-matmul with no gathers.

Run `python -m score_based_channels_tpu.kernels.conv_probe` on the TPU
for the timing table (results recorded in BENCH.md); the pytest suite
runs the same kernels in interpreter mode for numerics.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def live_taps(k: int, dilation: int, H: int, W: int):
    """(dy, dx, row_offset) for kernel taps that can touch real data.

    A tap with d·|dy| ≥ H or d·|dx| ≥ W only ever multiplies padding
    zeros (models/layers.py Conv2d pruning) and is skipped entirely.
    """
    c = k // 2
    taps = []
    for iy in range(k):
        dy = (iy - c) * dilation
        if abs(dy) >= H:
            continue
        for ix in range(k):
            dx = (ix - c) * dilation
            if abs(dx) >= W:
                continue
            taps.append((iy, ix, dy, dx, dy * W + dx))
    return taps


def _elu(x):
    """ELU via exp (jax.nn.elu lowers to expm1, which Pallas-TPU lacks)."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _tap_mask(S: int, B: int, W: int, dy: int, dx: int, dtype):
    """(S, B, 1)-broadcastable validity mask for tap (dy, dx)."""
    s = jax.lax.broadcasted_iota(jnp.int32, (S, 1, 1), 0)
    h, w = s // W, s % W
    H = S // W
    ok = (h + dy >= 0) & (h + dy < H) & (w + dx >= 0) & (w + dx < W)
    return ok


def _shift_rows(X: Array, off: int) -> Array:
    """X (S, B, C) shifted so row s holds X[s+off], zero-filled."""
    S = X.shape[0]
    if off == 0:
        return X
    z = jnp.zeros((abs(off),) + X.shape[1:], X.dtype)
    if off > 0:
        return jnp.concatenate([X[off:], z], axis=0)
    return jnp.concatenate([z, X[:off]], axis=0)


def _conv_body(X, w_ref, b_ref, taps, S, B, W, Cin, Cout, act):
    """Shared per-tap conv: X (S,B,Cin) → (S,B,Cout) f32, then act/cast."""
    acc = jnp.zeros((S * B, Cout), jnp.float32)
    for t_i, (iy, ix, dy, dx, off) in enumerate(taps):
        Xs = _shift_rows(X, off)
        mask = _tap_mask(S, B, W, dy, dx, X.dtype)
        Xs = jnp.where(mask, Xs, jnp.zeros_like(Xs))
        Wt = w_ref[t_i]  # (Cin, Cout)
        acc = acc + jnp.dot(Xs.reshape(S * B, Cin), Wt,
                            preferred_element_type=jnp.float32)
    if b_ref is not None:
        acc = acc + b_ref[0].astype(jnp.float32)
    if act:
        acc = _elu(acc)
    return acc.reshape(S, B, Cout)


def conv_pertap(x: Array, w: Array, b: Array | None, H: int, W: int,
                dilation: int = 1, act: bool = False,
                interpret: bool = False) -> Array:
    """Per-tap Pallas conv. x (S, B, Cin); w (k, k, Cin, Cout); b (Cout,)."""
    S, B, Cin = x.shape
    k, Cout = w.shape[0], w.shape[-1]
    assert S == H * W
    taps = live_taps(k, dilation, H, W)
    w_taps = jnp.stack([w[iy, ix] for iy, ix, *_ in taps])  # (T, Cin, Cout)

    def kernel(x_ref, w_ref, b_ref, o_ref):
        X = x_ref[:]
        out = _conv_body(X, w_ref, b_ref, taps, S, B, W, Cin, Cout, act)
        o_ref[:] = out.astype(o_ref.dtype)

    args = [x, w_taps] + ([b.reshape(1, Cout)] if b is not None else [])
    if b is None:
        kernel_fn = lambda x_ref, w_ref, o_ref: kernel(
            x_ref, w_ref, None, o_ref)
    else:
        kernel_fn = kernel
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((S, B, Cout), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def conv_im2col(x: Array, w: Array, b: Array | None, H: int, W: int,
                dilation: int = 1, act: bool = False,
                interpret: bool = False) -> Array:
    """im2col Pallas conv: materialize (M, T·Cin) patch, one dot."""
    S, B, Cin = x.shape
    k, Cout = w.shape[0], w.shape[-1]
    taps = live_taps(k, dilation, H, W)
    T = len(taps)
    w_flat = jnp.concatenate(
        [w[iy, ix] for iy, ix, *_ in taps], axis=0)  # (T·Cin, Cout)

    def kernel(x_ref, w_ref, b_ref, o_ref):
        X = x_ref[:]
        cols = []
        for t_i, (iy, ix, dy, dx, off) in enumerate(taps):
            Xs = _shift_rows(X, off)
            mask = _tap_mask(S, B, W, dy, dx, X.dtype)
            cols.append(jnp.where(mask, Xs, jnp.zeros_like(Xs)))
        # lane-dim concat (a value, not misaligned scratch writes — Mosaic
        # handles the relayout once) → one (M, T·Cin) × (T·Cin, Cout) dot
        patch = jnp.concatenate(cols, axis=-1).reshape(S * B, T * Cin)
        acc = jnp.dot(patch, w_ref[:], preferred_element_type=jnp.float32)
        if b_ref is not None:
            acc = acc + b_ref[0].astype(jnp.float32)
        if act:
            acc = _elu(acc)
        o_ref[:] = acc.reshape(S, B, Cout).astype(o_ref.dtype)

    args = [x, w_flat] + ([b.reshape(1, Cout)] if b is not None else [])
    if b is None:
        kernel_fn = lambda x_ref, w_ref, o_ref: kernel(
            x_ref, w_ref, None, o_ref)
    else:
        kernel_fn = kernel
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((S, B, Cout), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def conv_chain(x: Array, ws: Array, bs: Array, H: int, W: int,
               dilation: int = 1, interpret: bool = False) -> Array:
    """n chained (conv → ELU) steps, one pallas_call, all VMEM-resident.

    ws (n, k, k, C, C); bs (n, C). Probes the VMEM-persistence design:
    no HBM traffic between convs, weights loaded once.
    """
    S, B, C = x.shape
    n, k = ws.shape[0], ws.shape[1]
    taps = live_taps(k, dilation, H, W)
    w_taps = jnp.stack([
        jnp.stack([ws[i, iy, ix] for iy, ix, *_ in taps]) for i in range(n)
    ])  # (n, T, C, C)

    def kernel(x_ref, w_ref, b_ref, o_ref):
        X = x_ref[:]
        for i in range(n):
            out = _conv_body(X, w_ref[i], b_ref[i:i + 1], taps, S, B, W,
                             C, C, act=True)
            X = out.astype(x_ref.dtype)
        o_ref[:] = X

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, B, C), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w_taps, bs)


# ---------------------------------------------------------------------------
# oracles + timing harness
# ---------------------------------------------------------------------------


def conv_nhwc(x: Array, w: Array, b: Array | None,
              dilation: int = 1, act: bool = False) -> Array:
    """The production XLA conv on native NHWC (models/layers.py Conv2d
    semantics, WITHOUT dead-tap pruning — the probe measures raw shapes)."""
    k = w.shape[0]
    pad = dilation * (k // 2)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if act:
        y = jax.nn.elu(y)
    return y.astype(x.dtype)


def conv_oracle(x_sbc: Array, w: Array, b: Array | None, H: int, W: int,
                dilation: int = 1, act: bool = False) -> Array:
    """lax.conv oracle on the (S, B, C) layout (numerics reference for
    the Pallas kernels; NOT the timing baseline — layout conversion is
    included here but excluded from timing via conv_nhwc)."""
    S, B, Cin = x_sbc.shape
    xb = x_sbc.reshape(H, W, B, Cin).transpose(2, 0, 1, 3)  # (B,H,W,C)
    y = conv_nhwc(xb, w, b, dilation, act)
    return y.transpose(1, 2, 0, 3).reshape(S, B, -1)


def _time_fn(fn, *args, iters: int = 2000) -> float:
    """Per-application time via the SLOPE between two scan lengths (µs).

    Two tunnel quirks make naive timing lie: `block_until_ready` returns
    before device work completes (sync by fetching a scalar reduction
    instead), and every run call pays a ~35 ms host↔device round trip
    that buries µs-scale kernels (measured: every 200-iteration case
    cost ~32-37 ms regardless of FLOPs). Timing scans of `iters` and
    4·`iters` applications and differencing cancels the fixed cost."""
    import time

    def make(n):
        @jax.jit
        def run(x0, rest):
            def body(x, _):
                return fn(x, *rest), None

            y, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(y.astype(jnp.float32))

        return run

    x0, rest = args[0], args[1:]
    run1, run4 = make(iters), make(4 * iters)
    float(jax.device_get(run1(x0, rest)))  # compile + warm
    float(jax.device_get(run4(x0, rest)))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(run1(x0, rest)))
        t1 = time.perf_counter()
        float(jax.device_get(run4(x0, rest)))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (3 * iters) * 1e6)
    return float(np.median(slopes))


def main():
    import argparse

    p = argparse.ArgumentParser(description="Pallas conv shape probe")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--iters", type=int, default=2000)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/sbc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B = args.batch
    key = jax.random.key(0)

    cases = [
        ("64x16 c32  d1", 64, 16, 32, 32, 1),
        ("32x8  c64  d1", 32, 8, 64, 64, 1),
        ("8x2   c128 d1", 8, 2, 128, 128, 1),
        ("8x2   c128 d4", 8, 2, 128, 128, 4),
        ("8x2   c64  d1", 8, 2, 64, 64, 1),
    ]
    print(f"# batch {B}, {args.dtype}; per-conv µs (XLA vs Pallas)")
    print(f"{'case':16s} {'XLA':>8s} {'per-tap':>9s} {'im2col':>9s} "
          f"{'true GFLOP':>11s}")
    for name, H, W, Cin, Cout, d in cases:
        S = H * W
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, S * Cin), 3)
        x = jax.random.normal(k1, (S, B, Cin), dt)
        x_nhwc = jax.random.normal(k1, (B, H, W, Cin), dt)
        w = (jax.random.normal(k2, (3, 3, Cin, Cout), jnp.float32)
             / np.sqrt(9 * Cin)).astype(dt)
        b = jnp.zeros((Cout,), jnp.float32)
        gflop = 2 * S * B * len(live_taps(3, d, H, W)) * Cin * Cout / 1e9

        def timed(fn, x0):
            try:
                return _time_fn(fn, x0, w, b, iters=args.iters)
            except Exception as e:  # a lowering failure is data too
                print(f"#   {name}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
                return float("nan")

        # XLA baseline on its NATIVE layout (no per-iter transposes)
        t_x = timed(lambda x, w, b: conv_nhwc(x, w, b, d), x_nhwc)
        t_p = timed(lambda x, w, b: conv_pertap(x, w, b, H, W, d), x)
        t_i = timed(lambda x, w, b: conv_im2col(x, w, b, H, W, d), x)
        print(f"{name:16s} {t_x:8.2f} {t_p:9.2f} {t_i:9.2f} {gflop:11.3f}"
              f"   ({gflop*1e3/t_x:.0f} / {gflop*1e3/t_p:.0f} / "
              f"{gflop*1e3/t_i:.0f} TF/s)", flush=True)

    # fused chain probe: n=8 convs, 128ch @8x2 — VMEM persistence
    for n in (4, 8):
        H, W, C, d = 8, 2, 128, 1
        S = H * W
        x = jax.random.normal(key, (S, B, C), dt)
        x_nhwc = jax.random.normal(key, (B, H, W, C), dt)
        ws = (jax.random.normal(key, (n, 3, 3, C, C), jnp.float32)
              / np.sqrt(9 * C)).astype(dt)
        bs = jnp.zeros((n, C), jnp.float32)

        def xla_chain(x, ws, bs):
            for i in range(n):
                x = conv_nhwc(x, ws[i], bs[i], d, act=True)
            return x

        def timed(fn, x0):
            try:
                return _time_fn(fn, x0, ws, bs, iters=args.iters)
            except Exception as e:
                print(f"#   chain n={n}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
                return float("nan")

        t_x = timed(xla_chain, x_nhwc)
        t_c = timed(lambda x, ws, bs: conv_chain(x, ws, bs, H, W, d), x)
        gflop = n * 2 * S * B * 9 * C * C / 1e9
        print(f"chain n={n} c128   {t_x:8.2f} {t_c:9.2f} {'':9s} "
              f"{gflop:11.3f}   ({gflop*1e3/t_x:.0f} / "
              f"{gflop*1e3/t_c:.0f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
