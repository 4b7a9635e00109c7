"""NCSNv2-Deepest forward as a pure function of the params pytree.

The flax module (models/ncsnv2.py) stays the source of truth; this module
re-expresses the SAME forward directly on the parameter pytree so the
8×2-resolution deep segment (res31_1 → res4 → res5 → refine1 → refine2 →
refine31 → refine3's pre-resize path) is a swappable closure
(`segment=` argument, default `deep_segment_jnp`, plain jax ops).

A VMEM-resident Pallas implementation of the segment was prototyped and
MEASURED in round 4 (kernels/conv_probe.py `fused chain` case: 99.5% of
bf16 peak vs XLA's 93–94% on the same shapes, ≈ +1% end-to-end because
the segment is only ~11% of conv time) and deliberately NOT productized —
the measurement and the decision are recorded in BENCH.md ("the Pallas
question, settled"). The swappable-segment scaffold stays because it is
how that A/B was run and how a future kernel would plug in.

tests/test_kernels.py asserts fused_forward(segment=deep_segment_jnp)
equals model.apply on the full production architecture
(test_kernels.py:115-129).

Reference semantics being reproduced: ncsnv2.py:198-300 (block wiring),
layers.py:401-456 (ResidualBlock), :214-249 (RefineBlock), :62-134
(CRP/RCU), :165-184 (MSF), normalization.py:150-176 (InstanceNorm++).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import (
    max_pool_5x5,
    mean_pool_2x2,
    resize_bilinear_align_corners,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# plain-jax building blocks on param subtrees (NHWC)
# ---------------------------------------------------------------------------


def conv2d_p(p: Dict, x: Array, dilation: int = 1) -> Array:
    """Conv2d from a {'kernel', ['bias']} subtree — same dead-tap pruning
    as models/layers.py Conv2d."""
    kern = p["kernel"].astype(x.dtype)
    k = kern.shape[0]
    pad = dilation * (k // 2)
    pad_h = pad_w = (pad, pad)
    if dilation > 1 and k > 1:
        H, W = x.shape[1], x.shape[2]
        c = k // 2
        keep_h = [i for i in range(k) if dilation * abs(i - c) < H]
        keep_w = [i for i in range(k) if dilation * abs(i - c) < W]
        if len(keep_h) < k or len(keep_w) < k:
            kern = kern[keep_h[0]:keep_h[-1] + 1, keep_w[0]:keep_w[-1] + 1]
            pad_h = (dilation * (c - keep_h[0]),
                     dilation * (keep_h[-1] - c))
            pad_w = (dilation * (c - keep_w[0]),
                     dilation * (keep_w[-1] - c))
    y = jax.lax.conv_general_dilated(
        x, kern, (1, 1), (pad_h, pad_w),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def instance_norm_pp_p(p: Dict, x: Array) -> Array:
    """InstanceNorm++ from {'alpha','gamma','beta'} (layers.py:88-139)."""
    dt = x.dtype
    xs = x.astype(jnp.float32)
    alpha = p["alpha"].astype(jnp.float32)
    gamma = p["gamma"].astype(jnp.float32)
    means = jnp.mean(xs, axis=(1, 2))
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
    means_hat = (means - m) / jnp.sqrt(v + 1e-5)
    mu = jnp.mean(xs, axis=(1, 2), keepdims=True)
    var = jnp.var(xs, axis=(1, 2), keepdims=True)
    h = (xs - mu) / jnp.sqrt(var + 1e-5)
    h = h + means_hat[:, None, None, :] * alpha
    out = gamma * h + p["beta"].astype(jnp.float32)
    return out.astype(dt)


def residual_block_p(p: Dict, x: Array, act, resample=None,
                     dilation=None) -> Array:
    """ResidualBlock from its param subtree (layers.py:415-472)."""
    input_dim = x.shape[-1]
    h = instance_norm_pp_p(p["normalize1"], x)
    h = act(h)
    if resample == "down":
        if dilation is not None:
            h = conv2d_p(p["conv1"], h, dilation)
            h = instance_norm_pp_p(p["normalize2"], h)
            h = act(h)
            h = conv2d_p(p["conv2"], h, dilation)
            shortcut = conv2d_p(p["shortcut"], x, dilation)
        else:
            h = conv2d_p(p["conv1"], h)
            h = instance_norm_pp_p(p["normalize2"], h)
            h = act(h)
            h = mean_pool_2x2(conv2d_p(p["conv2"]["conv"], h))
            shortcut = mean_pool_2x2(conv2d_p(p["shortcut"]["conv"], x))
    else:
        if dilation is not None:
            h = conv2d_p(p["conv1"], h, dilation)
            h = instance_norm_pp_p(p["normalize2"], h)
            h = act(h)
            h = conv2d_p(p["conv2"], h, dilation)
        else:
            h = conv2d_p(p["conv1"], h)
            h = instance_norm_pp_p(p["normalize2"], h)
            h = act(h)
            h = conv2d_p(p["conv2"], h)
        out_dim = h.shape[-1]
        shortcut = x if out_dim == input_dim else conv2d_p(p["shortcut"], x)
    return shortcut + h


def rcu_p(p: Dict, x: Array, act, n_blocks: int, n_stages: int = 2) -> Array:
    for i in range(n_blocks):
        residual = x
        for j in range(n_stages):
            x = conv2d_p(p[f"{i + 1}_{j + 1}_conv"], act(x))
        x = x + residual
    return x


def crp_p(p: Dict, x: Array, act, n_stages: int = 2) -> Array:
    x = act(x)
    path = x
    for i in range(n_stages):
        path = conv2d_p(p[f"convs_{i}"], max_pool_5x5(path))
        x = path + x
    return x


def refine_block_p(p: Dict, xs, out_hw, act, start=False, end=False):
    hs = []
    for i, x in enumerate(xs):
        hs.append(rcu_p(p[f"adapt_convs_{i}"], x, act, n_blocks=2))
    if len(xs) > 1:
        total = None
        for i, h in enumerate(hs):
            h = conv2d_p(p["msf"][f"convs_{i}"], h)
            h = resize_bilinear_align_corners(h, out_hw)
            total = h if total is None else total + h
        h = total
    else:
        h = hs[0]
    h = crp_p(p["crp"], h, act)
    return rcu_p(p["output_convs"], h, act, n_blocks=3 if end else 1)


# ---------------------------------------------------------------------------
# the 8×2 deep segment — jnp reference implementation
# ---------------------------------------------------------------------------


def deep_segment_jnp(params: Dict, x: Array, act=jax.nn.elu) -> Array:
    """res31_1 → res4 → res5 → refine1 → refine2 → refine31 → refine3's
    pre-resize path; x (B, 8, 2, 64) → msf path-1 contribution
    (B, 8, 2, 64)."""
    layer31 = residual_block_p(params["res31_1"], x, act)
    layer4 = residual_block_p(params["res4_0"], layer31, act,
                              resample="down", dilation=2)
    layer4 = residual_block_p(params["res4_1"], layer4, act, dilation=2)
    layer5 = residual_block_p(params["res5_0"], layer4, act,
                              resample="down", dilation=4)
    layer5 = residual_block_p(params["res5_1"], layer5, act, dilation=4)
    hw = (x.shape[1], x.shape[2])
    ref1 = refine_block_p(params["refine1"], [layer5], hw, act, start=True)
    ref2 = refine_block_p(params["refine2"], [layer4, ref1], hw, act)
    ref31 = refine_block_p(params["refine31"], [layer31, ref2], hw, act)
    # refine3's path-1: adapt RCU + MSF conv at 8×2 (pre-resize)
    h = rcu_p(params["refine3"]["adapt_convs_1"], ref31, act, n_blocks=2)
    return conv2d_p(params["refine3"]["msf"]["convs_1"], h)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


def fused_forward(
    params: Dict,
    x: Array,
    used_sigmas: Array,
    segment: Optional[Callable[[Dict, Array], Array]] = None,
    act=jax.nn.elu,
) -> Array:
    """NCSNv2Deepest.__call__ (ncsnv2.py:269-300) on the params pytree.

    segment: implementation of the 8×2 deep segment (default
    deep_segment_jnp; the hook where a fused VMEM-resident kernel would
    plug in — measured-and-declined in round 4, see module docstring)."""
    segment = segment or deep_segment_jnp
    h = 2.0 * x - 1.0
    out = conv2d_p(params["begin_conv"], h)

    layer1 = residual_block_p(params["res1_0"], out, act)
    layer1 = residual_block_p(params["res1_1"], layer1, act)
    layer2 = residual_block_p(params["res2_0"], layer1, act, resample="down")
    layer2 = residual_block_p(params["res2_1"], layer2, act)
    layer3 = residual_block_p(params["res3_0"], layer2, act, resample="down")
    layer3 = residual_block_p(params["res3_1"], layer3, act)
    layer31_in = residual_block_p(params["res31_0"], layer3, act,
                                  resample="down")

    msf1 = segment(params, layer31_in)  # (B, 8, 2, 64)

    # refine3 at 16×4: path-0 adapt + msf conv; path-1 arrives pre-resize
    hw3 = (layer3.shape[1], layer3.shape[2])
    p3 = params["refine3"]
    h0 = rcu_p(p3["adapt_convs_0"], layer3, act, n_blocks=2)
    h0 = conv2d_p(p3["msf"]["convs_0"], h0)
    h1 = resize_bilinear_align_corners(msf1, hw3)
    h = crp_p(p3["crp"], h0 + h1, act)
    ref3 = rcu_p(p3["output_convs"], h, act, n_blocks=1)

    hw2 = (layer2.shape[1], layer2.shape[2])
    ref4 = refine_block_p(params["refine4"], [layer2, ref3], hw2, act)
    hw1 = (layer1.shape[1], layer1.shape[2])
    out = refine_block_p(params["refine5"], [layer1, ref4], hw1, act,
                         end=True)

    out = instance_norm_pp_p(params["normalizer"], out)
    out = conv2d_p(params["end_conv"], act(out))

    out = out.astype(jnp.float32)
    s = jnp.asarray(used_sigmas, jnp.float32)
    if s.ndim == 0:
        return out / s
    return out / s.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
