"""RefineNet-style building blocks in flax (NHWC, TPU layout).

Re-designed from the behavior of reference ncsnv2/models/layers.py and
ncsnv2/models/normalization.py (file:line cites inline below). Numerics are
bit-careful ports of the PyTorch semantics so that reference checkpoints
translate exactly (see models/torch_compat.py):

  - convs use torch's default kaiming-uniform(±1/√fan_in) init,
  - InstanceNorm2dPlus matches normalization.py:150-176 (biased instance
    variance, *unbiased* variance of the per-channel means, eps=1e-5),
  - MSF bilinear resize matches `F.interpolate(align_corners=True)`
    (layers.py:182) implemented as two small constant interpolation
    matrices contracted on the MXU instead of a gather,
  - ConvMeanPool matches the 4-phase average of layers.py:309-313
    (requires even spatial dims, as the reference does de-facto).

Module/parameter names deliberately mirror the reference state-dict key
structure (`res1.0.conv1.weight` ↔ params['res1_0']['conv1']['kernel'],
RCU's `{i}_{j}_conv` naming from layers.py:118) so checkpoints round-trip.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_act(nonlinearity: str) -> Callable[[Array], Array]:
    """Activation factory (reference layers.py:11-23)."""
    name = nonlinearity.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return lambda x: x * jax.nn.sigmoid(x)
    raise NotImplementedError("activation function does not exist!")


class Conv2d(nn.Module):
    """2-D conv, NHWC, torch-parity padding (k//2 · dilation) and init.

    Torch's nn.Conv2d default init is kaiming_uniform(a=√5) which reduces to
    U(−1/√fan_in, 1/√fan_in) for both kernel and bias.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        in_features = x.shape[-1]
        fan_in = in_features * k * k
        bound = 1.0 / math.sqrt(fan_in)

        def _uniform(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        kernel = self.param("kernel", _uniform, (k, k, in_features, self.features))
        pad = self.dilation * (k // 2)
        kern = kernel.astype(x.dtype)
        pad_h = pad_w = (pad, pad)
        # Static dead-tap pruning: a dilated tap whose offset d·|di| reaches
        # past the whole spatial extent only ever multiplies padding zeros
        # (e.g. the reference's res4/res5 dilation-2/4 convs on the 8×2 deep
        # stages, where every ±dx column tap is dead — XLA still performs
        # those FLOPs if we don't slice them out). Exactly equal numerics:
        # the pruned taps contribute 0 by construction.
        # (odd k only: the symmetric pad-reconstruction below assumes a
        # center tap; an even k with dilation>1 would change the output
        # shape vs the unpruned path — unreachable with the all-3×3
        # architecture, gated for safety, ADVICE r4)
        if self.dilation > 1 and k > 1 and k % 2 == 1:
            H, W = x.shape[1], x.shape[2]
            c = k // 2
            keep_h = [i for i in range(k) if self.dilation * abs(i - c) < H]
            keep_w = [i for i in range(k) if self.dilation * abs(i - c) < W]
            if len(keep_h) < k or len(keep_w) < k:
                kern = kern[keep_h[0]:keep_h[-1] + 1,
                            keep_w[0]:keep_w[-1] + 1]
                pad_h = (self.dilation * (c - keep_h[0]),
                         self.dilation * (keep_h[-1] - c))
                pad_w = (self.dilation * (c - keep_w[0]),
                         self.dilation * (keep_w[-1] - c))
        y = jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(self.stride, self.stride),
            padding=(pad_h, pad_w),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _uniform, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (reference normalization.py:150-176).

    h   = IN(x)                       (per-sample/channel, biased var, eps 1e-5)
    m_c = mean_{H,W}(x)               (per-sample/channel means)
    m̂  = (m − mean_c m)/√(var_c m + 1e-5)   (var over channels, UNBIASED)
    out = γ·(h + m̂·α) + β
    α, γ ~ N(1, 0.02²); β = 0.
    """

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def _normal_init(key, shape):
            return 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float32)

        alpha = self.param("alpha", _normal_init, (self.features,))
        gamma = self.param("gamma", _normal_init, (self.features,))

        from ..kernels.instance_norm import (
            instance_norm_plus_pallas, kernels_enabled,
        )

        if self.bias and kernels_enabled():
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            return instance_norm_plus_pallas(x, alpha, gamma, beta)

        # Statistics and affine math in f32 regardless of the activation
        # dtype (bf16 traffic, f32 registers); output in the input dtype so
        # a bf16 activation path stays bf16 end-to-end (f32 path: no-ops).
        dt = x.dtype
        xs = x.astype(jnp.float32)
        alpha = alpha.astype(jnp.float32)
        gamma = gamma.astype(jnp.float32)

        means = jnp.mean(xs, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
        means_hat = (means - m) / jnp.sqrt(v + 1e-5)

        mu = jnp.mean(xs, axis=(1, 2), keepdims=True)
        var = jnp.var(xs, axis=(1, 2), keepdims=True)
        h = (xs - mu) / jnp.sqrt(var + 1e-5)

        h = h + means_hat[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            out = out + beta.astype(jnp.float32)
        return out.astype(dt)


class InstanceNorm2d(nn.Module):
    """Plain instance norm with affine params (normalization.py InstanceNorm
    branch; torch InstanceNorm2d(affine=True) semantics)."""

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = x.dtype
        xs = x.astype(jnp.float32)
        mu = jnp.mean(xs, axis=(1, 2), keepdims=True)
        var = jnp.var(xs, axis=(1, 2), keepdims=True)
        h = (xs - mu) / jnp.sqrt(var + 1e-5)
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        out = gamma.astype(jnp.float32) * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            out = out + beta.astype(jnp.float32)
        return out.astype(dt)


class VarianceNorm2d(nn.Module):
    """Variance-only norm (normalization.py:107-121): h = x/std, scaled."""

    features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def _normal_init(key, shape):
            return 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float32)

        dt = x.dtype
        xs = x.astype(jnp.float32)
        var = jnp.var(xs, axis=(1, 2), keepdims=True, ddof=1)  # torch.var
        h = xs / jnp.sqrt(var + 1e-5)
        alpha = self.param("alpha", _normal_init, (self.features,))
        out = alpha.astype(jnp.float32) * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            out = out + beta.astype(jnp.float32)
        return out.astype(dt)


class NoneNorm2d(nn.Module):
    """Identity (normalization.py:142-147)."""

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


def get_normalization(name: str) -> Callable[..., nn.Module]:
    """Norm factory for the unconditional path (normalization.py:8-33)."""
    if name == "InstanceNorm++":
        return InstanceNorm2dPlus
    if name == "InstanceNorm":
        return InstanceNorm2d
    if name == "VarianceNorm":
        return VarianceNorm2d
    if name == "None":
        return NoneNorm2d
    raise NotImplementedError(f"normalization {name!r} not implemented")


# -----------------------------------------------------------------------------
# pooling / resampling helpers
# -----------------------------------------------------------------------------


def max_pool_5x5(x: Array) -> Array:
    """MaxPool2d(kernel=5, stride=1, padding=2) (layers.py:70)."""
    return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


def avg_pool_5x5(x: Array) -> Array:
    """AvgPool2d(kernel=5, stride=1, padding=2), count_include_pad=True."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        ((0, 0), (2, 2), (2, 2), (0, 0)),
    )
    return summed / 25.0


def mean_pool_2x2(x: Array) -> Array:
    """4-phase 2× mean-downsample (layers.py:311-313); needs even H, W."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "mean_pool_2x2 requires even spatial dims"
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """1-D linear interpolation matrix with align_corners=True semantics."""
    A = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    if out_size == 1:
        A[0, 0] = 1.0
        return A
    src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0).astype(np.float32)
    for o in range(out_size):
        A[o, i0[o]] += 1.0 - w[o]
        A[o, i1[o]] += w[o]
    return A


def resize_bilinear_align_corners(x: Array, out_hw: Tuple[int, int]) -> Array:
    """`F.interpolate(x, size, mode='bilinear', align_corners=True)` on NHWC.

    Implemented as two constant interpolation-matrix contractions (MXU work,
    no gathers): y = A_h · x · A_wᵀ applied per (batch, channel).
    """
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    # Interp matrices in the activation dtype so a bf16 path stays bf16.
    # f32 path: HIGHEST precision keeps the exact torch-parity numerics;
    # bf16 path: default precision (HIGHEST would force multi-pass upcasts
    # on an interpolation matrix whose entries are exact in bf16 anyway).
    Ah = jnp.asarray(_interp_matrix(h, oh)).astype(x.dtype)
    Aw = jnp.asarray(_interp_matrix(w, ow)).astype(x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jnp.einsum("Hh,bhwc->bHwc", Ah, x, precision=prec)
    y = jnp.einsum("Ww,bhwc->bhWc", Aw, y, precision=prec)
    return y


class ConvMeanPool(nn.Module):
    """conv(stride 1) → 2×2 4-phase mean downsample (layers.py:291-313)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv2d(self.features, self.kernel_size, use_bias=self.use_bias,
                   name="conv")(x)
        return mean_pool_2x2(y)


class MeanPoolConv(nn.Module):
    """2×2 mean downsample → conv (layers.py:315-326)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Conv2d(self.features, self.kernel_size, use_bias=self.use_bias,
                      name="conv")(mean_pool_2x2(x))


class UpsampleConv(nn.Module):
    """2× nearest upsample (pixel-shuffle of 4 copies) → conv (layers.py:329-341)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        # cat 4 copies on channels + PixelShuffle(2) == nearest 2x upsample
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        y = y.reshape(b, 2 * h, 2 * w, c)
        return Conv2d(self.features, self.kernel_size, use_bias=self.use_bias,
                      name="conv")(y)


# -----------------------------------------------------------------------------
# RefineNet blocks
# -----------------------------------------------------------------------------


class CRPBlock(nn.Module):
    """Chained residual pooling (layers.py:62-83)."""

    features: int
    n_stages: int = 2
    act: Callable[[Array], Array] = jax.nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pool = max_pool_5x5 if self.maxpool else avg_pool_5x5
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = pool(path)
            path = Conv2d(self.features, 3, use_bias=False, name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (layers.py:112-134).

    Parameter names keep the reference's `{i}_{j}_conv` convention
    (layers.py:118) so checkpoint keys translate 1:1.
    """

    features: int
    n_blocks: int
    n_stages: int
    act: Callable[[Array], Array] = jax.nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = Conv2d(self.features, 3, use_bias=False,
                           name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: conv each input, resize, sum (layers.py:165-184)."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[Array], out_hw: Tuple[int, int]) -> Array:
        total = None
        for i, x in enumerate(xs):
            h = Conv2d(self.features, 3, use_bias=True, name=f"convs_{i}")(x)
            h = resize_bilinear_align_corners(h, out_hw)
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block: RCU adapters → MSF → CRP → output RCUs
    (layers.py:214-249)."""

    features: int
    act: Callable[[Array], Array] = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[Array], out_hw: Tuple[int, int]) -> Array:
        hs = []
        for i, x in enumerate(xs):
            h = RCUBlock(x.shape[-1], n_blocks=2, n_stages=2, act=self.act,
                         name=f"adapt_convs_{i}")(x)
            hs.append(h)
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, out_hw)
        else:
            h = hs[0]
        h = CRPBlock(self.features, n_stages=2, act=self.act,
                     maxpool=self.maxpool, name="crp")(h)
        h = RCUBlock(self.features, n_blocks=3 if self.end else 1, n_stages=2,
                     act=self.act, name="output_convs")(h)
        return h


class ResidualBlock(nn.Module):
    """Pre-norm residual block (layers.py:401-456).

    resample='down' without dilation downsamples 2× via ConvMeanPool; with
    dilation it keeps spatial dims and uses dilated convs throughout (the
    reference's res4/res5 behavior).
    """

    output_dim: int
    resample: str | None = None
    act: Callable[[Array], Array] = jax.nn.elu
    normalization: Callable[..., nn.Module] = InstanceNorm2dPlus
    dilation: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        input_dim = x.shape[-1]
        norm = self.normalization
        d = self.dilation

        h = norm(input_dim, name="normalize1")(x)
        h = self.act(h)

        if self.resample == "down":
            if d is not None:
                h = Conv2d(input_dim, 3, dilation=d, name="conv1")(h)
                h = norm(input_dim, name="normalize2")(h)
                h = self.act(h)
                h = Conv2d(self.output_dim, 3, dilation=d, name="conv2")(h)
            else:
                h = Conv2d(input_dim, 3, name="conv1")(h)
                h = norm(input_dim, name="normalize2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3, name="conv2")(h)
        elif self.resample is None:
            if d is not None:
                h = Conv2d(self.output_dim, 3, dilation=d, name="conv1")(h)
                h = norm(self.output_dim, name="normalize2")(h)
                h = self.act(h)
                h = Conv2d(self.output_dim, 3, dilation=d, name="conv2")(h)
            else:
                h = Conv2d(self.output_dim, 3, name="conv1")(h)
                h = norm(self.output_dim, name="normalize2")(h)
                h = self.act(h)
                h = Conv2d(self.output_dim, 3, name="conv2")(h)
        else:
            raise ValueError("invalid resample value")

        if self.output_dim == input_dim and self.resample is None:
            shortcut = x
        elif self.resample == "down" and d is None:
            shortcut = ConvMeanPool(self.output_dim, 1, name="shortcut")(x)
        elif d is not None:
            shortcut = Conv2d(self.output_dim, 3, dilation=d, name="shortcut")(x)
        else:
            shortcut = Conv2d(self.output_dim, 1, name="shortcut")(x)

        return shortcut + h
