"""fastMRI-style U-Nets in flax NHWC (reference aux_unet.py re-designed).

  Unet            — aux_unet.py:222-312: avg-pool down / transpose-conv up,
                    ConvBlock = 2×[conv3x3(no bias) → InstanceNorm →
                    LeakyReLU(0.2) → Dropout] (aux_unet.py:315-352)
  NormUnet        — aux_unet.py:9-113: 2-group normalization + pad to a
                    multiple of 16 around the U-Net
  FlippedNormUnet — aux_unet.py:115-219: same, but RESIDUAL — returns
                    x − f(x) (the denoiser form LDAMP uses; :219)

NHWC layout; the "complex" axis is the channel axis (c2 format), which is
exactly the reference's complex_to_chan_dim view (aux_unet.py:43-46).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv2d, mean_pool_2x2

Array = jax.Array


def _instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """InstanceNorm2d(affine=False), NHWC (torch default eps 1e-5)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class ConvBlock(nn.Module):
    """2×[conv3x3(no bias) → IN → LeakyReLU(0.2) → Dropout]."""

    out_chans: int
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        for i in range(2):
            x = Conv2d(self.out_chans, 3, use_bias=False, name=f"conv_{i}")(x)
            x = _instance_norm(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
            if self.drop_prob > 0:
                x = nn.Dropout(self.drop_prob, deterministic=deterministic)(x)
        return x


class TransposeConvBlock(nn.Module):
    """ConvTranspose(2×2, stride 2, no bias) → IN → LeakyReLU(0.2)."""

    out_chans: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_chans = x.shape[-1]
        fan_in = in_chans * 2 * 2
        bound = 1.0 / math.sqrt(fan_in)
        x = nn.ConvTranspose(
            self.out_chans, (2, 2), strides=(2, 2), use_bias=False,
            kernel_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -bound, bound),
            name="tconv")(x)
        x = _instance_norm(x)
        return jax.nn.leaky_relu(x, negative_slope=0.2)


class Unet(nn.Module):
    """U-Net (aux_unet.py:222-312), NHWC."""

    out_chans: int = 2
    chans: int = 16
    num_pool_layers: int = 3
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        stack = []
        ch = self.chans
        out = ConvBlock(ch, self.drop_prob, name="down_0")(x, deterministic)
        stack.append(out)
        out = mean_pool_2x2(out)
        for i in range(1, self.num_pool_layers):
            ch *= 2
            out = ConvBlock(ch, self.drop_prob, name=f"down_{i}")(
                out, deterministic)
            stack.append(out)
            out = mean_pool_2x2(out)

        out = ConvBlock(ch * 2, self.drop_prob, name="bottleneck")(
            out, deterministic)

        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = TransposeConvBlock(ch, name=f"up_t_{i}")(out)
            # reflect-pad right/bottom on odd-size mismatch (aux_unet.py:300-307)
            pad_h = skip.shape[1] - out.shape[1]
            pad_w = skip.shape[2] - out.shape[2]
            if pad_h or pad_w:
                out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                              mode="reflect")
            out = jnp.concatenate([out, skip], axis=-1)
            out = ConvBlock(ch, self.drop_prob, name=f"up_c_{i}")(
                out, deterministic)
            if i < self.num_pool_layers - 1:
                ch //= 2
        out = Conv2d(self.out_chans, 1, name="final_conv")(out)
        return out


def _group_norm_2(x: Array) -> Tuple[Array, Array, Array]:
    """The NormUnet 2-group statistic (aux_unet.py:54-64), NHWC.

    Groups are the complex components: channels [0::2]=Re-derived? — the
    reference reshapes (b, c, h, w) as (b, 2, c/2·h·w), i.e. the FIRST half
    of channels is group 0. In NHWC c2 our channels are already (Re, Im).
    std is torch.std (unbiased).
    """
    b, h, w, c = x.shape
    # channels-last: group by channel index < c/2 vs >= c/2 after moving
    # channels first (torch layout). For c == 2 this is just (Re, Im).
    xt = jnp.moveaxis(x, -1, 1).reshape(b, 2, (c // 2) * h * w)
    mean = jnp.mean(xt, axis=2)  # (b, 2)
    var = jnp.var(xt, axis=2, ddof=1)
    std = jnp.sqrt(var)
    mean_c = jnp.repeat(mean, c // 2, axis=1)  # (b, c) torch view(b,c,1,1)
    std_c = jnp.repeat(std, c // 2, axis=1)
    mean_b = mean_c[:, None, None, :]
    std_b = std_c[:, None, None, :]
    return (x - mean_b) / std_b, mean_b, std_b


def _pad16(x: Array) -> Tuple[Array, Tuple[int, int, int, int]]:
    """Pad H, W to multiples of 16 (aux_unet.py:71-85)."""
    _, h, w, _ = x.shape
    hm = ((h - 1) | 15) + 1
    wm = ((w - 1) | 15) + 1
    hp = (math.floor((hm - h) / 2), math.ceil((hm - h) / 2))
    wp = (math.floor((wm - w) / 2), math.ceil((wm - w) / 2))
    x = jnp.pad(x, ((0, 0), hp, wp, (0, 0)))
    return x, (hp[0], hm - hp[1], wp[0], wm - wp[1])


class NormUnet(nn.Module):
    """Normalize → pad → U-Net → unpad → unnormalize (aux_unet.py:97-113)."""

    chans: int = 16
    num_pools: int = 3
    out_chans: int = 2
    drop_prob: float = 0.0
    residual: bool = False  # True = FlippedNormUnet (aux_unet.py:219)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        n, mean, std = _group_norm_2(x)
        n, (h0, h1, w0, w1) = _pad16(n)
        n = Unet(self.out_chans, self.chans, self.num_pools,
                 self.drop_prob, name="unet")(n, deterministic)
        n = n[:, h0:h1, w0:w1, :]
        n = n * std + mean
        return x - n if self.residual else n


def FlippedNormUnet(chans: int = 16, num_pools: int = 3, **kw) -> NormUnet:
    """Residual denoiser variant (aux_unet.py:115-219)."""
    return NormUnet(chans=chans, num_pools=num_pools, residual=True, **kw)
