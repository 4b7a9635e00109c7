"""DCGAN critic + generator for the WGAN baseline (reference aux_gan.py).

  DCGAN_D      — aux_gan.py:9-56: strided-conv pyramid 4×4/s2 down to
                 (4, 16), then a (4,16) valid conv to a scalar; the critic
                 output is the BATCH MEAN (aux_gan.py:56).
  DCGAN_G_Ours — aux_gan.py:58-112: dense z→(Nr/4, Nt/4, ngf) then
                 2×[nearest-2× upsample → conv5×5 → BN → ReLU] plus
                 n_extra_layers of [conv3×3(no bias) → BN → ReLU], output
                 conv5×5 → 2 channels.

NHWC; the image is the NON-Hermitian channel layout (Nr=16, Nt=64) — the
WGAN pipeline trains on the 'H' view (train_wgan.py:150).
Weight init follows train_wgan.py:78-84 (conv N(0, 0.02²),
BN scale N(1, 0.02²), BN bias 0).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _conv_init(key, shape, dtype=jnp.float32):
    return 0.02 * jax.random.normal(key, shape, dtype)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def _bn(train: bool, name: str) -> nn.BatchNorm:
    # torch BatchNorm2d: momentum 0.1 (flax convention: 0.9), eps 1e-5
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, scale_init=_bn_scale_init, name=name)


class DCGAN_D(nn.Module):
    """WGAN critic; returns the batch-mean scalar (aux_gan.py:56)."""

    isize: Tuple[int, int] = (16, 64)
    ndf: int = 64
    n_extra_layers: int = 0

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        assert min(self.isize) % 16 == 0, "isize has to be a multiple of 16"
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_conv_init,
                    name="initial_conv")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        csize, cndf = min(self.isize) // 2, self.ndf

        for t in range(self.n_extra_layers):
            h = nn.Conv(cndf, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=_conv_init, name=f"extra_conv_{t}")(h)
            h = _bn(train, f"extra_bn_{t}")(h)
            h = jax.nn.leaky_relu(h, 0.2)

        p = 0
        while csize > 4:
            cndf *= 2
            h = nn.Conv(cndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=_conv_init,
                        name=f"pyramid_conv_{p}")(h)
            h = _bn(train, f"pyramid_bn_{p}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
            csize //= 2
            p += 1

        # final valid conv over the remaining (4, 4·aspect) map → scalar
        kh, kw = h.shape[1], h.shape[2]
        h = nn.Conv(1, (kh, kw), padding="VALID", use_bias=False,
                    kernel_init=_conv_init, name="final_conv")(h)
        return jnp.mean(h)  # batch-mean critic value


class DCGAN_G(nn.Module):
    """Generator z (B, nz) → channels (B, Nr, Nt, 2) (aux_gan.py:58-112)."""

    isize: Tuple[int, int] = (16, 64)
    nz: int = 60
    nc: int = 2
    ngf: int = 128
    n_extra_layers: int = 0

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        nr, nt = self.isize
        z = z.reshape(z.shape[0], -1)  # (B, nz)
        hidden = nn.Dense(self.ngf * nr * nt // 16,
                          kernel_init=nn.initializers.normal(0.02),
                          name="dense_input")(z)
        h = hidden.reshape(-1, nr // 4, nt // 4, self.ngf)

        for i in range(2):  # two upsample blocks
            b, hh, ww, c = h.shape
            h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                 (b, hh, 2, ww, 2, c)).reshape(
                                     b, 2 * hh, 2 * ww, c)
            h = nn.Conv(self.ngf, (5, 5), padding=((2, 2), (2, 2)),
                        kernel_init=_conv_init, name=f"conv_{i + 1}")(h)
            h = _bn(train, f"bn_{i + 1}")(h)
            h = jax.nn.relu(h)

        for t in range(self.n_extra_layers):
            h = nn.Conv(self.ngf, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=_conv_init,
                        name=f"extra_conv_{t}")(h)
            h = _bn(train, f"extra_bn_{t}")(h)
            h = jax.nn.relu(h)

        return nn.Conv(self.nc, (5, 5), padding=((2, 2), (2, 2)),
                       kernel_init=_conv_init, name="conv_out")(h)
