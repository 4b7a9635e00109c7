"""Plain CNN denoisers (reference aux_models.py:10-59, basicmodels.py).

  DnCNN — aux_models.py:24-59: head conv+ReLU, (nb−2)×[conv+BN+ReLU],
          tail conv; RESIDUAL output x − n. Alternative LDAMP backbone
          (train_ldamp.py backbone='DnCNN').
  SRCNN — aux_models.py:10-22 (unused by the reference pipeline; kept for
          API completeness).

The reference builds DnCNN from the BasicSR-style mode-string conv factory
(basicmodels.py:63-100); the rest of basicmodels.py (IMDB/ESA/RCAB/RRDB
blocks etc.) is dead code there (SURVEY.md C18) and is deliberately not
reproduced.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv2d

Array = jax.Array


class DnCNN(nn.Module):
    out_chans: int = 2
    hidden: int = 64
    num_layers: int = 17  # nb total conv layers
    kernel_size: int = 3
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = Conv2d(self.hidden, self.kernel_size, name="head")(x)
        h = jax.nn.relu(h)
        for i in range(self.num_layers - 2):
            h = Conv2d(self.hidden, self.kernel_size, use_bias=not
                       self.batch_norm, name=f"body_{i}")(h)
            if self.batch_norm:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-4, name=f"bn_{i}")(h)
            h = jax.nn.relu(h)
        n = Conv2d(self.out_chans, self.kernel_size, name="tail")(h)
        return x - n  # residual (aux_models.py:57-59)


class SRCNN(nn.Module):
    out_chans: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = jax.nn.relu(Conv2d(64, 9, name="conv1")(x))
        h = jax.nn.relu(Conv2d(32, 5, name="conv2")(h))
        return Conv2d(self.out_chans, 5, name="conv3")(h)
