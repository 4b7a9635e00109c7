"""Learned-DAMP unrolled estimator (reference aux_models.py:62-190).

AMP iteration with learned denoisers, in c2 NHWC:
  r  = h + Pᴴ z / λ_max                    (aux_models.py:137)
  h  = D_k(r)                              (FlippedNormUnet, :142-144)
  div= (1/ε)·E[ dᵀ(D_k(r + ε·d) − D_k(r)) ]   (MC divergence, :146-171;
       no-grad in the reference → stop_gradient here)
  z  = y − P·h + z·div                     (Onsager correction, :174)

One model per training SNR, 10 unshared denoisers
(train_ldamp.py:36,44-47).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import cplx
from .unet import NormUnet

Array = jax.Array


class LDAMP(nn.Module):
    max_unrolls: int = 10
    shared_nets: bool = False
    chans: int = 16
    num_pools: int = 3
    safety_min: float = 1e-5  # aux_models.py:109

    @nn.compact
    def __call__(
        self,
        Y_herm: Array,  # (B, Np, Nr, 2) c2
        P_herm: Array,  # (B, Np, Nt, 2) c2
        eig1: Array,  # (B,) λ_max(P·Pᴴ)
        key: Array,
        num_unrolls: Optional[int] = None,
        deterministic: bool = True,
    ) -> Array:
        """Returns the channel estimate h (B, Nt, Nr, 2) in c2."""
        n_unroll = num_unrolls or self.max_unrolls
        n_nets = 1 if self.shared_nets else self.max_unrolls
        nets = [NormUnet(chans=self.chans, num_pools=self.num_pools,
                         residual=True, name=f"denoiser_{i}")
                for i in range(n_nets)]

        B = Y_herm.shape[0]
        Nt = P_herm.shape[-2]
        Nr = Y_herm.shape[-2]
        h = jnp.zeros((B, Nt, Nr, 2), jnp.float32)  # aux_models.py:118
        z = Y_herm
        Ph = cplx.conj_transpose(P_herm)
        inv_eig = (1.0 / eig1)[:, None, None]

        for k in range(n_unroll):
            net = nets[0 if self.shared_nets else k]
            r = h + cplx.scale(cplx.matmul(Ph, z), inv_eig)
            h = net(r, deterministic)

            # Monte-Carlo divergence (no gradient flows through it)
            key, k_dir = jax.random.split(key)
            r_sg = jax.lax.stop_gradient(r)
            h_sg = jax.lax.stop_gradient(h)
            d = jax.random.normal(k_dir, r.shape, jnp.float32)
            eps = jnp.maximum(
                jnp.max(jnp.sqrt(cplx.abs2(r_sg)), axis=(-1, -2)) * 1e-3,
                self.safety_min)  # (B,)
            r_pert = r_sg + eps[:, None, None, None] * d
            h_pert = jax.lax.stop_gradient(net(r_pert, deterministic))
            div = (1.0 / eps) * jnp.mean(d * (h_pert - h_sg), axis=(1, 2, 3))

            z = Y_herm - cplx.matmul(P_herm, h) + z * div[:, None, None, None]
        return h
