"""Conditional VAE baseline (the paper's CVAE comparison model).

Casale et al. 2018 compare GPPVAE against a CVAE conditioned on the view:
the encoder sees (image, view) and the latent is meant to capture object
identity; the decoder reconstructs from (z, view). Out-of-sample conditional
generation for a held-out (object d, view q*) averages the object's encoded
latents over its training views and decodes with the target view — no GP.

Conditioning: the view id enters the encoder as Q constant one-hot planes
concatenated to the image channels (conv-friendly), and the decoder as a
one-hot vector concatenated to z.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gppvae_tpu.models.vae import ConvDecoder, ConvEncoder


class CVAE(nn.Module):
    zdim: int
    image_shape: tuple[int, int, int]
    num_views: int
    enc_features: Sequence[int] = (32, 64, 128)
    dec_features: Sequence[int] = (128, 64, 32)
    dtype: jnp.dtype = jnp.float32
    upsample: str = "resize"

    def setup(self):
        self.encoder = ConvEncoder(self.zdim, self.enc_features, self.dtype)
        self.decoder = ConvDecoder(self.image_shape, self.dec_features,
                                   self.dtype, self.upsample)

    def _cond_planes(self, y: jax.Array, q: jax.Array) -> jax.Array:
        onehot = jax.nn.one_hot(q, self.num_views, dtype=y.dtype)
        planes = jnp.broadcast_to(
            onehot[:, None, None, :], (*y.shape[:3], self.num_views)
        )
        return jnp.concatenate([y, planes], axis=-1)

    def encode(self, y: jax.Array, q: jax.Array):
        return self.encoder(self._cond_planes(y, q))

    def decode(self, z: jax.Array, q: jax.Array):
        onehot = jax.nn.one_hot(q, self.num_views, dtype=z.dtype)
        return self.decoder(jnp.concatenate([z, onehot], axis=-1))

    def __call__(self, y: jax.Array, q: jax.Array, rng: jax.Array):
        from gppvae_tpu.models.vae import reparameterize

        mu, logvar = self.encode(y, q)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z, q), mu, logvar, z
