"""VQ autoencoder (legacy-LDM first stage) in Flax — NHWC, bf16 compute.

Parity targets:
* ``VQModel`` / ``VQModelInterface``
  (`/root/reference/ldm/models/autoencoder.py:14-283`) — encoder/decoder are
  the same generalized ldm backbone as the KL VAE (``models/vae.py``), plus a
  codebook quantizer between ``quant_conv`` and ``post_quant_conv``.
* The quantizer matches taming's ``VectorQuantizer2`` in its reference-used
  configuration (beta=0.25, no remap, legacy loss order) — straight-through
  estimator, codebook init U(-1/n, 1/n).  taming itself is not vendored in
  the reference; the import at autoencoder.py:6 is its only appearance.

``VQModelInterface`` is how every ``*-ldm-vq-*`` latent-diffusion config
consumes the first stage: ``encode`` stops *before* quantization (the
diffusion operates on continuous pre-quant latents) and ``decode`` quantizes
on the way back unless ``force_not_quantize`` (ddpm.py decode_first_stage).

TPU notes: the nearest-codebook search is one (BHW, C)x(C, n_embed) matmul
(MXU) + argmin; the codebook gather is a ``take`` along the embedding table.
No Python loops; static shapes throughout.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.models.vae import Decoder, Encoder, VAEConfig


class VectorQuantizer(nn.Module):
    """Nearest-neighbour codebook quantization with straight-through grads.

    loss = mean((sg(z_q) - z)^2) + beta * mean((z_q - sg(z))^2)   (legacy
    order, taming VectorQuantizer2 with legacy=True — the reference default:
    the *codebook* term carries beta, the encoder-commitment term is
    unweighted; the non-legacy flavor swaps them).  Pinned by the VQ-GAN
    trajectory oracle in tests/test_ae_train_oracle.py.
    """
    n_embed: int
    embed_dim: int
    beta: float = 0.25

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.n_embed,
                1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))

    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """z: (B, H, W, C) -> (z_q, loss, indices (B, H, W))."""
        emb = self.embedding
        z = z.astype(jnp.float32)
        flat = z.reshape(-1, self.embed_dim)
        # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 ; one MXU matmul + argmin
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             - 2.0 * flat @ emb.T
             + jnp.sum(emb ** 2, axis=1)[None, :])
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape)
        loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
                + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2))
        z_q = z + jax.lax.stop_gradient(z_q - z)   # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])

    def embed_code(self, idx: jax.Array) -> jax.Array:
        """Codebook lookup: (...,) int indices -> (..., embed_dim)."""
        return jnp.take(self.embedding, idx, axis=0)


class VQModel(nn.Module):
    """encode -> (z_q, emb_loss, indices); decode(z_q) -> image.

    Matches the reference VQModel graph (autoencoder.py:96-120): encoder ->
    quant_conv -> quantize -> [post_quant_conv -> decoder].
    """
    cfg: VAEConfig
    n_embed: int
    dtype: jnp.dtype = jnp.bfloat16
    beta: float = 0.25

    def setup(self):
        assert not self.cfg.double_z, "VQ first stages use double_z=False"
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.cfg.embed_dim,
                                        self.beta)
        self.quant_conv = nn.Conv(self.cfg.embed_dim, (1, 1),
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       param_dtype=jnp.float32)

    def encode_to_prequant(self, x: jax.Array) -> jax.Array:
        return self.quant_conv(self.encoder(x)).astype(jnp.float32)

    def encode(self, x: jax.Array):
        return self.quantize(self.encode_to_prequant(x))

    def decode(self, quant: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(quant.astype(self.dtype)))

    def decode_code(self, code: jax.Array) -> jax.Array:
        return self.decode(self.quantize.embed_code(code))

    def __call__(self, x: jax.Array):
        # via quantize explicitly (not self.encode) so VQModelInterface's
        # pre-quant encode override keeps init/__call__ working
        quant, emb_loss, idx = self.quantize(self.encode_to_prequant(x))
        return self.decode(quant), emb_loss, idx


class VQModelInterface(VQModel):
    """First-stage view used by LatentDiffusion (autoencoder.py:264-283):
    encode returns the continuous pre-quant latent; decode quantizes first
    unless force_not_quantize."""

    def encode(self, x: jax.Array) -> jax.Array:   # type: ignore[override]
        return self.encode_to_prequant(x)

    def decode(self, h: jax.Array,                 # type: ignore[override]
               force_not_quantize: bool = False) -> jax.Array:
        if not force_not_quantize:
            h, _, _ = self.quantize(h.astype(jnp.float32))
        return self.decoder(self.post_quant_conv(h.astype(self.dtype)))
