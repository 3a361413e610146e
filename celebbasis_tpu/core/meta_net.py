"""MetaIdNet: face image -> basis coefficients -> identity text embedding.

Functional redesign of `/root/reference/ldm/modules/id_embedding/meta_net.py`:

* frozen IResNet-100 id features (no-grad in the reference; here
  ``lax.stop_gradient`` — the only trainable part is the MLP);
* StyleVectorizer MLP (StyleGAN mapping-network style): depth-1 default is a
  single EqualLinear (weight scaled by ``lr_mul`` at *use* time) + LeakyReLU
  0.2; deeper layers are pre-LayerNorm residual EqualLinears
  (meta_net.py:27-76);
* reshape to (N, es, heads, inner), L2-normalize over the coefficient axis
  ("super sphere space", meta_net.py:168), then project on the celeb basis:
  ``z = einsum(coeff, P) + mean`` (meta_net.py:275-289);
* multi-face batching: the reference chunks a (N,H,W,(k)C) stacked tensor;
  here faces arrive as (N, k, H, W, C) and fold into the batch axis — one big
  MXU-friendly forward instead of k small ones.

The face is first mapped from the FFHQ crop to the ArcFace crop by the fused
warp+resize gather (``celebbasis_tpu.ops.warp``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.models.iresnet import IResNet, IResNetConfig
from celebbasis_tpu.ops.basic import l2_normalize
from celebbasis_tpu.ops.warp import (INSIGHTFACE_TRANS_MATRIX,
                                     batched_affine_warp_resize)


@dataclass(frozen=True)
class MetaNetConfig:
    fr_dim: int = 512            # face-recognition feature dim
    inner_dim: int = 512         # basis coefficient count (n_components)
    num_es: int = 2              # num_embeds_per_token
    heads: int = 1
    mlp_depth: int = 1
    lr_mul: float = 1.0          # reference passes lr_mul=1.0 (meta_net.py:145)
    token_dim: int = 768
    use_rm_mlp: bool = False     # ablation: direct per-id coefficient table
    num_ids: int = 10
    face_size: int = 112
    iresnet: IResNetConfig = IResNetConfig.r100()

    @staticmethod
    def tiny() -> "MetaNetConfig":
        return MetaNetConfig(fr_dim=64, inner_dim=16, token_dim=32,
                             face_size=32, iresnet=IResNetConfig.tiny())


class EqualLinear(nn.Module):
    """y = leaky_relu_0.2(x @ (W*lr_mul)^T + b*lr_mul); W ~ N(0,1) init
    (meta_net.py:27-48). Optional pre-LayerNorm."""
    out_dim: int
    lr_mul: float = 1.0
    pre_norm: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.out_dim, in_dim), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                       jnp.float32)
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = x @ (w * self.lr_mul).T + b * self.lr_mul
        return nn.leaky_relu(y, negative_slope=0.2)


class StyleVectorizer(nn.Module):
    """depth-1: EqualLinear(in->out); depth>1 adds residual pre-norm layers
    (meta_net.py:61-76)."""
    out_dim: int
    depth: int = 1
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = EqualLinear(self.out_dim, self.lr_mul, name="layer_0")(x)
        for i in range(1, self.depth):
            x = x + EqualLinear(self.out_dim, self.lr_mul, pre_norm=True,
                                name=f"layer_{i}")(x)
        return x


class MetaIdNet(nn.Module):
    """Returns (z, coeff): z (N, es*heads, token_dim) identity embeddings,
    coeff (N, es, heads, inner_dim) normalized basis coefficients."""
    cfg: MetaNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.fr_net = IResNet(cfg.iresnet, self.dtype, name="fr_net")
        self.mlp = StyleVectorizer(cfg.inner_dim * cfg.num_es * cfg.heads,
                                   cfg.mlp_depth, cfg.lr_mul, name="mlp")
        if cfg.use_rm_mlp:
            self.coef_table = self.param(
                "coef_table", nn.initializers.normal(1.0),
                (cfg.num_ids, cfg.num_es, cfg.heads, cfg.inner_dim),
                jnp.float32)

    def face_features(self, faces: jax.Array) -> jax.Array:
        """(N, H, W, 3) FFHQ-cropped faces in [-1,1] -> (N, fr_dim) unit vecs.

        Frozen: gradients are stopped (reference no_grad, meta_net.py:253-264).
        """
        s = self.cfg.face_size
        warped = batched_affine_warp_resize(faces, INSIGHTFACE_TRANS_MATRIX,
                                            (s, s))
        feats = self.fr_net(warped)
        feats = l2_normalize(feats, axis=-1)
        return jax.lax.stop_gradient(feats)

    def coefficients(self, faces: jax.Array, id_idx: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.use_rm_mlp:
            return self.coef_table[id_idx]
        v = self.face_features(faces)
        return self.coefficients_from_features(v)

    def coefficients_from_features(self, v: jax.Array) -> jax.Array:
        """(N, fr_dim) frozen id features -> normalized coefficients.

        Split out so the frozen FR forward can be cached across steps
        (fast-personalization mode) — only the MLP is trainable anyway.
        """
        cfg = self.cfg
        x = self.mlp(v)  # (N, es*heads*inner)
        x = x.reshape(-1, cfg.num_es, cfg.heads, cfg.inner_dim)
        return l2_normalize(x, axis=-1)

    def z_from_features(self, v: jax.Array, celeb_basis: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
        """Cached-feature equivalent of __call__: (N, fr_dim) -> (z, coeff)."""
        cfg = self.cfg
        coeff = self.coefficients_from_features(v)
        mean, pca = celeb_basis[:, 0], celeb_basis[:, 1:]
        z = jnp.einsum("behk,ekc->behc", coeff, pca.astype(coeff.dtype)) \
            + mean[None, :, None, :]
        z = z.reshape(z.shape[0], cfg.num_es * cfg.heads, cfg.token_dim)
        return z, coeff

    def __call__(self, faces: jax.Array, id_idx: jax.Array,
                 celeb_basis: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """celeb_basis: (es, 1+inner, token_dim). -> (z, coeff)."""
        cfg = self.cfg
        coeff = self.coefficients(faces, id_idx)
        mean, pca = celeb_basis[:, 0], celeb_basis[:, 1:]
        z = jnp.einsum("behk,ekc->behc", coeff, pca.astype(coeff.dtype)) \
            + mean[None, :, None, :]
        z = z.reshape(z.shape[0], cfg.num_es * cfg.heads, cfg.token_dim)
        return z, coeff

    def multi_faces(self, faces_multi: jax.Array, ids_multi: jax.Array,
                    celeb_basis: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """faces_multi: (N, k, H, W, 3), ids: (N, k) ->
        z (N, k, es*h, token_dim), coeff (N, k, es, h, inner).

        The reference chunks channel-stacked faces and loops
        (meta_net.py:329-346); here the k axis folds into the batch for one
        fused forward.
        """
        N, k = faces_multi.shape[:2]
        flat = faces_multi.reshape((N * k,) + faces_multi.shape[2:])
        z, coeff = self(flat, ids_multi.reshape(-1), celeb_basis)
        return (z.reshape(N, k, *z.shape[1:]),
                coeff.reshape(N, k, *coeff.shape[1:]))
