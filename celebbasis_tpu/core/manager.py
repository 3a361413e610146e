"""Identity embedding manager — functional state, jit-native.

TPU redesign of the reference EmbeddingManagerId
(`/root/reference/ldm/modules/embedding_manager.py:187-532`).  The reference
keeps two Python lists of tensors (``id_embeddings`` 10x(es,768),
``id_coefficients`` 10x(es,h,inner)) mutated in-place with a momentum rule
while looping over batch rows; checkpoints are those lists pickled.

Here the dictionaries are a **pytree of stacked arrays** carried through the
training step (SURVEY §7.1 "mutation -> functional state"):

* training forward returns the batch's *predicted* embeddings (gradients flow
  into the StyleVectorizer only, like the reference where
  ``_momentum_update`` returns the live prediction during training,
  embedding_manager.py:483-490) plus the *updated* dictionary state;
* the momentum update is a sequential ``lax.scan`` over batch rows so
  duplicate ids within a batch compound exactly as the reference's row loop;
* at test time the injected vectors come from the saved coefficients
  reconstructed against the basis (mode 'coefficient',
  embedding_manager.py:462-475), the saved raw embeddings
  (mode 'embedding'), or a live MetaIdNet forward (mode 'image');
* checkpoints are written/read in the reference's exact ``.pt`` schema
  ``{"id_coefficients": [max_ids x (es,h,inner)]}`` via the torch-free pt_io.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core.injection import inject_batch
from celebbasis_tpu.core.meta_net import MetaNetConfig


@dataclass(frozen=True)
class ManagerConfig:
    placeholder_token_ids: Tuple[int, ...]   # token ids of 'sks','ks',...
    max_ids: int = 10
    num_es: int = 2
    heads: int = 1
    inner_dim: int = 512
    token_dim: int = 768
    momentum: float = 0.99
    test_mode: str = "coefficient"           # coefficient | embedding | image
    loss_type: str = "none"                  # none|l1_reg|l2_reg|cosine|contra
    save_fp16: bool = False

    @property
    def reps(self) -> int:
        return self.num_es * self.heads


class ManagerState(NamedTuple):
    """The momentum dictionaries (embedding_manager.py:226-231) as arrays."""
    id_embeddings: jax.Array      # (max_ids, es*h, token_dim)
    id_coefficients: jax.Array    # (max_ids, es, h, inner_dim)


def init_state(cfg: ManagerConfig, rng: jax.Array,
               init_embedding: jax.Array | None = None) -> ManagerState:
    """init_embedding: the initializer word's token embedding (token_dim,) —
    the reference repeats the 'face' embedding (embedding_manager.py:242-253)."""
    if init_embedding is None:
        emb = jax.random.uniform(rng, (cfg.max_ids, cfg.reps, cfg.token_dim))
    else:
        emb = jnp.broadcast_to(init_embedding,
                               (cfg.max_ids, cfg.reps, cfg.token_dim))
    coeff = jax.random.normal(jax.random.fold_in(rng, 1),
                              (cfg.max_ids, cfg.num_es, cfg.heads,
                               cfg.inner_dim))
    return ManagerState(jnp.asarray(emb, jnp.float32),
                        jnp.asarray(coeff, jnp.float32))


def momentum_update(cfg: ManagerConfig, state: ManagerState,
                    pred_z: jax.Array, pred_coeff: jax.Array,
                    ids: jax.Array, valid: jax.Array) -> ManagerState:
    """Sequential momentum update over flattened (row, face) entries.

    pred_z: (K, es*h, D), pred_coeff: (K, es, h, inner), ids: (K,),
    valid: (K,) bool — entries beyond a row's num_ids are masked out.
    """
    m = cfg.momentum

    def body(st, inp):
        z, c, idx, ok = inp
        upd_e = m * st.id_embeddings[idx] + (1 - m) * z
        upd_c = m * st.id_coefficients[idx] + (1 - m) * c
        new_e = jnp.where(ok, upd_e, st.id_embeddings[idx])
        new_c = jnp.where(ok, upd_c, st.id_coefficients[idx])
        return ManagerState(st.id_embeddings.at[idx].set(new_e),
                            st.id_coefficients.at[idx].set(new_c)), None

    zs = jax.lax.stop_gradient(pred_z)
    cs = jax.lax.stop_gradient(pred_coeff)
    state, _ = jax.lax.scan(body, state, (zs, cs, ids, valid))
    return state


def train_inject(cfg: ManagerConfig, state: ManagerState,
                 tokens: jax.Array, embeds: jax.Array,
                 pred_z: jax.Array, pred_coeff: jax.Array,
                 ids: jax.Array, num_ids: jax.Array
                 ) -> Tuple[jax.Array, ManagerState]:
    """Training-path inject + dictionary update.

    tokens/embeds: (B, L)/(B, L, D); pred_z: (B, k, es*h, D) MetaIdNet output
    per face slot; ids: (B, k); num_ids: (B,) in {1..k}.
    Returns (new_embeds (B,L,D), new_state).
    """
    B, k = ids.shape
    # id vectors for placeholders p=0..P-1 come from face slot p.
    # Known deviation: for the (experimental) 3-person case the reference
    # wires the 3rd placeholder to meta[id_cnt//2] — the *second augmentation
    # of the main id* — with the 2nd person's coefficients
    # (embedding_manager.py:299-304,363-391); slot p here uses person p's own
    # prediction, which is the evident intent.
    id_vectors = pred_z.reshape(B, k * cfg.reps, -1)
    new_embeds = inject_batch(tokens, embeds, id_vectors,
                              jnp.asarray(cfg.placeholder_token_ids, jnp.int32),
                              num_ids, cfg.reps)
    slot_idx = jnp.arange(k)[None, :]
    valid = (slot_idx < num_ids[:, None]).reshape(-1)
    new_state = momentum_update(cfg, state,
                                pred_z.reshape(B * k, cfg.reps, -1),
                                pred_coeff.reshape(B * k, cfg.num_es,
                                                   cfg.heads, cfg.inner_dim),
                                ids.reshape(-1), valid)
    return new_embeds, new_state


def reconstruct_z(cfg: ManagerConfig, coefficients: jax.Array,
                  basis: jax.Array) -> jax.Array:
    """coeff (..., es, h, inner) x basis (es, 1+inner, D) -> (..., es*h, D)
    (embedding_manager.py:464-475)."""
    mean, pca = basis[:, 0], basis[:, 1:]
    z = jnp.einsum("...ehk,ekc->...ehc", coefficients, pca)
    z = z + mean[:, None, :]
    return z.reshape(z.shape[:-3] + (cfg.reps, z.shape[-1]))


def test_inject(cfg: ManagerConfig, state: ManagerState, basis: jax.Array,
                tokens: jax.Array, embeds: jax.Array, ids: jax.Array,
                num_ids: jax.Array, pred_z: jax.Array | None = None
                ) -> jax.Array:
    """Inference-path injection (embedding_manager.py:452-481).

    ids: (B, k) identity indices appearing in each prompt.
    mode 'coefficient': z = saved_coeff[id] · P + mean;
    mode 'embedding':   z = saved id_embeddings[id];
    mode 'image':       z = pred_z (live MetaIdNet output, caller-supplied).
    """
    B, k = ids.shape
    if cfg.test_mode == "coefficient":
        z = reconstruct_z(cfg, state.id_coefficients[ids.reshape(-1)], basis)
        z = z.reshape(B, k, cfg.reps, -1)
    elif cfg.test_mode == "embedding":
        z = state.id_embeddings[ids.reshape(-1)].reshape(B, k, cfg.reps, -1)
    elif cfg.test_mode == "image":
        assert pred_z is not None, "test_mode='image' needs live predictions"
        z = pred_z
    else:
        raise ValueError(f"unknown test_mode {cfg.test_mode!r}")
    id_vectors = z.reshape(B, k * cfg.reps, -1)
    return inject_batch(tokens, embeds, id_vectors,
                        jnp.asarray(cfg.placeholder_token_ids, jnp.int32),
                        num_ids, cfg.reps)


# -- auxiliary losses (embedding_manager.py:492-529) ------------------------

def coefficient_reg_loss(loss_type: str, coeff: jax.Array) -> jax.Array:
    """l1_reg / l2_reg, weight 1e-6, over the **es axis** of
    (N', es, h, inner) coefficients — ``torch.norm(cef, dim=1, p=·).mean()``
    semantics (embedding_manager.py:514-521, cef = cat of id-chunks along
    batch)."""
    assert coeff.ndim == 4, f"expected (N', es, h, inner), got {coeff.shape}"
    if loss_type == "l1_reg":
        return jnp.abs(coeff).sum(axis=1).mean() * 1e-6
    if loss_type == "l2_reg":
        return jnp.sqrt((coeff ** 2).sum(axis=1) + 1e-12).mean() * 1e-6
    return jnp.zeros(())


def cosine_id_loss(meta1: jax.Array, meta2s: Sequence[jax.Array],
                   meta3: jax.Array) -> jax.Array:
    """same-id attract / diff-id repel cosine loss (embedding_manager.py:500-505).

    Matches ``torch.cosine_similarity(a, b)`` exactly: reduction over
    **dim=1** (the es·h axis of (N, es·h, D) metas, giving (N, D) maps),
    eps 1e-8 applied per-operand norm, then a global mean."""
    def cos(a, b):
        num = (a * b).sum(axis=1)
        na = jnp.maximum(jnp.linalg.norm(a, axis=1), 1e-8)
        nb = jnp.maximum(jnp.linalg.norm(b, axis=1), 1e-8)
        return num / (na * nb)
    loss = 1 - cos(meta1, meta3)
    for m2 in meta2s:
        loss = loss + cos(meta1, m2)
    return loss.mean()


VALID_LOSS_TYPES = ("none", "l1_reg", "l2_reg", "cosine", "contra")


def id_neg_loss(loss_type: str, metas: jax.Array, cefs: jax.Array,
                gnet=None, gnet_params=None):
    """The reference's ``_calc_id_neg_loss`` (embedding_manager.py:492-529)
    as a pure function, added into ``p_losses`` (ddpm.py:1112-1114).

    metas: (B, k, es*h, D) per-face-slot meta embeddings (slot-major list in
    the reference); cefs: (B, k, es, h, inner) coefficients.

    Semantics pinned to the reference's final sum
    ``loss_cosine*0 + loss_cls*0 + loss_reg*1 + loss_contra*1``:
    - 'cosine' is COMPUTED and logged but weighted 0 — that ×0 is the
      reference's own behavior (embedding_manager.py:529), not an omission;
    - 'l1_reg'/'l2_reg' regularize the coefficients (weight 1e-6);
    - 'contra' adds 1e-2 × InfoNCE through the trainable g-net; per-face
      features are the flattened (es·h·D) meta (the reference module's
      (N,768) contract generalized — its code only executes for 2-D metas,
      contrastive_loss.py:22-26).  Note InfoNCE is identically 0 at k=2
      face slots (the sole candidate is the positive) — true of the
      reference layout with diff_cnt=0 as well; use diff_cnt>0 for a
      live contra signal.
    Returns (loss, logs).
    """
    if loss_type not in VALID_LOSS_TYPES:
        raise ValueError(f"unknown loss_type {loss_type!r}; "
                         f"expected one of {VALID_LOSS_TYPES}")
    B, k = metas.shape[:2]
    logs = {}
    loss = coefficient_reg_loss(loss_type, cefs.reshape((-1,) + cefs.shape[2:]))
    logs["loss_reg"] = loss
    if loss_type == "cosine":
        meta1, meta3 = metas[:, 0], metas[:, -1]
        meta2s = [metas[:, i] for i in range(1, k - 1)]
        logs["loss_cosine"] = cosine_id_loss(meta1, meta2s, meta3)
        loss = loss + 0.0 * logs["loss_cosine"]   # reference ×0 weight
    if loss_type == "contra":
        from celebbasis_tpu.core.losses import contrastive_loss
        assert gnet is not None and gnet_params is not None, \
            "loss_type='contra' needs the trainable g-net"
        contra = contrastive_loss(gnet, gnet_params,
                                  metas.reshape(B, k, -1)) * 1e-2
        logs["loss_contra"] = contra
        loss = loss + contra
    return loss, logs


# -- checkpoint interop -----------------------------------------------------

def save_checkpoint(cfg: ManagerConfig, state: ManagerState, path: str,
                    meta_net_params=None) -> None:
    """Reference-schema .pt (embedding_manager.py:396-410)."""
    from celebbasis_tpu.utils.pt_io import save_pt
    cast = np.float16 if cfg.save_fp16 else np.float32
    save_dict = {}
    if cfg.test_mode == "coefficient":
        save_dict["id_coefficients"] = [
            np.asarray(state.id_coefficients[i], cast)
            for i in range(cfg.max_ids)]
    elif cfg.test_mode == "embedding":
        save_dict["id_embeddings"] = [
            np.asarray(state.id_embeddings[i], cast)
            for i in range(cfg.max_ids)]
    elif cfg.test_mode == "image":
        assert meta_net_params is not None
        flat = jax.tree_util.tree_flatten_with_path(meta_net_params)[0]
        save_dict["meta_id_net"] = {
            jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    save_pt(save_dict, path)


def load_checkpoint(cfg: ManagerConfig, path: str,
                    state: ManagerState | None = None) -> ManagerState:
    """Accepts reference- or self-produced checkpoints
    (embedding_manager.py:412-426)."""
    from celebbasis_tpu.utils.pt_io import load_pt
    ckpt = load_pt(path)
    if state is None:
        state = ManagerState(
            jnp.zeros((cfg.max_ids, cfg.reps, cfg.token_dim)),
            jnp.zeros((cfg.max_ids, cfg.num_es, cfg.heads, cfg.inner_dim)))
    coeffs = ckpt.get("id_coefficients")
    if coeffs is not None:
        arr = np.stack([np.asarray(c, np.float32) for c in coeffs])
        state = state._replace(id_coefficients=jnp.asarray(arr))
    embs = ckpt.get("id_embeddings")
    if embs is not None:
        arr = np.stack([np.asarray(e, np.float32).reshape(cfg.reps,
                                                          cfg.token_dim)
                        for e in embs])
        state = state._replace(id_embeddings=jnp.asarray(arr))
    return state
