"""Vanilla Textual-Inversion baseline — learned-vector lookup/replacement.

Parity target: the reference's ``EmbeddingManager``
(`/root/reference/ldm/modules/embedding_manager.py:38-184`) kept for the
``main.py`` / ``v1-finetune.yaml`` baseline path: each placeholder string owns
``num_vectors_per_token`` directly-learned 768-d vectors, initialized from an
initializer word's token embedding; during encoding the placeholder token
position is replaced (and expanded, via the shared static-shape injection) by
those vectors, which receive gradients through the frozen diffusion stack.

State is a plain (P, V, D) parameter array — the trainable pytree of the TI
train step.  Checkpoints use the reference's
``{"string_to_token": {...}, "string_to_param": {...}}`` .pt schema.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core.injection import inject_batch


@dataclass(frozen=True)
class TIConfig:
    placeholder_strings: Tuple[str, ...] = ("*",)
    num_vectors_per_token: int = 1
    token_dim: int = 768


def init_ti_params(cfg: TIConfig, tokenizer, token_table: np.ndarray,
                   initializer_words: Sequence[str] = ()) -> jax.Array:
    """(P, V, D) learned vectors, seeded from initializer-word embeddings
    (embedding_manager.py:97-118)."""
    P, V, D = (len(cfg.placeholder_strings), cfg.num_vectors_per_token,
               cfg.token_dim)
    out = np.random.default_rng(0).normal(0, 0.01, (P, V, D)).astype(
        np.float32)
    for i, word in enumerate(initializer_words[:P]):
        tok = tokenizer.tokenize(word)[0]
        out[i] = np.broadcast_to(token_table[tok], (V, D))
    return jnp.asarray(out)


def placeholder_token_ids(cfg: TIConfig, tokenizer) -> Tuple[int, ...]:
    from celebbasis_tpu.text.tokenizer import token_for_string
    return tuple(token_for_string(tokenizer, s)
                 for s in cfg.placeholder_strings)


def ti_inject(cfg: TIConfig, ti_params: jax.Array, ph_ids: jax.Array,
              tokens: jax.Array, embeds: jax.Array) -> jax.Array:
    """Replace placeholder positions with the learned vectors (batched)."""
    B = tokens.shape[0]
    id_vectors = jnp.broadcast_to(
        ti_params.reshape(1, -1, cfg.token_dim),
        (B, ti_params.shape[0] * ti_params.shape[1], cfg.token_dim))
    num_active = jnp.full((B,), len(cfg.placeholder_strings), jnp.int32)
    return inject_batch(tokens, embeds, id_vectors, ph_ids, num_active,
                        cfg.num_vectors_per_token)


def embedding_reg_loss(ti_params: jax.Array, init_vectors: jax.Array
                       ) -> jax.Array:
    """Coarse-embedding regularizer (ddpm.py:1100-1114 embedding_reg_weight
    path): pull learned vectors toward their initializers."""
    return ((ti_params - init_vectors) ** 2).mean()


# -- checkpoint schema ------------------------------------------------------

def save_ti_checkpoint(cfg: TIConfig, ti_params, ph_ids, path: str) -> None:
    from celebbasis_tpu.utils.pt_io import save_pt
    arr = np.asarray(ti_params, np.float32)
    save_pt({
        "string_to_token": {s: np.int64(t)
                            for s, t in zip(cfg.placeholder_strings, ph_ids)},
        "string_to_param": {s: arr[i]
                            for i, s in enumerate(cfg.placeholder_strings)},
    }, path)


def load_ti_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """-> {placeholder: (V, D) vectors}; accepts reference TI checkpoints."""
    from celebbasis_tpu.utils.pt_io import load_pt
    ckpt = load_pt(path)
    params = ckpt["string_to_param"]
    out = {}
    for key, val in params.items():
        arr = np.asarray(val, np.float32)
        out[key] = arr.reshape(-1, arr.shape[-1])
    return out


def merge_ti_checkpoints(paths: Sequence[str], rename: Dict[str, str] | None
                         = None) -> Dict[str, np.ndarray]:
    """Merge several TI managers, renaming collisions
    (merge_embeddings.py parity; rename maps 'old_path:placeholder'->'new')."""
    merged: Dict[str, np.ndarray] = {}
    rename = rename or {}
    for path in paths:
        for key, val in load_ti_checkpoint(path).items():
            name = rename.get(f"{path}:{key}", key)
            if name in merged:
                raise ValueError(
                    f"placeholder collision {name!r} from {path}; pass a "
                    f"rename for '{path}:{key}'")
            merged[name] = val
    return merged
