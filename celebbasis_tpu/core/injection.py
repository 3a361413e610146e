"""Placeholder expansion + identity-embedding injection as static-shape ops.

The reference mutates one (77,768) row at a time in a Python loop:
``get_rep_pos`` finds placeholder positions, ``shift_tensor_dim0`` shifts the
tail to open ``reps`` slots per placeholder, then id vectors are written in
(`/root/reference/ldm/modules/id_embedding/helpers.py:6-41`,
`embedding_manager.py:322-394`).  That is unjittable (dynamic shapes,
in-place writes, per-row host loop).

TPU-native reformulation (SURVEY §7.1): the shift is a **fixed-shape gather**.
For each sequence position ``i`` let ``off(i) = (reps-1) * #placeholders
strictly before i``.  Every original token moves to ``i + off(i)``; each
placeholder's span of ``reps`` output slots reads from an id-vector bank
instead.  Build (src_index, slot_id) maps with cumsum + scatter — O(L) ops,
static shapes — then one ``take`` + one ``where`` produce the final
embeddings.  ``vmap`` batches it; everything jits.

Semantics match the reference exactly, including 77-truncation of the shifted
tail and multiple occurrences of the same placeholder.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_shift_maps(tokens: jax.Array, placeholder_ids: jax.Array,
                     num_active: jax.Array, reps: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Per-sequence gather maps.

    tokens: (L,) int32 token ids.
    placeholder_ids: (P,) int32 placeholder token ids (static length).
    num_active: scalar int — how many of the P placeholders are live for this
      example (the reference's ``num_ids`` branch, embedding_manager.py:322-394).
    reps: number of embedding slots per placeholder (num_embeds_per_token).

    Returns:
      src:  (L,) int32 — output position o reads original position src[o];
      slot: (L,) int32 — flat id-vector index ``p * reps + r`` for injected
            positions, -1 elsewhere.
    """
    L = tokens.shape[0]
    P = placeholder_ids.shape[0]
    pos = jnp.arange(L, dtype=jnp.int32)

    matches = tokens[None, :] == placeholder_ids[:, None]          # (P, L)
    active = (jnp.arange(P) < num_active)[:, None]                 # (P, 1)
    matches = matches & active
    ph_which = jnp.where(matches.any(0),
                         jnp.argmax(matches, axis=0).astype(jnp.int32), -1)
    is_ph = (ph_which >= 0).astype(jnp.int32)

    before = jnp.cumsum(is_ph) - is_ph                             # strictly-before count
    new_pos = pos + (reps - 1) * before

    # original tokens scatter to their shifted positions (truncate at L)
    valid = new_pos < L
    # invalid entries are redirected to index L, which mode="drop" discards
    src = jnp.zeros((L,), jnp.int32).at[jnp.where(valid, new_pos, L)].set(
        pos, mode="drop")
    slot = jnp.full((L,), -1, jnp.int32)
    # each placeholder occupies new_pos..new_pos+reps-1 in the output
    for r in range(reps):
        tgt = new_pos + r
        ok = (ph_which >= 0) & (tgt < L)
        slot = slot.at[jnp.where(ok, tgt, L)].set(
            jnp.where(ok, ph_which * reps + r, -1), mode="drop")
        # injected spans still need src defined (overwritten by slot anyway)
        src = src.at[jnp.where(ok, tgt, L)].set(
            jnp.where(ok, pos, 0), mode="drop")
    return src, slot


def inject_embeddings(tokens: jax.Array, embeds: jax.Array,
                      id_vectors: jax.Array, placeholder_ids: jax.Array,
                      num_active: jax.Array, reps: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Single-sequence injection.

    embeds: (L, D) token-table embeddings; id_vectors: (P*reps, D) the
    per-identity vectors (placeholder p, slot r at row p*reps+r).
    Returns (new_embeds (L,D), slot (L,)).
    """
    src, slot = build_shift_maps(tokens, placeholder_ids, num_active, reps)
    shifted = embeds[src]
    injected = id_vectors[jnp.clip(slot, 0, id_vectors.shape[0] - 1)]
    out = jnp.where((slot >= 0)[:, None], injected, shifted)
    return out, slot


def inject_batch(tokens: jax.Array, embeds: jax.Array, id_vectors: jax.Array,
                 placeholder_ids: jax.Array, num_active: jax.Array,
                 reps: int) -> jax.Array:
    """Batched injection: tokens (B,L), embeds (B,L,D),
    id_vectors (B,P*reps,D), num_active (B,) -> (B,L,D)."""
    fn = jax.vmap(inject_embeddings, in_axes=(0, 0, 0, None, 0, None))
    out, _ = fn(tokens, embeds, id_vectors, placeholder_ids, num_active, reps)
    return out


# -- host-side reference implementation (for tests / tooling) ---------------

def inject_reference_numpy(tokens: np.ndarray, embeds: np.ndarray,
                           id_vectors: np.ndarray, placeholder_ids: list,
                           num_active: int, reps: int) -> np.ndarray:
    """Direct transcription of the reference algorithm's *semantics*
    (helpers.py shift + per-position overwrite) in numpy, used as the golden
    model for the gather formulation."""
    L, D = embeds.shape
    out = embeds.copy()
    ph = list(placeholder_ids[:num_active])
    pos_list = [np.where(tokens == p)[0] for p in ph]
    all_pos = np.concatenate(pos_list) if pos_list else np.array([], np.int64)
    offset = np.zeros(L, np.int64)
    for p in all_pos:
        offset[p + 1:] += reps - 1
    r_cnt = len(all_pos)
    target = (np.arange(L) + offset)[: L - r_cnt * (reps - 1)]
    out[target] = out[np.arange(len(target))]
    final = target[all_pos].repeat(reps) + np.tile(np.arange(reps), r_cnt)
    lo = 0
    for pi, positions in enumerate(pos_list):
        for _ in range(len(positions)):
            for r in range(reps):
                fp = final[lo]
                if fp < L:
                    out[fp] = id_vectors[pi * reps + r]
                lo += 1
    return out
