"""Shared helpers for the composed-oracle test files.

``built_tiny_basis`` produces a celeb basis through the SHIPPED builder
(``core/basis.py::build_celeb_basis``) on the tiny HF CLIP's token table —
the same builder that test_composed_basis_parity.py proves equivalent to the
reference's own ``_get_celeb_embeddings`` (modules.py:472-624) up to SVD
sign freedom.  The composed W2/W3 oracles consume this output (shared into
both stacks) instead of a random tensor, so their trajectory proofs are
conditioned on a basis the product builder actually produced.

Why shared rather than each-side-own-builder: torch.svd and numpy svd pick
arbitrary (different) per-direction signs, and a per-row sign flip of P
changes z = coeff.P + mean for the same coefficients, so two stacks running
their own builders genuinely diverge from step 0.  The W1 oracle pins the
builders equal modulo that documented sign map; the composed oracles pin the
trajectories equal on the verified builder output.
"""
import numpy as np

from celebbasis_tpu.core.basis import BasisConfig, build_celeb_basis

# 12 two-word names, >= n_components+1 samples per token column at INNER=8;
# includes duplicate first/second tokens like the real wiki list.
BASIS_NAMES = sorted([
    "anna smith", "anna jones", "bella smith", "carla reyes", "dora klein",
    "erin fuchs", "gina holt", "hana igor", "ivy jacobs", "kara lyn",
    "mona vale", "nina wolfe",
])


def built_tiny_basis(tok, tiny_clip, n_components: int,
                     num_es: int) -> np.ndarray:
    """(num_es, 1+n_components, hidden) basis from the shipped builder on the
    tiny HF CLIP token table, with the name words registered in the
    synthetic tokenizer (same ids on both stacks)."""
    for n in BASIS_NAMES:
        tok._register_words(n)
    table = tiny_clip.text_model.embeddings.token_embedding \
        .weight.detach().numpy()
    return build_celeb_basis(
        BASIS_NAMES, tok, table,
        BasisConfig(n_components=n_components, num_embeds_per_token=num_es))
