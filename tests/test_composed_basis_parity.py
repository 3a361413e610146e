"""Composed W1 celeb-basis builder oracle (VERDICT r4 #1).

Runs the reference's OWN ``FrozenCLIPEmbedder._get_celeb_embeddings``
(`/root/reference/ldm/modules/encoders/modules.py:472-624`) at tiny dims —
per-token-column collection :522-538, sample-reduce SVD branch :579-588,
flatten branch :540-551, mean+SVD PCA :600-610 — against
``core/basis.py::build_celeb_basis`` on the same synthetic-tokenizer token
table, over a name list that exercises:

* duplicate full names (the *string*-level rm_repeats dedup, which is real),
* duplicate first/second tokens across names (the *token*-level dedup, which
  is an effective no-op in the reference — ``tok in col_token_set`` tests
  0-dim tensors whose hash is id-based, so duplicates are always kept),
* a 3-word name (a third token column exists and is ignored),
* a 1-word name (its second column slot is EOT and is skipped).

SVD sign freedom: torch.svd and numpy svd return singular vectors with
arbitrary (and empirically different) per-row signs on identical input, so
raw tensors cannot be compared directly.  The oracle therefore asserts:

1. the mean row (basis[:, 0]) matches exactly,
2. a per-row sign map ``s`` exists with |s| = 1 such that
   ``ref_directions == s * our_directions`` to fp32 tolerance (direction
   equality up to documented sign freedom),
3. span equality: the projection operators P^T P agree,
4. z-parity: ``z = coeff · P + mean`` agrees for random coefficients once
   the coefficients are carried through the sign map,
5. our canonical convention is self-consistent: canonicalizing the
   reference's directions with our ``_canonicalize_signs`` reproduces our
   basis exactly.

A negative control pins the dedup-no-op claim: building with
``true_dedup=True`` (the dedup the reference *intended*) changes the basis,
proving duplicate-token embeddings really are kept by the reference.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from celebbasis_tpu.core.basis import (BasisConfig, _canonicalize_signs,  # noqa: E402
                                       build_celeb_basis,
                                       collect_column_embeddings,
                                       read_names, reconstruct)
from celebbasis_tpu.text.tokenizer import CLIPTokenizer  # noqa: E402

TOKEN_DIM = 64
INNER = 8
NUM_ES = 2

# Exercises: string-dup ("anna smith" twice), token dups in col 0 (anna x3)
# and col 1 (smith x3), a 3-word name, a 1-word name.  12 unique names;
# col 0 keeps 12 embeddings (dedup no-op), col 1 keeps 11 (one 1-word name).
NAMES = [
    "anna smith", "anna jones", "anna brown", "bella smith", "carla smith",
    "dora klein", "erin fuchs", "mary jo beth", "cher", "gina holt",
    "hana igor", "ivy jacobs", "kara lyn",
    "anna smith",                      # duplicate string (rm_repeats real)
]


class _HFTokStub:
    def __init__(self, tok):
        self.tok = tok

    def __call__(self, text, **kw):
        texts = [text] if isinstance(text, str) else list(text)
        return {"input_ids": torch.from_numpy(self.tok(texts)).long()}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tok = CLIPTokenizer.synthetic()
    for n in NAMES:
        tok._register_words(n)
    mp = pytest.MonkeyPatch()
    torch.manual_seed(0)
    tcfg = transformers.CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=TOKEN_DIM,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu")
    tiny_clip = transformers.CLIPTextModel(tcfg).eval()
    mp.setattr(transformers.CLIPTokenizer, "from_pretrained",
               classmethod(lambda cls, v, **k: _HFTokStub(tok)))
    mp.setattr(transformers.CLIPTextModel, "from_pretrained",
               classmethod(lambda cls, v, **k: tiny_clip))

    names_path = tmp_path_factory.mktemp("basis") / "names.txt"
    names_path.write_text("\n".join(NAMES) + "\n")

    table = tiny_clip.text_model.embeddings.token_embedding \
        .weight.detach().numpy()
    yield dict(tok=tok, table=table, names_path=str(names_path), mp=mp)
    mp.undo()


def _ref_basis(env, **kw):
    from ldm.modules.encoders.modules import FrozenCLIPEmbedder
    defaults = dict(version="offline", device="cpu", use_celeb=True,
                    use_svd=True, rm_repeats=True, use_sample_reduce=False,
                    use_flatten=False, n_components=INNER,
                    num_embeds_per_token=NUM_ES,
                    celeb_txt=env["names_path"])
    defaults.update(kw)
    with torch.no_grad():
        emb = FrozenCLIPEmbedder(**defaults)
    return emb.celeb_embeddings.detach().numpy()


def _assert_basis_parity(ref, ours, rng):
    """The five assertions from the module docstring; returns the sign map."""
    assert ref.shape == ours.shape
    es = ref.shape[0]
    # 1. mean rows exact
    np.testing.assert_allclose(ours[:, 0], ref[:, 0], atol=1e-6, rtol=1e-6,
                               err_msg="mean row")
    signs = np.empty((es, ref.shape[1] - 1), np.float32)
    for j in range(es):
        p_ref, p_ours = ref[j, 1:], ours[j, 1:]
        # 2. per-row sign map: |<ref_i, ours_i>| ~= 1 (unit rows)
        dots = (p_ref * p_ours).sum(axis=1)
        np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-4,
                                   err_msg=f"col {j}: rows not parallel")
        s = np.sign(dots)
        np.testing.assert_allclose(p_ours * s[:, None], p_ref,
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"col {j}: sign-aligned rows")
        # 3. span equality (sign-free)
        np.testing.assert_allclose(p_ours.T @ p_ours, p_ref.T @ p_ref,
                                   atol=2e-5, err_msg=f"col {j}: span")
        # 5. our canonical convention reproduces ours from ref
        np.testing.assert_allclose(_canonicalize_signs(p_ref), p_ours,
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"col {j}: canonicalized ref")
        signs[j] = s
    # 4. z-parity through the sign map
    coeff = rng.standard_normal((es, 1, ref.shape[1] - 1)).astype(np.float32)
    z_ours = reconstruct(coeff, ours)
    z_ref = reconstruct(coeff * signs[:, None, :], ref)
    np.testing.assert_allclose(z_ours, z_ref, atol=1e-4, rtol=1e-4,
                               err_msg="z = coeff.P + mean")
    return signs


@pytest.mark.smoke
def test_w1_basis_oracle_default(env):
    """Product-path config (aigc_id.yaml:82-90: svd on, rm_repeats on,
    no flatten, no sample-reduce)."""
    ref = _ref_basis(env)
    cfg = BasisConfig(n_components=INNER, num_embeds_per_token=NUM_ES)
    names = read_names(env["names_path"], cfg.rm_repeats)
    assert len(names) == len(set(NAMES))        # string dedup is real
    ours = build_celeb_basis(names, env["tok"], env["table"], cfg)
    _assert_basis_parity(ref, ours, np.random.default_rng(3))

    # dedup-no-op proof: duplicate tokens are kept by the reference ...
    all_tokens = env["tok"](names)
    cols = collect_column_embeddings(all_tokens, env["table"][all_tokens],
                                     cfg)
    n_unique0 = len({int(t) for t in all_tokens[:, 1] if int(t) < 49406})
    assert len(cols[0]) == len(names) > n_unique0
    # ... and the *intended* dedup produces a different basis
    strict = build_celeb_basis(
        names, env["tok"], env["table"],
        BasisConfig(n_components=INNER, num_embeds_per_token=NUM_ES,
                    true_dedup=True))
    assert not np.allclose(strict, ours, atol=1e-3)


def test_w1_basis_oracle_sample_reduce(env):
    """modules.py:579-588: project each column onto its top-``n_samples``
    right-singular vectors before PCA.  The reduce SVD's per-column signs
    flip whole *rows* of the reduced matrix, which changes the downstream
    mean — an arbitrariness inherited from torch.svd.  The oracle records
    the reference's reduce-SVD outputs, aligns our reduce to the same signs,
    and then requires the rest of the chain to agree exactly."""
    from celebbasis_tpu.core.basis import pca_basis, sample_reduce

    r = 10
    recorded = []
    orig_svd = torch.svd

    def rec_svd(*a, **k):
        out = orig_svd(*a, **k)
        recorded.append((a[0].detach().clone(), out))
        return out

    env["mp"].setattr(torch, "svd", rec_svd)
    try:
        ref = _ref_basis(env, use_sample_reduce=True, n_samples=r)
    finally:
        env["mp"].setattr(torch, "svd", orig_svd)
    # 2 columns x (reduce, pca) = 4 svd calls
    assert len(recorded) == 4

    cfg = BasisConfig(n_components=INNER, num_embeds_per_token=NUM_ES,
                      use_sample_reduce=True, n_samples=r)
    names = read_names(env["names_path"], cfg.rm_repeats)
    all_tokens = env["tok"](names)
    cols = collect_column_embeddings(all_tokens, env["table"][all_tokens],
                                     cfg)
    rng = np.random.default_rng(5)
    for j in range(NUM_ES):
        ours_red = sample_reduce(cols[j], r)          # (r, 768)
        # reference's reduced rows from its own recorded reduce-SVD
        ce = torch.from_numpy(cols[j].T)              # (768, m)
        vr = recorded[2 * j][1].V[:, :r]
        ref_red = (ce @ vr).t().numpy()
        dots = (ref_red * ours_red).sum(1) / (
            np.linalg.norm(ref_red, axis=1) * np.linalg.norm(ours_red, axis=1))
        np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-4,
                                   err_msg=f"col {j}: reduced rows")
        aligned = ours_red * np.sign(dots)[:, None]
        np.testing.assert_allclose(aligned, ref_red, atol=2e-4, rtol=1e-3,
                                   err_msg=f"col {j}: sign-aligned reduce")
        # rest of the chain on the reference's sign choice must match exactly
        got = pca_basis(aligned, INNER)
        _assert_basis_parity(ref[j][None], got[None], rng)


def test_w1_basis_oracle_flatten(env):
    """modules.py:540-551: flatten=True pools every non-special token
    embedding into ONE sample list, builds one basis, and replicates it
    num_embeds_per_token times."""
    ref = _ref_basis(env, use_flatten=True)
    cfg = BasisConfig(n_components=INNER, num_embeds_per_token=NUM_ES,
                      use_flatten=True)
    names = read_names(env["names_path"], cfg.rm_repeats)
    ours = build_celeb_basis(names, env["tok"], env["table"], cfg)
    np.testing.assert_array_equal(ref[0], ref[1])     # replicated
    np.testing.assert_array_equal(ours[0], ours[1])
    _assert_basis_parity(ref, ours, np.random.default_rng(7))
