"""Tests for celeb-basis PCA construction and static-shape injection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.core import basis as basis_mod
from celebbasis_tpu.core.basis import (BasisConfig, build_celeb_basis,
                                       pca_basis, reconstruct)
from celebbasis_tpu.core.injection import (build_shift_maps, inject_batch,
                                           inject_embeddings,
                                           inject_reference_numpy)
from celebbasis_tpu.text.tokenizer import CLIPTokenizer

pytestmark = pytest.mark.smoke

NAMES = ["Anne Hathaway", "Barack Obama", "Elon Musk", "Robert Downey",
         "Taylor Swift", "Anne Boleyn", "Emma Watson", "Brad Pitt"]


@pytest.fixture(scope="module")
def tok():
    return CLIPTokenizer.synthetic(size=1024)


def test_basis_shape_and_orthonormal(tok):
    table = np.random.default_rng(0).standard_normal((1024, 64)).astype(np.float32)
    cfg = BasisConfig(n_components=16, num_embeds_per_token=2,
                      special_id_threshold=1022)
    b = build_celeb_basis(NAMES, tok, table, cfg)
    assert b.shape == (2, 17, 64)
    for col in range(2):
        v = b[col, 1:]
        gram = v @ v.T
        np.testing.assert_allclose(gram, np.eye(16), atol=1e-5)


def test_pca_reconstruction():
    """Projecting a sample onto the full basis must reconstruct it."""
    rng = np.random.default_rng(1)
    col = rng.standard_normal((40, 24)).astype(np.float32)
    b = pca_basis(col, n_components=24)  # full rank basis (k-1 dirs suffice)
    mean, v = b[:1], b[1:]
    x = col[7:8] - mean
    coeff = x @ v.T
    rec = coeff @ v + mean
    np.testing.assert_allclose(rec, col[7:8], atol=1e-4)


def test_pca_deterministic_signs():
    col = np.random.default_rng(2).standard_normal((30, 16)).astype(np.float32)
    b1 = pca_basis(col, 8)
    b2 = pca_basis(col.copy(), 8)
    np.testing.assert_array_equal(b1, b2)
    # canonical: largest-|.| element of each direction is positive
    v = b1[1:]
    idx = np.argmax(np.abs(v), axis=1)
    assert (v[np.arange(8), idx] > 0).all()


def test_reconstruct_einsum():
    basis = np.random.default_rng(3).standard_normal((2, 5, 8)).astype(np.float32)
    coeff = np.random.default_rng(4).standard_normal((2, 1, 4)).astype(np.float32)
    z = reconstruct(coeff, basis)
    assert z.shape == (2, 8)
    manual = coeff[0, 0] @ basis[0, 1:] + basis[0, 0]
    np.testing.assert_allclose(z[0], manual, rtol=1e-6)


def test_basis_pt_roundtrip(tmp_path, tok):
    table = np.random.default_rng(0).standard_normal((1024, 32)).astype(np.float32)
    cfg = BasisConfig(n_components=8, special_id_threshold=1022)
    b = build_celeb_basis(NAMES, tok, table, cfg)
    p = tmp_path / "celeb_basis.pt"
    basis_mod.save_basis_pt(b, str(p))
    b2 = basis_mod.load_basis_pt(str(p))
    np.testing.assert_array_equal(b, b2)


# ---------------------------------------------------------------------------
# injection
# ---------------------------------------------------------------------------

def _case(tokens, ph_ids, num_active, reps=2, D=6):
    L = len(tokens)
    tokens = np.asarray(tokens, np.int32)
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((L, D)).astype(np.float32)
    idv = rng.standard_normal((len(ph_ids) * reps, D)).astype(np.float32)
    ref = inject_reference_numpy(tokens, embeds, idv, ph_ids, num_active, reps)
    got, _ = jax.jit(inject_embeddings, static_argnums=(5,))(
        jnp.asarray(tokens), jnp.asarray(embeds), jnp.asarray(idv),
        jnp.asarray(ph_ids, jnp.int32), jnp.int32(num_active), reps)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
    return np.asarray(got), embeds, idv


def test_inject_single_placeholder():
    # "sot a photo of X person eot eot..." with X=ph 500
    tokens = [49406, 10, 11, 12, 500, 13, 49407, 49407, 49407, 49407]
    got, embeds, idv = _case(tokens, [500, 501], num_active=1)
    # ph at 4 expands to slots 4,5 with id vectors 0,1; tail shifts right by 1
    np.testing.assert_allclose(got[4], idv[0])
    np.testing.assert_allclose(got[5], idv[1])
    np.testing.assert_allclose(got[6], embeds[5])
    np.testing.assert_allclose(got[:4], embeds[:4])


def test_inject_two_placeholders():
    tokens = [49406, 500, 10, 501, 11, 49407, 49407, 49407, 49407, 49407]
    got, embeds, idv = _case(tokens, [500, 501], num_active=2)
    np.testing.assert_allclose(got[1], idv[0])
    np.testing.assert_allclose(got[2], idv[1])
    np.testing.assert_allclose(got[3], embeds[2])
    np.testing.assert_allclose(got[4], idv[2])
    np.testing.assert_allclose(got[5], idv[3])
    np.testing.assert_allclose(got[6], embeds[4])


def test_inject_inactive_placeholder_ignored():
    tokens = [49406, 500, 501, 11, 49407, 49407]
    got, embeds, idv = _case(tokens, [500, 501], num_active=1)
    # 501 not active: treated as a normal token, shifted right by 1
    np.testing.assert_allclose(got[1], idv[0])
    np.testing.assert_allclose(got[2], idv[1])
    np.testing.assert_allclose(got[3], embeds[2])


def test_inject_truncation_at_end():
    tokens = [49406, 10, 500, 11, 12]  # L=5, shift pushes 12 off the end
    _case(tokens, [500], num_active=1)


def test_inject_repeated_placeholder():
    tokens = [49406, 500, 10, 500, 49407, 49407, 49407, 49407]
    _case(tokens, [500], num_active=1)


def test_inject_no_placeholder_is_identity():
    tokens = [49406, 10, 11, 49407, 49407]
    got, embeds, _ = _case(tokens, [500], num_active=1)
    np.testing.assert_allclose(got, embeds)


def test_inject_batch_vmap():
    L, D, reps = 12, 6, 2
    toks = np.array([[49406, 500, 10, 49407] + [49407] * 8,
                     [49406, 10, 500, 501] + [49407] * 8], np.int32)
    rng = np.random.default_rng(5)
    embeds = rng.standard_normal((2, L, D)).astype(np.float32)
    idv = rng.standard_normal((2, 4, D)).astype(np.float32)
    num_active = np.array([1, 2], np.int32)
    out = jax.jit(inject_batch, static_argnums=(5,))(
        jnp.asarray(toks), jnp.asarray(embeds), jnp.asarray(idv),
        jnp.asarray([500, 501], jnp.int32), jnp.asarray(num_active), reps)
    for b in range(2):
        ref = inject_reference_numpy(toks[b], embeds[b], idv[b], [500, 501],
                                     int(num_active[b]), reps)
        np.testing.assert_allclose(np.asarray(out[b]), ref, atol=1e-6)
