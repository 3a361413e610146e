"""BERT text path parity: x_transformer oracle + tokenizer contracts.

Oracle: the reference's own ``TransformerWrapper``/``Encoder``
(`/root/reference/ldm/modules/x_transformer.py:370-650`) with bridged random
weights — pins the pre-LN block order, biasless qkv, exact GELU, learned
positional embeddings, and the final LayerNorm of our Flax BERTTextEncoder.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from celebbasis_tpu.models.bert_text import (BERTTextConfig,  # noqa: E402
                                             BERTTextEncoder, ClassEmbedder)
from celebbasis_tpu.text.bert_tokenizer import (BERTTokenizer,  # noqa: E402
                                                CLS_ID, PAD_ID, SEP_ID,
                                                default_bert_tokenizer)
from celebbasis_tpu.utils import bridge  # noqa: E402

torch = pytest.importorskip("torch")


def test_bert_encoder_parity_tiny():
    from ldm.modules.x_transformer import Encoder as XEncoder
    from ldm.modules.x_transformer import TransformerWrapper
    torch.manual_seed(3)
    cfg = BERTTextConfig.tiny()
    ref = TransformerWrapper(
        num_tokens=cfg.vocab_size, max_seq_len=cfg.max_seq_len,
        attn_layers=XEncoder(dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                             attn_dim_head=cfg.dim_head)).eval()
    ids = torch.randint(0, cfg.vocab_size, (2, 77))
    with torch.no_grad():
        ref_out = ref(ids, return_embeddings=True).numpy()

    state = {f"m.{k}": v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = bridge.convert_bert_text(state, cfg.depth, prefix="m.")
    model = BERTTextEncoder(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=3e-4, rtol=1e-3)


def test_bert_encoder_ti_inject_hook():
    """The inject hook sees (ids, token-embeddings) before position emb."""
    cfg = BERTTextConfig.tiny()
    model = BERTTextEncoder(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 77)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    seen = {}

    def inject(tok, emb):
        seen["shapes"] = (tok.shape, emb.shape)
        return emb + 1.0

    base = model.apply(params, ids)
    injected = model.apply(params, ids, inject)
    assert seen["shapes"] == ((1, 77), (1, 77, cfg.dim))
    assert np.abs(np.asarray(injected) - np.asarray(base)).max() > 1e-3


def test_bert_tokenizer_contract_synthetic():
    """[CLS] w [SEP] framing, PAD=0, single-token words offline — the TI
    assert `count_nonzero == 3` (embedding_manager.py:26-32) holds."""
    tok = BERTTokenizer.synthetic()
    enc = tok(["hello world", "*"])
    assert enc.shape == (2, 77)
    assert enc[0, 0] == CLS_ID and enc[0, 3] == SEP_ID
    assert (enc[0, 4:] == PAD_ID).all()
    # single word -> exactly 3 nonzero entries (CLS, token, SEP)
    assert int(np.count_nonzero(enc[1])) == 3
    # determinism across instances (stable ids between processes)
    tok2 = BERTTokenizer.synthetic()
    np.testing.assert_array_equal(enc, tok2(["hello world", "*"]))
    assert default_bert_tokenizer().is_synthetic


def test_bert_tokenizer_wordpiece_real_vocab(tmp_path):
    """Greedy longest-match WordPiece with ## continuations + UNK."""
    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "un", "##aff", "##able", "hello", "world", "!", "##ld"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = BERTTokenizer.from_vocab_file(str(path))
    assert not tok.is_synthetic
    enc = tok.encoder
    assert tok.tokenize("unaffable") == [enc["un"], enc["##aff"],
                                         enc["##able"]]
    assert tok.tokenize("Hello, World!") == [enc["hello"], enc["[UNK]"],
                                             enc["world"], enc["!"]]
    assert tok.tokenize("xyzzy") == [enc["[UNK]"]]


def test_class_embedder():
    """(B,) labels -> (B, 1, D) crossattn context (modules.py:42-54)."""
    m = ClassEmbedder(n_classes=10, embed_dim=16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    out = m.apply(params, jnp.asarray([3, 7]))
    assert out.shape == (2, 1, 16)
    table = np.asarray(params["params"]["embedding"])
    np.testing.assert_allclose(np.asarray(out)[:, 0], table[[3, 7]])
