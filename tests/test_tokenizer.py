"""Validate the from-scratch CLIP BPE against HuggingFace's implementation.

A miniature vocab.json/merges.txt pair is generated on the fly; both our
tokenizer and transformers.CLIPTokenizer load it and must produce identical
ids, padding, and truncation (the 77-token contract of
reference modules.py:460-462).
"""
import json

import numpy as np
import pytest

from celebbasis_tpu.text.tokenizer import (CLIPTokenizer, SOT, EOT,
                                           bytes_to_unicode)

pytestmark = pytest.mark.smoke

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def mini_vocab(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    merges = [
        ("f", "a"), ("fa", "c"), ("fac", "e</w>"),
        ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o</w>"),
        ("o", "f</w>"), ("a", "</w>"), ("s", "k"), ("sk", "s</w>"),
        ("k", "s</w>"), ("p", "e"), ("pe", "r"), ("per", "s"),
        ("pers", "o"), ("perso", "n</w>"), ("2", "3</w>"),
    ]
    byte_vocab = list(bytes_to_unicode().values())
    tokens = byte_vocab + [c + "</w>" for c in byte_vocab]
    tokens += ["".join(m) for m in merges]
    tokens += [SOT, EOT]
    vocab = {tok: i for i, tok in enumerate(tokens)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")
    return d


SAMPLES = [
    "a photo of a sks person",
    "face of sks ks person, ultra-detailed!",
    "A   PHOTO   of a face",
    "sks person & ks person shaking hands",
    "face " * 60,  # forces truncation at 77
    "",
    "naïve café 23",
]


def test_matches_huggingface(mini_vocab):
    ours = CLIPTokenizer.load(str(mini_vocab))
    hf = transformers.CLIPTokenizer(str(mini_vocab / "vocab.json"),
                                    str(mini_vocab / "merges.txt"))
    for text in SAMPLES:
        got = ours([text])[0]
        ref = hf([text], truncation=True, max_length=77,
                 padding="max_length")["input_ids"][0]
        np.testing.assert_array_equal(got, np.asarray(ref, np.int32), err_msg=text)


def test_synthetic_vocab_layout():
    tok = CLIPTokenizer.synthetic()
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406 and tok.eot_id == 49407
    ids = tok(["hello world"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == 49406
    assert tok.decode(ids[0]) == "hello world"


def test_decode_roundtrip(mini_vocab):
    tok = CLIPTokenizer.load(str(mini_vocab))
    s = "a photo of a sks person"
    assert tok.decode(tok([s])[0]) == s


# -- offline single-token placeholder contract (VERDICT r2 #1) ---------------

def test_synthetic_placeholders_single_token():
    """Every placeholder is ONE token under the default (synthetic) tokenizer
    — the reference's get_clip_token_for_string contract
    (embedding_manager.py:13-21) must hold offline too."""
    from celebbasis_tpu.text.tokenizer import (PLACEHOLDER_WORDS,
                                               token_for_string)
    tok = CLIPTokenizer.synthetic()
    for s in PLACEHOLDER_WORDS:
        ids = tok.tokenize(s)
        assert len(ids) == 1, (s, ids)
        assert token_for_string(tok, s) == ids[0]


def test_synthetic_no_subtoken_collisions():
    """Placeholder ids never appear inside the tokenization of ordinary
    words — injection cannot fire on sub-tokens (e.g. 'ks' inside 'person'
    or 'sks' inside 'whiskers')."""
    from celebbasis_tpu.text.tokenizer import PLACEHOLDER_WORDS, token_for_string
    tok = CLIPTokenizer.synthetic()
    ph_ids = {token_for_string(tok, s) for s in PLACEHOLDER_WORDS}
    prose = ("a photo of a person wearing dark glasses, whiskers and tresses, "
             "born in rya bopper barn style, ultra-detailed portrait")
    ids = set(tok.tokenize(prose))
    assert not (ph_ids & ids)


def test_synthetic_ids_stable_across_instances():
    """Word-token ids are process-independent: two fresh synthetic vocabs
    assign identical ids to canonical and on-demand words."""
    a = CLIPTokenizer.synthetic()
    b = CLIPTokenizer.synthetic()
    for text in ["face of sks person", "a photo of rihanna and a ks person",
                 "brad pitt riding a horse"]:
        np.testing.assert_array_equal(a([text]), b([text]))


def test_synthetic_small_vocab_placeholders_survive_overflow():
    """Even when the filler space overflows (tiny 1024 vocab vs ~1k primed
    name words), placeholders are registered first and stay single-token;
    overflow words fall back to byte tokens below the filler base, so they
    can never alias a placeholder id."""
    tok = CLIPTokenizer.synthetic(size=1024)
    from celebbasis_tpu.text.tokenizer import PLACEHOLDER_WORDS
    for s in PLACEHOLDER_WORDS:
        assert len(tok.tokenize(s)) == 1
    assert all(i < tok.vocab_size for i in tok.tokenize("some spilled words"))
