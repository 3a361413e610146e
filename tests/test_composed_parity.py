"""Composed L3 conditioning golden parity (VERDICT r2 #3).

One test drives the reference's OWN torch stack — FrozenCLIPEmbedder with its
four monkey-patched forwards (modules.py:157-434) + EmbeddingManagerId
(embedding_manager.py:187-532) + MetaIdNet (meta_net.py:100-346) — and our
stack (clip token_embed → MetaIdNet.multi_faces → train_inject → encode) on
IDENTICAL bridged weights, prompts, faces and dictionary seeds, for THREE
training-style forwards, and pins the context tensors AND the momentum
dictionary states after every step.

Offline enablers (no network, no weight files):
* ``from_pretrained`` is monkeypatched to return our synthetic-vocab
  tokenizer (size 49408 → EOT=49407, so the reference's
  ``get_clip_token_for_string`` assert holds) and a tiny random-init HF
  CLIPTextModel;
* ``MetaIdNet.load_fr_net`` is monkeypatched to install a small random-init
  IResNet from the reference's own iresnet module (the shipped loader
  hard-reads ``./weights/...backbone.pth``, meta_net.py:348-355).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from celebbasis_tpu.core import manager as mgr  # noqa: E402
from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig  # noqa: E402
from celebbasis_tpu.models.clip_text import (CLIPTextConfig,  # noqa: E402
                                             CLIPTextEncoder)
from celebbasis_tpu.models.iresnet import IResNetConfig  # noqa: E402
from celebbasis_tpu.text.tokenizer import CLIPTokenizer, token_for_string  # noqa: E402
from celebbasis_tpu.utils import bridge  # noqa: E402

TOKEN_DIM = 64
INNER = 8
NUM_ES = 2
MAX_IDS = 10
MOMENTUM = 0.99
FACE = 112


class _HFTokStub:
    """Wraps our tokenizer behind the HF call contract the reference uses
    (modules.py:460-462, embedding_manager.py:18-24)."""

    def __init__(self, tok):
        self.tok = tok

    def __call__(self, text, **kw):
        texts = [text] if isinstance(text, str) else list(text)
        return {"input_ids": torch.from_numpy(self.tok(texts)).long()}


@pytest.fixture(scope="module")
def stacks():
    from ldm.modules.id_embedding import meta_net as ref_meta_mod
    from ldm.modules.id_embedding.iresnet import IResNet as RefIResNet, \
        IBasicBlock

    ours_tok = CLIPTokenizer.synthetic()
    mp = pytest.MonkeyPatch()
    torch.manual_seed(0)
    tcfg = transformers.CLIPTextConfig(
        vocab_size=ours_tok.vocab_size, hidden_size=TOKEN_DIM,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu")
    tiny_clip = transformers.CLIPTextModel(tcfg).eval()
    mp.setattr(transformers.CLIPTokenizer, "from_pretrained",
               classmethod(lambda cls, v, **k: _HFTokStub(ours_tok)))
    mp.setattr(transformers.CLIPTextModel, "from_pretrained",
               classmethod(lambda cls, v, **k: tiny_clip))

    def fake_load_fr_net(self):
        torch.manual_seed(1)
        self.id_model = RefIResNet(IBasicBlock, [1, 1, 1, 1],
                                   num_features=512)
        for p in self.id_model.parameters():
            p.requires_grad = False
        self.id_model.eval()
    mp.setattr(ref_meta_mod.MetaIdNet, "load_fr_net", fake_load_fr_net)

    from ldm.modules.embedding_manager import EmbeddingManagerId
    from ldm.modules.encoders.modules import FrozenCLIPEmbedder

    embedder = FrozenCLIPEmbedder(version="offline", device="cpu",
                                  use_celeb=False)
    manager = EmbeddingManagerId(
        embedder=embedder, placeholder_strings=["sks", "ks"],
        initializer_words=["face"], max_ids=MAX_IDS,
        num_embeds_per_token=NUM_ES, momentum=MOMENTUM, meta_mlp_depth=1,
        meta_inner_dim=INNER, meta_heads=1)
    manager.train()

    # ---- bridge the weights into our stack --------------------------------
    clip_state = {f"cond_stage_model.transformer.{k}": v.detach().numpy()
                  for k, v in tiny_clip.state_dict().items()}
    clip_params = bridge.convert_clip_text(clip_state, layers=2)
    ours_clip = CLIPTextEncoder(
        CLIPTextConfig(vocab_size=ours_tok.vocab_size, width=TOKEN_DIM,
                       layers=2, heads=4, mlp_dim=128), dtype=jnp.float32)

    ir_state = {k: v.detach().numpy()
                for k, v in manager.meta_id_net.id_model.state_dict().items()}
    ir_params = bridge.convert_iresnet(ir_state, layers=(1, 1, 1, 1))
    sv = manager.meta_id_net.stylegan_mlp.net[0]
    meta_cfg = MetaNetConfig(
        fr_dim=512, inner_dim=INNER, num_es=NUM_ES, heads=1, mlp_depth=1,
        lr_mul=1.0, token_dim=TOKEN_DIM, face_size=FACE,
        iresnet=IResNetConfig(layers=(1, 1, 1, 1), feat_dim=512, base=64,
                              input_size=FACE))
    meta = MetaIdNet(meta_cfg, dtype=jnp.float32)
    meta_params = {"params": {
        "fr_net": ir_params["params"],
        "mlp": {"layer_0": {"weight": jnp.asarray(sv.weight.detach().numpy()),
                            "bias": jnp.asarray(sv.bias.detach().numpy())}},
    }}

    ph_ids = [token_for_string(ours_tok, s) for s in ("sks", "ks")]
    m_cfg = mgr.ManagerConfig(placeholder_token_ids=tuple(ph_ids),
                              max_ids=MAX_IDS, num_es=NUM_ES, heads=1,
                              inner_dim=INNER, token_dim=TOKEN_DIM,
                              momentum=MOMENTUM)
    yield dict(tok=ours_tok, embedder=embedder, manager=manager,
               clip=ours_clip, clip_params=clip_params, meta=meta,
               meta_params=meta_params, m_cfg=m_cfg)
    mp.undo()


def test_composed_conditioning_three_steps(stacks):
    s = stacks
    rng = np.random.default_rng(7)

    # shared dictionary seeds (the reference's own init adds pos-embedding
    # quirks and aliases one randn across ids — overwrite both sides)
    emb0 = rng.standard_normal((MAX_IDS, NUM_ES, TOKEN_DIM)).astype(np.float32)
    coef0 = rng.standard_normal((MAX_IDS, NUM_ES, 1, INNER)).astype(np.float32)
    s["manager"].id_embeddings = [torch.from_numpy(emb0[i].copy())
                                  for i in range(MAX_IDS)]
    s["manager"].id_coefficients = [torch.from_numpy(coef0[i].copy())
                                    for i in range(MAX_IDS)]
    mstate = mgr.ManagerState(jnp.asarray(emb0), jnp.asarray(coef0))

    basis = rng.standard_normal((NUM_ES, 1 + INNER, TOKEN_DIM)).astype(
        np.float32)
    s["embedder"].celeb_embeddings = torch.from_numpy(basis.copy())

    prompts = ["face of sks person",
               "a photo of sks person and ks person"]
    tokens = s["tok"](prompts)                      # (2, 77)
    ids = np.asarray([[0, 1], [0, 1]], np.int32)
    num_ids = np.asarray([1, 2], np.int32)

    ctx_fn = jax.jit(lambda cp, e: s["clip"].apply(
        cp, e, method=CLIPTextEncoder.encode))
    embed_fn = jax.jit(lambda cp, t: s["clip"].apply(
        cp, t, method=CLIPTextEncoder.token_embed))
    meta_fn = jax.jit(lambda mp_, f, i, b: s["meta"].apply(
        mp_, f, i, b, method=MetaIdNet.multi_faces))

    for it in range(3):
        faces = rng.uniform(-1, 1, (2, 2, FACE, FACE, 3)).astype(np.float32)
        faces_torch = torch.from_numpy(
            np.concatenate([faces[:, 0], faces[:, 1]], axis=-1))  # (2,H,W,6)
        img_ori = {"faces": faces_torch,
                   "ids": torch.from_numpy(ids).long(),
                   "num_ids": torch.from_numpy(num_ids).long()}
        with torch.no_grad():
            ref_ctx = s["embedder"](prompts, embedding_manager=s["manager"],
                                    image_ori=img_ori).numpy()

        pred_z, pred_coeff = meta_fn(s["meta_params"], jnp.asarray(faces),
                                     jnp.asarray(ids), jnp.asarray(basis))
        embeds = embed_fn(s["clip_params"], jnp.asarray(tokens))
        new_embeds, mstate = mgr.train_inject(
            s["m_cfg"], mstate, jnp.asarray(tokens), embeds, pred_z,
            pred_coeff, jnp.asarray(ids), jnp.asarray(num_ids))
        ctx = np.asarray(ctx_fn(s["clip_params"], new_embeds))

        np.testing.assert_allclose(ctx, ref_ctx, atol=2e-3, rtol=1e-3,
                                   err_msg=f"context diverged at step {it}")
        # momentum dictionaries track identically (ids 0 and 1 are live)
        for idx in range(2):
            np.testing.assert_allclose(
                np.asarray(mstate.id_embeddings[idx]),
                s["manager"].id_embeddings[idx].detach().numpy(),
                atol=1e-4, rtol=1e-4,
                err_msg=f"id_embeddings[{idx}] diverged at step {it}")
            np.testing.assert_allclose(
                np.asarray(mstate.id_coefficients[idx]),
                s["manager"].id_coefficients[idx].detach().numpy(),
                atol=1e-4, rtol=1e-4,
                err_msg=f"id_coefficients[{idx}] diverged at step {it}")
    # untouched ids stay at their seeds on both sides
    np.testing.assert_array_equal(np.asarray(mstate.id_coefficients[5]),
                                  coef0[5])
