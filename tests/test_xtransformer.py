"""Full x_transformer generality: golden parity vs the reference library.

Oracle: the reference's own ``TransformerWrapper`` / ``Encoder`` /
``AttentionLayers`` (`/root/reference/ldm/modules/x_transformer.py`) with
bridged random weights, one test per knob family — the BERT-used default
path already has its own goldens in test_bert_text.py; these pin everything
else the library exposes.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp  # noqa: E402

from celebbasis_tpu.models.xtransformer import (  # noqa: E402
    XTConfig, XTWrapperConfig, XTransformerWrapper, compute_layer_types)
from celebbasis_tpu.utils.bridge_xt import convert_xtransformer  # noqa: E402

torch = pytest.importorskip("torch")

DIM, DEPTH, HEADS, DH = 32, 2, 2, 8
VOCAB, SEQ = 53, 12


def _build_ref(wrapper_kwargs=None, **enc_kwargs):
    from ldm.modules.x_transformer import Encoder, TransformerWrapper
    torch.manual_seed(7)
    enc = Encoder(dim=DIM, depth=DEPTH, heads=HEADS, attn_dim_head=DH,
                  **enc_kwargs)
    ref = TransformerWrapper(num_tokens=VOCAB, max_seq_len=SEQ,
                             attn_layers=enc, **(wrapper_kwargs or {})).eval()
    return ref


def _cfg(**kw):
    return XTConfig(dim=DIM, depth=DEPTH, heads=HEADS, dim_head=DH, **kw)


def _check(ref, cfg, wcfg=None, call_ref=None, call_ours=None, atol=2e-4):
    """Bridge ref weights -> ours, compare outputs."""
    wcfg = wcfg or XTWrapperConfig(num_tokens=VOCAB, max_seq_len=SEQ)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_xtransformer(state, wcfg, cfg)
    model = XTransformerWrapper(wcfg, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, VOCAB, size=(2, SEQ))
    with torch.no_grad():
        ref_out = (call_ref(ref, torch.from_numpy(ids)) if call_ref
                   else ref(torch.from_numpy(ids))).numpy()
    ours = (call_ours(model, params, jnp.asarray(ids)) if call_ours
            else model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=atol, rtol=2e-4)
    return model, params, ids


def test_logits_head_and_mask():
    """Default encoder, return_embeddings=False (to_logits head) + pad mask."""
    ref = _build_ref()
    mask = np.ones((2, SEQ), bool)
    mask[0, 8:] = False
    mask[1, 5:] = False
    _check(ref, _cfg(),
           call_ref=lambda r, x: r(x, mask=torch.from_numpy(mask)),
           call_ours=lambda m, p, x: m.apply(p, x, mask=jnp.asarray(mask)))


def test_scalenorm():
    ref = _build_ref(use_scalenorm=True)
    _check(ref, _cfg(use_scalenorm=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_rmsnorm():
    ref = _build_ref(use_rmsnorm=True)
    _check(ref, _cfg(use_rmsnorm=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_rezero():
    """Identity norms + zero-init attention gates; bump the gates so the
    attention branch actually contributes."""
    ref = _build_ref(use_rezero=True)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith(".1.g"):
                p.fill_(0.37)
    _check(ref, _cfg(use_rezero=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_post_norm():
    ref = _build_ref(pre_norm=False)
    _check(ref, _cfg(pre_norm=False),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


@pytest.mark.smoke
def test_attention_extras():
    """talking_heads + sparse_topk + num_mem_kv + on_attn, all at once."""
    kw = dict(attn_talking_heads=True, attn_sparse_topk=5, attn_num_mem_kv=3,
              attn_on_attn=True)
    ref = _build_ref(**kw)
    cfg = _cfg(talking_heads=True, sparse_topk=5, num_mem_kv=3, on_attn=True)
    _check(ref, cfg,
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_cross_attend_and_only_cross():
    rng = np.random.RandomState(1)
    ctx = rng.randn(2, 7, DIM).astype(np.float32)
    cmask = np.ones((2, 7), bool)
    cmask[:, 5:] = False
    for only in (False, True):
        ref = _build_ref(cross_attend=True, only_cross=only)
        cfg = _cfg(cross_attend=True, only_cross=only)
        _check(ref, cfg,
               call_ref=lambda r, x: r(
                   x, return_embeddings=True, context=torch.from_numpy(ctx),
                   context_mask=torch.from_numpy(cmask)),
               call_ours=lambda m, p, x: m.apply(
                   p, x, return_embeddings=True, context=jnp.asarray(ctx),
                   context_mask=jnp.asarray(cmask)))


def test_position_infused_attn():
    ref = _build_ref(position_infused_attn=True)
    _check(ref, _cfg(position_infused_attn=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_gru_gated_residual():
    ref = _build_ref(gate_residual=True)
    _check(ref, _cfg(gate_residual=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_layer_plans():
    """sandwich_coef / custom_layers / par_ratio plans, value parity."""
    plans = [dict(sandwich_coef=1), dict(custom_layers=("a", "f", "f")),
             dict(par_ratio=2)]
    for plan in plans:
        ref = _build_ref(**plan)
        cfg = _cfg(**{k: tuple(v) if isinstance(v, (list, tuple)) else v
                      for k, v in plan.items()})
        assert cfg.layer_types == tuple(ref.attn_layers.layer_types), plan
        _check(ref, cfg,
               call_ref=lambda r, x: r(x, return_embeddings=True),
               call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_residual_attn():
    ref = _build_ref(residual_attn=True)
    _check(ref, _cfg(residual_attn=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_memory_tokens_and_emb_dim():
    """num_memory_tokens prepend/strip + emb_dim != dim projection.
    (tie_embedding with emb_dim != dim is broken in the reference itself —
    :584 multiplies (…, dim) @ (num_tokens, emb_dim).T — so tied logits get
    their own test at emb_dim == dim.)"""
    ref = _build_ref(wrapper_kwargs=dict(num_memory_tokens=2, emb_dim=24))
    wcfg = XTWrapperConfig(num_tokens=VOCAB, max_seq_len=SEQ,
                           num_memory_tokens=2, emb_dim=24)
    mask = np.ones((2, SEQ), bool)
    mask[1, 9:] = False
    _check(ref, _cfg(), wcfg=wcfg,
           call_ref=lambda r, x: r(x, mask=torch.from_numpy(mask)),
           call_ours=lambda m, p, x: m.apply(p, x, mask=jnp.asarray(mask)))


def test_tie_embedding():
    ref = _build_ref(wrapper_kwargs=dict(tie_embedding=True))
    wcfg = XTWrapperConfig(num_tokens=VOCAB, max_seq_len=SEQ,
                           tie_embedding=True)
    _check(ref, _cfg(), wcfg=wcfg)


def test_mems_return_mems_and_attn_maps():
    """Shortformer mems in, truncated new mems out; return_attn maps."""
    ref = _build_ref(wrapper_kwargs=dict(max_mem_len=5))
    wcfg = XTWrapperConfig(num_tokens=VOCAB, max_seq_len=SEQ, max_mem_len=5)
    cfg = _cfg()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_xtransformer(state, wcfg, cfg)
    model = XTransformerWrapper(wcfg, cfg)

    rng = np.random.RandomState(2)
    ids = rng.randint(0, VOCAB, size=(2, SEQ))
    mems = [rng.randn(2, 4, DIM).astype(np.float32) for _ in range(DEPTH)]
    with torch.no_grad():
        ref_out, ref_mems = ref(torch.from_numpy(ids), return_embeddings=True,
                                mems=[torch.from_numpy(m) for m in mems],
                                return_mems=True)
    out, new_mems = model.apply(params, jnp.asarray(ids),
                                return_embeddings=True,
                                mems=[jnp.asarray(m) for m in mems],
                                return_mems=True)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-4,
                               rtol=2e-4)
    assert len(new_mems) == len(ref_mems)
    for ours_m, ref_m in zip(new_mems, ref_mems):
        np.testing.assert_allclose(np.asarray(ours_m), ref_m.numpy(),
                                   atol=2e-4, rtol=2e-4)

    with torch.no_grad():
        _, ref_maps = ref(torch.from_numpy(ids), return_embeddings=True,
                          return_attn=True)
    _, maps = model.apply(params, jnp.asarray(ids), return_embeddings=True,
                          return_attn=True)
    assert len(maps) == len(ref_maps)
    for ours_a, ref_a in zip(maps, ref_maps):
        np.testing.assert_allclose(np.asarray(ours_a), ref_a.numpy(),
                                   atol=2e-5, rtol=2e-4)


def test_ff_glu():
    ref = _build_ref(ff_glu=True)
    _check(ref, _cfg(ff_glu=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_causal_attention_layers():
    """causal=True via raw AttentionLayers (Encoder forbids it)."""
    from ldm.modules.x_transformer import (AttentionLayers,
                                           TransformerWrapper)
    torch.manual_seed(9)
    layers = AttentionLayers(dim=DIM, depth=DEPTH, heads=HEADS,
                             attn_dim_head=DH, causal=True)
    ref = TransformerWrapper(num_tokens=VOCAB, max_seq_len=SEQ,
                             attn_layers=layers).eval()
    _check(ref, _cfg(causal=True),
           call_ref=lambda r, x: r(x, return_embeddings=True),
           call_ours=lambda m, p, x: m.apply(p, x, return_embeddings=True))


def test_macaron_reference_raises_ours_runs():
    """The reference's macaron path is broken: Scale.forward tuple-unpacks
    the FF's plain tensor (x_transformer.py:123-125) and Residual then adds
    a tuple (TypeError).  We implement the intended 0.5-scaled pre-FF; the
    bridge still maps the Scale-nested weights."""
    ref = _build_ref(macaron=True)
    ids = torch.randint(0, VOCAB, (2, SEQ))
    with pytest.raises(TypeError):
        with torch.no_grad():
            ref(ids, return_embeddings=True)

    cfg = _cfg(macaron=True)
    assert cfg.layer_types == tuple(ref.attn_layers.layer_types)
    wcfg = XTWrapperConfig(num_tokens=VOCAB, max_seq_len=SEQ)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_xtransformer(state, wcfg, cfg)
    out = XTransformerWrapper(wcfg, cfg).apply(
        params, jnp.asarray(ids.numpy()), return_embeddings=True)
    assert out.shape == (2, SEQ, DIM) and bool(jnp.isfinite(out).all())


def test_layer_plan_matches_reference():
    """compute_layer_types == the reference's resolved layer_types across
    plan knobs."""
    from ldm.modules.x_transformer import Encoder
    for kw, ours in [
        (dict(), dict()),
        (dict(cross_attend=True), dict(cross_attend=True)),
        (dict(cross_attend=True, only_cross=True),
         dict(cross_attend=True, only_cross=True)),
        (dict(sandwich_coef=2), dict(sandwich_coef=2)),
        (dict(par_ratio=3), dict(par_ratio=3)),
    ]:
        ref = Encoder(dim=DIM, depth=3, heads=HEADS, attn_dim_head=DH, **kw)
        got = compute_layer_types(3, **ours)
        assert got == tuple(ref.layer_types), (kw, got, ref.layer_types)


def test_ti_hook_injection():
    """The embedding_manager hook fires after token lookup, before pos emb
    (x_transformer.py:612-619)."""
    ref = _build_ref()
    cfg, wcfg = _cfg(), XTWrapperConfig(num_tokens=VOCAB, max_seq_len=SEQ)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_xtransformer(state, wcfg, cfg)
    model = XTransformerWrapper(wcfg, cfg)
    ids = np.random.RandomState(3).randint(0, VOCAB, size=(1, SEQ))

    class Mgr(torch.nn.Module):
        def forward(self, tokens, embedded):
            return embedded * 2.0 + 1.0

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids), return_embeddings=True,
                      embedding_manager=Mgr()).numpy()
    ours = model.apply(params, jnp.asarray(ids), return_embeddings=True,
                       inject=lambda t, e: e * 2.0 + 1.0)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4,
                               rtol=2e-4)
