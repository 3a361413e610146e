"""Round-2 hardening tests: gradient accumulation, soft-NMS fallback,
basis dedup parity (the reference's rm_repeats is a no-op), reg-loss
semantics, placeholder single-token contract, meanface empty-list guard,
and the pt_io unpickler whitelist."""
import io
import pickle
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.align import nms as nms_mod
from celebbasis_tpu.align.pipnet import meanface_indices
from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.basis import BasisConfig, collect_column_embeddings
from celebbasis_tpu.text.tokenizer import CLIPTokenizer, token_for_string


# -- gradient accumulation ---------------------------------------------------

def _tiny_training(accumulate: int):
    from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
    from celebbasis_tpu.core.basis import build_celeb_basis
    from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
    from celebbasis_tpu.train import step as tstep

    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = PipelineConfig.tiny()
    pipe = CelebBasisPipeline(cfg, tok)
    params = pipe.init_params(jax.random.key(0), image_size=32)
    meta_cfg = MetaNetConfig.tiny()
    meta_cfg = type(meta_cfg)(**{**meta_cfg.__dict__,
                                 "inner_dim": cfg.basis.n_components,
                                 "token_dim": cfg.clip.width})
    meta = MetaIdNet(meta_cfg, dtype=jnp.float32)
    faces0 = jnp.zeros((1, meta_cfg.face_size, meta_cfg.face_size, 3))
    basis0 = jnp.zeros((cfg.basis.num_embeds_per_token,
                        1 + cfg.basis.n_components, cfg.clip.width))
    meta_params = jax.jit(meta.init)(jax.random.key(1), faces0,
                                     jnp.zeros((1,), jnp.int32), basis0)
    trainable, meta_frozen = tstep.split_meta_params(meta_params)
    basis = jnp.asarray(build_celeb_basis(
        ["Anne Hathaway", "Elon Musk"], tok, pipe.token_table(params),
        cfg.basis))
    frozen = {"unet": params["unet"], "vae": params["vae"],
              "clip": params["clip"], "meta_frozen": meta_frozen}
    opt = tstep.make_optimizer(1e-2, accumulate=accumulate)
    step_fn = jax.jit(tstep.make_train_step(pipe, meta, opt))
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(2))
    state = tstep.init_train_state(jax.random.key(3), trainable, opt, mstate)

    rng = np.random.default_rng(0)
    B, k, fs = 2, 2, meta_cfg.face_size
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (B, 32, 32, 3)), jnp.float32),
        "tokens": jnp.asarray(tok(["a photo of a sks person"] * B)),
        "faces": jnp.asarray(rng.uniform(-1, 1, (B, k, fs, fs, 3)),
                             jnp.float32),
        "ids": jnp.asarray([[0, 0], [0, 0]], jnp.int32),
        "num_ids": jnp.ones((B,), jnp.int32),
    }
    return step_fn, state, frozen, basis, batch


def test_grad_accumulation_multisteps():
    """accumulate=k over k identical micro-batches (same rng) must equal one
    un-accumulated step on that batch: the running-mean of identical grads is
    the grad, and the AdamW update fires only on the boundary
    (main_id_embed.py:778-782 / Lightning accumulate_grad_batches)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # synthetic-vocab placeholder warning
        step1, state1, frozen, basis, batch = _tiny_training(accumulate=1)
        step2, state2, *_ = _tiny_training(accumulate=2)

    p0 = jax.tree.map(np.asarray, state1.trainable)
    state1 = state1._replace(rng=jax.random.key(7))
    state1, _ = step1(state1, frozen, basis, batch)
    ref = jax.tree.map(np.asarray, state1.trainable)

    # micro-step 1: grads accumulate, params must NOT move
    state2 = state2._replace(rng=jax.random.key(7))
    state2, _ = step2(state2, frozen, basis, batch)
    mid = jax.tree.map(np.asarray, state2.trainable)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, mid)
    # micro-step 2: boundary -> one AdamW update with the mean grad
    state2 = state2._replace(rng=jax.random.key(7))
    state2, _ = step2(state2, frozen, basis, batch)
    acc = jax.tree.map(np.asarray, state2.trainable)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 ref, acc)
    # and the update actually moved something
    moved = sum(float(np.abs(a - b).sum()) for a, b in
                zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(acc)))
    assert moved > 0


def test_trainer_accumulate_lr_and_counting():
    """effective_lr keeps the reference scaling and the trainer's save()
    names checkpoints by optimizer step, not micro step."""
    from celebbasis_tpu.train.trainer import TrainerConfig, effective_lr
    cfg = TrainerConfig(accumulate=4, batch_size=2, base_lr=5e-3,
                        n_data_shards=1)
    assert effective_lr(cfg) == pytest.approx(4 * 2 * 5e-3)


# -- soft-NMS fallback --------------------------------------------------------

@pytest.mark.parametrize("method", [0, 1, 2])
def test_soft_nms_numpy_matches_native(method):
    rng = np.random.default_rng(42)
    n = 60
    x1 = rng.uniform(0, 80, n); y1 = rng.uniform(0, 80, n)
    dets = np.stack([x1, y1, x1 + rng.uniform(10, 40, n),
                     y1 + rng.uniform(10, 40, n),
                     rng.uniform(0.1, 1.0, n)], axis=1).astype(np.float32)
    out_np = nms_mod.soft_nms_numpy(dets, method=method)
    if nms_mod._lib() is None:
        pytest.skip("native library unavailable")
    out_native = nms_mod.soft_nms(dets, method=method)
    assert out_np.shape == out_native.shape
    np.testing.assert_allclose(out_np, out_native, rtol=1e-5, atol=1e-5)


# -- basis dedup parity -------------------------------------------------------

def test_basis_keeps_duplicate_tokens_like_reference():
    """The reference's rm_repeats token dedup is an effective no-op (tensor
    id-hashing, modules.py:522-538): duplicate-token embeddings are all kept."""
    tokens = np.array([[0, 5, 7, 1023],
                       [0, 5, 8, 1023],
                       [0, 6, 7, 1023]], np.int64)   # col1 has dup token 5
    embeds = np.arange(3 * 4 * 2, dtype=np.float32).reshape(3, 4, 2)
    cfg = BasisConfig(special_id_threshold=1000, rm_repeats=True)
    cols = collect_column_embeddings(tokens, embeds, cfg)
    assert cols[1].shape[0] == 3          # duplicates kept (parity)
    cfg_dedup = BasisConfig(special_id_threshold=1000, rm_repeats=True,
                            true_dedup=True)
    cols_d = collect_column_embeddings(tokens, embeds, cfg_dedup)
    assert cols_d[1].shape[0] == 2        # intended dedup available opt-in
    # flatten branch
    cfg_f = BasisConfig(special_id_threshold=1000, use_flatten=True)
    flat = collect_column_embeddings(tokens, embeds, cfg_f)
    assert flat[0].shape[0] == 9          # all non-special, dups kept


# -- reg-loss semantics --------------------------------------------------------

@pytest.mark.parametrize("loss_type,p", [("l1_reg", 1), ("l2_reg", 2)])
def test_coefficient_reg_loss_matches_torch_norm(loss_type, p):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    cef = rng.normal(size=(6, 2, 1, 8)).astype(np.float32)  # (N',es,h,inner)
    ours = float(mgr.coefficient_reg_loss(loss_type, jnp.asarray(cef)))
    ref = float(torch.norm(torch.from_numpy(cef), dim=1, p=p).mean() * 1e-6)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


# -- placeholder single-token contract -----------------------------------------

def test_token_for_string_contract():
    # synthetic vocab registers whole words -> single-token contract holds
    tok = CLIPTokenizer.synthetic(size=1024)
    assert token_for_string(tok, "sks") == tok.tokenize("sks")[0]
    # a real (merge-free) vocab leaves 'sks' multi-token -> hard error
    tok2 = CLIPTokenizer.synthetic(size=1024)
    tok2.is_synthetic = False             # emulate a real vocab w/o merges
    with pytest.raises(ValueError, match="single-token"):
        token_for_string(tok2, "sks")
    ids = tok2.tokenize("a")
    if len(ids) == 1:
        assert token_for_string(tok2, "a") == ids[0]


# -- meanface empty-reverse-list guard ------------------------------------------

def test_meanface_empty_reverse_list_masked():
    # 3 mutually-close points + 1 outlier; num_nb=1: the outlier's nearest is
    # in the cluster but nothing points back at it -> empty reverse list
    meanface = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1],
                         [10.0, 10.0]])
    ri1, ri2, max_len = meanface_indices(meanface, num_nb=1)
    assert (ri1[3] == -1).all()           # masked row, no crash
    assert (ri1[:2] >= 0).all()           # cluster rows stay valid
    # decode with the mask: outlier landmark keeps its own prediction
    from celebbasis_tpu.align.pipnet import PIPNetConfig, decode_landmarks
    L, g, nb = 4, 4, 1
    cfg = PIPNetConfig(num_lms=L, num_nb=nb, input_size=32, net_stride=8)
    rng = np.random.default_rng(0)
    outs = (jnp.asarray(rng.normal(size=(1, g, g, L)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, g, g, L)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, g, g, L)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, g, g, L * nb)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, g, g, L * nb)), jnp.float32))
    lms = decode_landmarks(outs, cfg, jnp.asarray(ri1), jnp.asarray(ri2))
    assert np.isfinite(np.asarray(lms)).all()
    # landmark 3's merge average is exactly its own prediction
    cls, ox, oy = (np.asarray(o) for o in outs[:3])
    grid = cfg.input_size / cfg.net_stride
    cf = cls.transpose(0, 3, 1, 2).reshape(1, L, g * g)
    mi = int(cf[0, 3].argmax())
    own_x = (mi % g + ox.transpose(0, 3, 1, 2).reshape(1, L, g * g)[0, 3, mi]) / grid
    np.testing.assert_allclose(float(lms[0, 3, 0]), own_x, rtol=1e-5)


# -- pt_io unpickler whitelist ---------------------------------------------------

def test_pt_io_rejects_arbitrary_globals(tmp_path):
    from celebbasis_tpu.utils import pt_io

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    path = tmp_path / "evil.pt"
    with open(path, "wb") as f:
        pickle.dump(Evil(), f, protocol=2)
    with pytest.raises(pickle.UnpicklingError, match="whitelist"):
        pt_io.load_pt(str(path))


def test_pt_io_roundtrip_still_works(tmp_path):
    from celebbasis_tpu.utils import pt_io
    obj = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
           "nested": {"b": np.ones((3,), np.float16)}}
    p = str(tmp_path / "ok.pt")
    pt_io.save_pt(obj, p)
    back = pt_io.load_pt(p)
    np.testing.assert_array_equal(back["a"], obj["a"])
    np.testing.assert_array_equal(back["nested"]["b"], obj["nested"]["b"])


def test_l2_normalize_grad_safe_at_zero():
    """jnp.linalg.norm's grad at 0 is NaN; torch F.normalize's is finite.
    The dryrun's zero-face batch hit this through the FR-feature norm
    (round-2 multi-step hardening found trainables going NaN at step 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from celebbasis_tpu.ops.basic import l2_normalize

    x = jnp.zeros((3, 4))
    y, vjp = jax.vjp(lambda a: l2_normalize(a, axis=-1), x)
    assert np.isfinite(np.asarray(y)).all()
    (gx,) = vjp(jnp.ones_like(y))
    assert np.isfinite(np.asarray(gx)).all(), "NaN grad at zero vector"
    # non-degenerate inputs unchanged: matches x / max(||x||, eps)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
    want = np.asarray(a) / np.maximum(
        np.linalg.norm(np.asarray(a), axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(np.asarray(l2_normalize(a)), want, rtol=1e-6)
