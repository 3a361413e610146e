"""Coverage for small helpers: prompt templates, fused warp, EMA ctx, misc."""
import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.eval.prompt_templates import get_pos_neg_temps
from celebbasis_tpu.ops.warp import (INSIGHTFACE_TRANS_MATRIX,
                                     affine_warp_resize)
import pytest

pytestmark = pytest.mark.smoke


def test_prompt_template_selection():
    import pytest
    pos, neg = get_pos_neg_temps("exp_action_two.txt")
    assert "two persons" in pos
    pos2, _ = get_pos_neg_temps("exp_action_celeb.txt")
    assert pos2 == pos  # 'celeb' is an action_two key
    pos3, _ = get_pos_neg_temps("exp_pot_sample.txt")
    assert "a photo of {}" in pos3
    assert "{}" in pos and "{}" in pos2 and "{}" in pos3
    with pytest.raises(ValueError):
        get_pos_neg_temps("unknown.txt")


def test_prompt_templates_verbatim_vs_reference():
    """Every (key, pos, neg) triple must equal the reference's exact strings
    (evaluation/prompt_templates.py:1-105) — metric parity depends on it."""
    import importlib.util
    import sys
    spec = importlib.util.spec_from_file_location(
        "ref_prompt_templates",
        "/root/reference/evaluation/prompt_templates.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    for key in ("pot", "style", "example", "single", "tmp", "two", "celeb"):
        ours = get_pos_neg_temps(key)
        theirs = ref.get_pos_neg_temps(key)
        assert ours == theirs, key


def test_fused_warp_close_to_exact():
    """The opt-in fused warp+resize approximates the exact two-stage path."""
    rng = np.random.default_rng(0)
    # smooth image: the filtering difference shrinks with smoothness
    base = rng.standard_normal((9, 9, 3)).astype(np.float32)
    img = jnp.asarray(np.kron(base, np.ones((8, 8, 1), np.float32)))
    exact = affine_warp_resize(img, INSIGHTFACE_TRANS_MATRIX, (24, 24))
    fused = affine_warp_resize(img, INSIGHTFACE_TRANS_MATRIX, (24, 24),
                               fused=True)
    err = np.abs(np.asarray(exact) - np.asarray(fused))
    assert err.mean() < 0.1
    assert exact.shape == fused.shape == (24, 24, 3)


def test_detection_dataclass_roundtrip():
    from celebbasis_tpu.align.faceboxes import Detection
    d = Detection(0.9, 10, 20, 30, 40)
    assert (d.xmin, d.ymin, d.width, d.height) == (10, 20, 30, 40)


def test_manager_reconstruct_matches_numpy():
    from celebbasis_tpu.core import manager as mgr
    from celebbasis_tpu.core.basis import reconstruct
    cfg = mgr.ManagerConfig(placeholder_token_ids=(5,), max_ids=2, num_es=2,
                            heads=1, inner_dim=4, token_dim=8)
    rng = np.random.default_rng(0)
    coeff = rng.standard_normal((2, 1, 4)).astype(np.float32)
    basis = rng.standard_normal((2, 5, 8)).astype(np.float32)
    z_dev = np.asarray(mgr.reconstruct_z(cfg, jnp.asarray(coeff),
                                         jnp.asarray(basis)))
    z_np = reconstruct(coeff, basis)
    np.testing.assert_allclose(z_dev, z_np, atol=1e-5)


def test_cast_float_params_selective():
    from celebbasis_tpu.utils.precision import cast_float_params
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "step": jnp.zeros((), jnp.int32),
            "h": jnp.ones((2,), jnp.bfloat16),
            "scalar": 3}
    out = cast_float_params(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32       # ints untouched
    assert out["h"].dtype == jnp.bfloat16
    assert out["scalar"] == 3                   # non-arrays untouched
    # idempotent
    again = cast_float_params(out)
    assert again["w"].dtype == jnp.bfloat16


def test_bf16_params_close_to_fp32_forward():
    """bf16 *storage* changes outputs only at bf16-rounding scale: the
    compute path already rounds every activation to bf16."""
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    from celebbasis_tpu.utils.precision import cast_float_params
    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_heads=2,
                     num_res_blocks=1, attention_resolutions=(1,),
                     context_dim=16, transformer_depth=1)
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 4)),
                    jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    c = jnp.asarray(np.random.default_rng(1).standard_normal((1, 7, 16)),
                    jnp.float32) * 0.1
    p32 = model.init(jax.random.key(0), x, t, c)
    p16 = cast_float_params(p32)
    y32 = np.asarray(model.apply(p32, x, t, c), np.float32)
    y16 = np.asarray(model.apply(p16, x, t, c), np.float32)
    scale = np.abs(y32).mean() + 1e-6
    assert np.abs(y32 - y16).mean() / scale < 0.05
