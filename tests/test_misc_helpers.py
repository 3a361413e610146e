"""Coverage for small helpers: prompt templates, fused warp, EMA ctx, misc."""
import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.eval.prompt_templates import get_pos_neg_temps
from celebbasis_tpu.ops.warp import (INSIGHTFACE_TRANS_MATRIX,
                                     affine_warp_resize)


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
