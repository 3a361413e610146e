"""Registry + misc util tests."""
import numpy as np
import pytest

from celebbasis_tpu.utils.registry import instantiate_from_config
from celebbasis_tpu.utils.misc import count_params, log_txt_as_img

pytestmark = pytest.mark.smoke


def test_registry_reference_dataset_target(tmp_path):
    import pickle
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"{i:05d}.png"
        Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                     dtype=np.uint8)).save(p)
        paths.append(str(p))
    with open(tmp_path / "ffhq.pickle", "wb") as f:
        pickle.dump(paths, f)
    ds = instantiate_from_config({
        "target": "ldm.data.face_id.FaceIdDatasetOneShot",
        "params": {"pickle_path": str(tmp_path / "ffhq.pickle"),
                   "num_ids": 2, "repeats": 3, "image_size": 16,
                   "split": "train", "diff_cnt": 0}})
    assert len(ds) == 6
    assert ds[0]["image"].shape == (16, 16, 3)


def test_registry_unknown_ldm_target_raises():
    with pytest.raises(ValueError, match="no registered TPU equivalent"):
        instantiate_from_config({"target": "ldm.models.diffusion.ddpm.Foo"})


def test_registry_identity():
    f = instantiate_from_config({"target": "torch.nn.Identity"})
    assert f(42) == 42


def test_count_params():
    import jax.numpy as jnp
    p = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert count_params(p) == 17


def test_log_txt_as_img():
    out = log_txt_as_img((64, 32), ["hello world", "second caption"])
    assert out.shape == (2, 32, 64, 3)
    assert out.min() >= -1 and out.max() <= 1


def test_all_reference_configs_parse():
    """Every SD config the reference ships must load through our parser —
    including aigc_id_infer.yaml, which violates the reference's own
    commented n_components<=n_samples-1 rule (fine: inference loads the
    basis from disk), and the TI configs (1 placeholder, num_ids absent)."""
    import glob
    import warnings
    from celebbasis_tpu.utils.config import load_run_spec
    files = sorted(glob.glob(
        "/root/reference/configs/stable-diffusion/*.yaml"))
    assert len(files) >= 7
    for f in files:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            spec = load_run_spec([f])
        assert spec.meta_inner_dim > 0
        assert len(spec.initializer_words) in (0, spec.max_ids)
