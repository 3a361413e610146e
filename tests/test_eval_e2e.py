"""End-to-end W4 loop: gen_imgs -> eval_imgs (+ build_basis) on tiny config."""
import glob
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "tiny.yaml")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("w4")
    src = d / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(src / f"00000_id{i}_#0.jpg")
    prompts = d / "prompts_single.txt"  # name keys the action_single templates
    prompts.write_text("a photo of a sks person\n")
    return d


def test_build_basis_cli(workdir, tmp_path):
    from celebbasis_tpu.cli import build_basis
    out = str(tmp_path / "celeb_basis.pt")
    build_basis.main(["--config", CFG, "--out", out])
    from celebbasis_tpu.utils.pt_io import load_pt
    basis = np.asarray(load_pt(out))
    assert basis.shape == (2, 9, 64)  # es=2, 1+8 components, width 64


def test_gen_then_eval(workdir):
    from celebbasis_tpu.cli import eval_imgs, gen_imgs
    from celebbasis_tpu.core import manager as mgr
    from celebbasis_tpu.loader import assemble
    from celebbasis_tpu.utils.config import load_run_spec

    # make a checkpoint to sample from (random coefficients)
    spec = load_run_spec([CFG])
    asm = assemble(spec, image_size=32)
    ckpt = str(workdir / "embeddings_gs-1.pt")
    mgr.save_checkpoint(asm.pipeline.manager_cfg, asm.manager_state, ckpt)

    gen_root = str(workdir / "gen")
    gen_imgs.main([
        "--config", CFG, "--embedding_path", ckpt,
        "--from-file", str(workdir / "prompts_single.txt"),
        "--outdir", gen_root, "--ids", "0", "1", "--n_samples", "2",
        "--ddim_steps", "3", "--H", "32",
        "--src_folder", str(workdir / "src"),
    ])
    # reference eval-folder contract: txt files + imgs/{i:05d}_id{j:05d}_...
    for txt in ("prompts.txt", "in_image_paths.txt", "in_image_ids.txt"):
        assert os.path.exists(os.path.join(gen_root, txt)), txt
    imgs = glob.glob(os.path.join(gen_root, "imgs", "*", "*.jpg"))
    assert len(imgs) == 4  # 1 prompt x 2 id-pairs x 2 samples
    folders = sorted(os.listdir(os.path.join(gen_root, "imgs")))
    assert folders[0].startswith("00000_id00000_")

    scores = eval_imgs.main([
        "--eval_folder", gen_root, "--tiny", "--fid",
    ])
    for key in ("image_sim", "text_sim", "id_cos_sim", "num_has_face",
                "clip_fid"):
        assert key in scores, key
        assert np.isfinite(scores[key])
    assert scores["n_items"] == 2
    assert os.path.exists(os.path.join(gen_root, "scores.json"))
    with open(os.path.join(gen_root, "scores.json")) as f:
        assert json.load(f).keys() == scores.keys()
