"""End-to-end CLI tests: train -> txt2img -> extract on the tiny config.

This is the W2 -> W3 -> export loop of the reference
(01_start_train.sh / 02_start_test.sh / 03_extract.sh) driven through our
CLIs on toy shapes.
"""
import glob
import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    data = d / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = data / f"{i:05d}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(p)
        paths.append(str(p))
    with open(data / "ffhq.pickle", "wb") as f:
        pickle.dump(paths, f)
    return d


def test_train_txt2img_extract(workdir):
    from celebbasis_tpu.cli import extract, train, txt2img

    cfg = os.path.join(REPO, "configs", "tiny.yaml")
    run_dir = train.main([
        "--base", cfg, "--name", "tinytest",
        "--logdir", str(workdir / "logs"),
        "--data_root", str(workdir / "data"),
        "--image_size", "32", "--face_size", "32",
        "--max_steps", "6",
    ])
    ckpts = sorted(glob.glob(os.path.join(run_dir, "checkpoints", "*.pt")))
    assert ckpts, "no checkpoints written"
    final = os.path.join(run_dir, "checkpoints", "embeddings_gs-6.pt")
    assert os.path.exists(final)
    # metrics jsonl written
    assert os.path.getsize(os.path.join(run_dir, "metrics.jsonl")) > 0

    outdir = str(workdir / "samples")
    txt2img.main([
        "--config", cfg, "--embedding_path", final,
        "--prompt", "a photo of a sks person", "--outdir", outdir,
        "--ddim_steps", "4", "--n_samples", "2", "--H", "32", "--W", "32",
        "--ids", "0",
    ])
    imgs = glob.glob(os.path.join(outdir, "*", "*.jpg"))
    assert len(imgs) >= 2
    arr = np.asarray(Image.open(imgs[0]))
    assert arr.shape == (32, 32, 3)

    exdir = str(workdir / "extracted")
    extract.main(["--config", cfg, "--embedding_path", final,
                  "--outdir", exdir])
    assert os.path.exists(os.path.join(exdir, "celeb_basis.pt"))
    assert os.path.exists(os.path.join(exdir, "id_embedding_0.pt"))
    assert os.path.exists(os.path.join(exdir, "id_coefficient_3.pt"))
    # exported embedding must equal coeff · P + mean
    from celebbasis_tpu.utils.pt_io import load_pt
    from celebbasis_tpu.core.basis import reconstruct
    basis = np.asarray(load_pt(os.path.join(exdir, "celeb_basis.pt")))
    coeff = np.asarray(load_pt(os.path.join(exdir, "id_coefficient_0.pt")))
    emb = np.asarray(load_pt(os.path.join(exdir, "id_embedding_0.pt")))
    np.testing.assert_allclose(reconstruct(coeff, basis), emb, atol=1e-5)


def test_txt2img_live_faces(workdir):
    """--faces: one-shot live-face conditioning (test_mode='image') — no
    trained coefficients needed (stable_txt2img.py:271-318)."""
    from celebbasis_tpu.cli import txt2img

    cfg = os.path.join(REPO, "configs", "tiny.yaml")
    face_paths = sorted(glob.glob(str(workdir / "data" / "*.png")))[:2]
    outdir = str(workdir / "face_samples")
    txt2img.main([
        "--config", cfg,
        "--prompt", "a photo of sks person and ks person",
        "--outdir", outdir, "--faces", face_paths[0], face_paths[1],
        "--ddim_steps", "2", "--n_samples", "2", "--H", "32", "--W", "32",
    ])
    imgs = glob.glob(os.path.join(outdir, "*", "0000*.jpg"))
    assert len(imgs) >= 2
    assert np.asarray(Image.open(imgs[0])).shape == (32, 32, 3)


def test_faces_injection_equals_live_meta_forward(workdir):
    """The faces path must inject exactly the rows of a live MetaIdNet
    forward (embedding_manager.py:452-481 image branch)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from celebbasis_tpu.core import manager as mgr
    from celebbasis_tpu.core.meta_net import MetaIdNet
    from celebbasis_tpu.loader import assemble
    from celebbasis_tpu.models.clip_text import CLIPTextEncoder
    from celebbasis_tpu.utils.config import load_run_spec

    cfg = os.path.join(REPO, "configs", "tiny.yaml")
    spec = load_run_spec([cfg])
    asm = assemble(spec, image_size=32, dtype=jnp.float32)
    B, k, fs = 2, 2, 32
    rng = np.random.default_rng(1)
    faces = jnp.asarray(rng.uniform(-1, 1, (B, k, fs, fs, 3)), jnp.float32)
    ids = jnp.zeros((B, k), jnp.int32)
    num_ids = jnp.full((B,), 2, jnp.int32)
    # hand-built token row: placeholders at known positions (synthetic-vocab
    # tokenization of real words is multi-token, so don't rely on it here)
    ph = asm.pipeline.manager_cfg.placeholder_token_ids
    L = asm.pipeline.cfg.clip.max_length
    row = np.full((L,), asm.tokenizer.eot_id, np.int32)
    row[0] = asm.tokenizer.sot_id
    row[1], row[2], row[3], row[4], row[5] = 10, ph[0], 11, ph[1], 12
    tokens = jnp.asarray(np.tile(row, (B, 1)))

    pred_z, _ = asm.meta_net.apply(asm.meta_params, faces, ids, asm.basis,
                                   method=MetaIdNet.multi_faces)
    m_cfg = dataclasses.replace(asm.pipeline.manager_cfg, test_mode="image")
    embeds = asm.pipeline.clip.apply(asm.params["clip"], tokens,
                                     method=CLIPTextEncoder.token_embed)
    new_embeds = mgr.test_inject(m_cfg, None, asm.basis, tokens, embeds,
                                 ids, num_ids, pred_z=pred_z)
    # check the injected rows at the known placeholder positions
    reps = m_cfg.reps
    out = np.asarray(new_embeds[0])
    zs = np.asarray(pred_z[0])          # (k, reps, D)
    pos0, pos1 = 2, 4
    np.testing.assert_allclose(out[pos0:pos0 + reps], zs[0], atol=1e-5)
    # second placeholder shifts right by (reps-1) after the first expansion
    shifted = pos1 + (reps - 1)
    np.testing.assert_allclose(out[shifted:shifted + reps], zs[1], atol=1e-5)


def test_train_cached_latents(workdir):
    """--cache_latents CLI path: trainer precomputes frozen features."""
    from celebbasis_tpu.cli import train

    cfg = os.path.join(REPO, "configs", "tiny.yaml")
    run_dir = train.main([
        "--base", cfg, "--name", "cachetest",
        "--logdir", str(workdir / "logs_cached"),
        "--data_root", str(workdir / "data"),
        "--image_size", "32", "--face_size", "32",
        "--max_steps", "6", "--cache_latents", "2",
    ])
    assert os.path.exists(os.path.join(run_dir, "checkpoints",
                                       "embeddings_gs-6.pt"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        lines = f.read().strip().splitlines()
    assert lines, "no metrics logged"


def test_train_cached_with_mesh(workdir):
    """--cache_latents combined with --mesh: cached batches are sharded."""
    from celebbasis_tpu.cli import train

    cfg = os.path.join(REPO, "configs", "tiny.yaml")
    run_dir = train.main([
        "--base", cfg, "--name", "cachemesh",
        "--logdir", str(workdir / "logs_cm"),
        "--data_root", str(workdir / "data"),
        "--image_size", "32", "--face_size", "32",
        "--max_steps", "4", "--cache_latents", "2", "--mesh", "2",
    ])
    assert os.path.exists(os.path.join(run_dir, "checkpoints",
                                       "embeddings_gs-4.pt"))


def test_train_ti_cli(workdir):
    """TI training CLI end-to-end on the tiny config (the reference's
    textual_train.sh path): 3 steps, checkpoint written, loadable."""
    from celebbasis_tpu.cli import train_ti
    from celebbasis_tpu.core.textual_inversion import load_ti_checkpoint

    logdir = str(workdir / "ti_logs")
    train_ti.main(["--base", os.path.join(REPO, "configs", "tiny.yaml"),
                   "--data_root", str(workdir / "data"),
                   "--max_steps", "3", "--image_size", "32",
                   "--logdir", logdir, "--name", "ti_e2e"])
    ckpts = glob.glob(os.path.join(logdir, "*ti_e2e*", "checkpoints", "*.pt"))
    assert ckpts, f"no TI checkpoint under {logdir}"
    loaded = load_ti_checkpoint(ckpts[0])
    assert "*" in loaded
