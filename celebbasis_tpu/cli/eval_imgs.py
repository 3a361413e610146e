"""Score computation CLI — ``evaluation/eval_imgs.py`` (W4 stage 2).

Walks the generated-eval folder written by ``cli/gen_imgs.py``
(``prompts.txt`` / ``in_image_paths.txt`` / ``in_image_ids.txt`` +
``imgs/{i:05d}_id{id:05d}_{prompt}/``) with the reference's
IDCLIPScoreCalculator loop: CLIP img-img / txt-img similarity, identity
cosine/MSE/L2 through the PIPNet-aligned sphere20 chain, face counts, and
optionally FID against the source folder.  Prints the score table and
writes scores.json.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from celebbasis_tpu.eval.evaluators import (CLIPEvaluator, IdCLIPEvaluator,
                                            IdentityEvaluator,
                                            IDCLIPScoreCalculator,
                                            face_cropper_from_nets)
from celebbasis_tpu.eval.fid import FIDScorer, clip_feature_fn, copy_together
from celebbasis_tpu.eval.sphere import SphereConfig, SphereNet, convert_sphere
from celebbasis_tpu.models.clip_text import CLIPTextConfig
from celebbasis_tpu.models.clip_vit import (CLIPTextTower, CLIPVisionConfig,
                                            CLIPVisionEncoder,
                                            convert_openai_clip)
from celebbasis_tpu.text.tokenizer import default_tokenizer


def build_cropper(detector_ckpt=None, pipnet_ckpt=None, meanface=None,
                  img_size=512, mode="ffhq", seed=0):
    """The reference's get_lmk_model alignment chain for the identity
    scorer (clip_eval.py:142-143); random-init without checkpoints."""
    from celebbasis_tpu.cli.align import _init_detector, _init_landmarker
    detector = _init_detector(detector_ckpt, seed=seed)
    landmarker = _init_landmarker(pipnet_ckpt, meanface, seed=seed)
    return face_cropper_from_nets(detector, landmarker, img_size, mode)


def build_scorers(clip_ckpt=None, sphere_ckpt=None, vocab=None, seed=0,
                  tiny=False, face_cropper=None, img_size=512):
    if tiny:  # toy-sized scorers for functional verification
        vcfg = CLIPVisionConfig.tiny()
        tcfg = CLIPTextConfig.tiny()
    else:
        vcfg = CLIPVisionConfig.vit_b32()
        tcfg = CLIPTextConfig(width=512, layers=12, heads=8, mlp_dim=2048)
    tokenizer = default_tokenizer(vocab)
    if tokenizer.vocab_size != tcfg.vocab_size:
        from celebbasis_tpu.text.tokenizer import CLIPTokenizer
        tokenizer = CLIPTokenizer.synthetic(tcfg.vocab_size)
    vision = CLIPVisionEncoder(vcfg)
    text = CLIPTextTower(tcfg, proj_dim=vcfg.proj_dim)
    rng = jax.random.key(seed)
    if clip_ckpt:
        from celebbasis_tpu.utils.pt_io import load_pt
        state = load_pt(clip_ckpt)
        state = state.get("state_dict", state)
        if any(str(k).startswith("vision_model.") for k in state):
            from celebbasis_tpu.models.clip_vit import convert_hf_clip
            vp, tp = convert_hf_clip(state, vcfg, tcfg)
        else:
            vp, tp = convert_openai_clip(state, vcfg, tcfg)
    else:
        print("[eval] WARNING: no CLIP checkpoint — random weights")
        vp = jax.jit(vision.init)(rng, jnp.zeros(
            (1, vcfg.image_size, vcfg.image_size, 3)))
        tp = jax.jit(text.init)(rng, jnp.zeros((1, 77), jnp.int32))
    clip_eval = CLIPEvaluator(vp, tp, tokenizer, vcfg, tcfg)

    scfg = SphereConfig.tiny() if tiny else SphereConfig.sphere20()
    sphere = SphereNet(scfg)
    if sphere_ckpt:
        from celebbasis_tpu.utils.pt_io import load_pt
        sp = convert_sphere(load_pt(sphere_ckpt), scfg)
    else:
        print("[eval] WARNING: no sphere20 checkpoint — random weights")
        face = 32 if tiny else 112
        sp = jax.jit(sphere.init)(rng, jnp.zeros((1, face, face, 3)))
    id_eval = IdentityEvaluator(sp, face_cropper=face_cropper, cfg=scfg,
                                img_size=img_size,
                                face_size=32 if tiny else 112)
    return IdCLIPEvaluator(clip_eval, id_eval), clip_eval


def main(argv=None):
    # metric fidelity over speed: fp32 matmuls (TPU MXU defaults to bf16
    # multiplication, ~1e-3 noise — fine for generation, not for scoring)
    jax.config.update("jax_default_matmul_precision", "highest")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eval_folder", type=str, required=True,
                   help="gen_imgs output dir (prompts.txt + imgs/)")
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--sphere_ckpt", type=str, default=None)
    p.add_argument("--detector_ckpt", type=str, default=None,
                   help="FaceBoxesV2 weights for the identity cropper; "
                        "omit to score inputs as already-aligned crops")
    p.add_argument("--pipnet_ckpt", type=str, default=None)
    p.add_argument("--meanface", type=str, default=None)
    p.add_argument("--img_size", type=int, default=512,
                   help="identity crop size (clip_eval.py img_size)")
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--fid", action="store_true")
    p.add_argument("--fid_src", type=str, default=None,
                   help="source folder for FID (defaults to the folder of "
                        "in_image_paths.txt's first entry)")
    p.add_argument("--inception_ckpt", type=str, default=None,
                   help="InceptionV3 weights (pytorch-fid pt_inception or "
                        "torchvision inception_v3 .pth): compute the "
                        "canonical Inception-pool3 FID (torch-fidelity "
                        "contract); without it --fid falls back to CLIP-FID")
    p.add_argument("--tiny", action="store_true",
                   help="toy-size scorers (functional verification)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    cropper = None
    if args.detector_ckpt or args.pipnet_ckpt:
        cropper = build_cropper(args.detector_ckpt, args.pipnet_ckpt,
                                args.meanface, args.img_size)
    evaluator, clip_eval = build_scorers(args.clip_ckpt, args.sphere_ckpt,
                                         args.vocab, tiny=args.tiny,
                                         face_cropper=cropper,
                                         img_size=args.img_size)
    calc = IDCLIPScoreCalculator(args.eval_folder, evaluator)
    scores = calc.start_calc()

    if args.fid:
        src_folder = args.fid_src
        if src_folder is None:
            first = calc.dataset.src_img_paths[0][0]
            src_folder = os.path.dirname(first)
        flat = os.path.join(args.eval_folder, "_flat_for_fid")
        copy_together(os.path.join(args.eval_folder, "imgs"), flat)
        if args.inception_ckpt:
            from celebbasis_tpu.eval.inception import load_inception
            feat_fn, _ = load_inception(args.inception_ckpt)
            scores["fid"] = FIDScorer(feat_fn).fid(src_folder, flat)
        else:
            print("[eval] no --inception_ckpt: reporting CLIP-FID "
                  "(not comparable to Inception-FID numbers)")
            scorer = FIDScorer(clip_feature_fn(clip_eval))
            scores["clip_fid"] = scorer.fid(src_folder, flat)

    print(json.dumps(scores, indent=2))
    out = args.out or os.path.join(args.eval_folder, "scores.json")
    with open(out, "w") as f:
        json.dump(scores, f, indent=2)
    print(f"[eval_imgs] wrote {out}")
    return scores


if __name__ == "__main__":
    main()
