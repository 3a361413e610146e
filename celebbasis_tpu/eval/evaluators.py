"""Quantitative evaluators — CLIP similarity, identity cosine, aggregation.

Parity targets (`/root/reference/evaluation/`):
* ``CLIPEvaluator`` (clip_eval.py:20-77): ViT-B/32 image-image and text-image
  cosine similarities over normalized features;
* ``IdentityEvaluator`` (clip_eval.py:134-259): PIPNet-aligned FFHQ crop ->
  fixed insightface affine -> 112² -> sphere20 CosFace features -> pairwise
  cosine / MSE / L2, with has-face / no-face counting;
* ``IdCLIPEvaluator`` (clip_eval.py:262-280) combining both;
* ``IDCLIPScoreCalculator`` (base_class.py:357-402) walking a generated
  dataset and aggregating mean scores.

All feature extractors are jitted; batches stream through fixed shapes.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.eval.sphere import SphereConfig, SphereNet
from celebbasis_tpu.models.clip_text import CLIPTextConfig
from celebbasis_tpu.models.clip_vit import (CLIPTextTower, CLIPVisionConfig,
                                            CLIPVisionEncoder,
                                            preprocess_images)
from celebbasis_tpu.ops.warp import (INSIGHTFACE_TRANS_MATRIX,
                                     batched_affine_warp_resize)
from celebbasis_tpu.text.tokenizer import CLIPTokenizer


def _norm(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


class CLIPEvaluator:
    """img-img and txt-img similarity on the shared CLIP space."""

    def __init__(self, vision_params, text_params, tokenizer: CLIPTokenizer,
                 vision_cfg: CLIPVisionConfig = CLIPVisionConfig.vit_b32(),
                 text_cfg: Optional[CLIPTextConfig] = None):
        text_cfg = text_cfg or CLIPTextConfig(width=512, layers=12, heads=8,
                                              mlp_dim=2048)
        self.tokenizer = tokenizer
        self.vision = CLIPVisionEncoder(vision_cfg)
        self.text = CLIPTextTower(text_cfg, proj_dim=vision_cfg.proj_dim)
        self.vp, self.tp = vision_params, text_params
        self.size = vision_cfg.image_size
        self._img_fn = jax.jit(lambda p, x: self.vision.apply(p, x))
        self._txt_fn = jax.jit(lambda p, t: self.text.apply(p, t))

    def image_features(self, images_minus1_1: np.ndarray) -> np.ndarray:
        x = preprocess_images(images_minus1_1, self.size)
        return _norm(np.asarray(self._img_fn(self.vp, jnp.asarray(x))))

    def text_features(self, texts: Sequence[str]) -> np.ndarray:
        toks = jnp.asarray(self.tokenizer(list(texts)))
        return _norm(np.asarray(self._txt_fn(self.tp, toks)))

    def img_to_img_similarity(self, src_images, generated_images) -> float:
        a = self.image_features(src_images)
        b = self.image_features(generated_images)
        return float((a @ b.T).mean())

    def txt_to_img_similarity(self, text: str, generated_images) -> float:
        t = self.text_features([text])
        i = self.image_features(generated_images)
        return float((t @ i.T).mean())


@dataclass
class IdentityScores:
    cosine: float
    mse: float
    l2: float
    has_face: int
    no_face: int


class IdentityEvaluator:
    """Face-identity similarity via sphere20 CosFace on aligned crops.

    ``face_cropper`` is a callable (image_rgb_uint8) -> 512² FFHQ crop or
    None (no face).  The crop is then mapped through the fixed insightface
    affine (the same trans_matrix + 112 resize as the training path,
    clip_eval.py:158-166) and embedded.
    """

    def __init__(self, sphere_params, face_cropper=None,
                 cfg: SphereConfig = SphereConfig.sphere20(),
                 face_size: int = 112):
        self.net = SphereNet(cfg)
        self.params = sphere_params
        self.face_cropper = face_cropper
        self.face_size = face_size
        self._embed = jax.jit(self._embed_fn)

    def _embed_fn(self, params, crops):
        faces = batched_affine_warp_resize(crops, INSIGHTFACE_TRANS_MATRIX,
                                           (self.face_size, self.face_size))
        return self.net.apply(params, faces)

    def embed_crops(self, crops_minus1_1: np.ndarray) -> np.ndarray:
        return np.asarray(self._embed(self.params,
                                      jnp.asarray(crops_minus1_1)))

    def evaluate(self, src_images: np.ndarray, gen_images: np.ndarray
                 ) -> IdentityScores:
        """Images in [-1,1]; uses the face_cropper when set, else assumes the
        inputs are already FFHQ-style crops."""
        def prep(imgs):
            if self.face_cropper is None:
                return imgs, 0
            crops, missing = [], 0
            for img in imgs:
                u8 = ((img + 1) * 127.5).clip(0, 255).astype(np.uint8)
                crop = self.face_cropper(u8)
                if crop is None:
                    missing += 1
                else:
                    crops.append(crop.astype(np.float32) / 127.5 - 1.0)
            return (np.stack(crops) if crops else
                    np.zeros((0,) + imgs.shape[1:], np.float32)), missing

        src, miss_s = prep(src_images)
        gen, miss_g = prep(gen_images)
        if len(src) == 0 or len(gen) == 0:
            return IdentityScores(0.0, 0.0, 0.0, 0, miss_s + miss_g)
        fa, fb = self.embed_crops(src), self.embed_crops(gen)
        na, nb = _norm(fa), _norm(fb)
        cos = float((na @ nb.T).mean())
        diff = fa[:, None] - fb[None]
        mse = float((diff ** 2).mean())
        l2 = float(np.sqrt((diff ** 2).sum(-1)).mean())
        return IdentityScores(cos, mse, l2, len(gen), miss_s + miss_g)


class IdCLIPEvaluator:
    """CLIP + identity metrics together (clip_eval.py:262-280)."""

    def __init__(self, clip_eval: CLIPEvaluator, id_eval: IdentityEvaluator):
        self.clip = clip_eval
        self.id = id_eval

    def evaluate(self, src_images, gen_images, text: str) -> Dict[str, float]:
        ids = self.id.evaluate(src_images, gen_images)
        return {
            "clip_img_img": self.clip.img_to_img_similarity(src_images,
                                                            gen_images),
            "clip_txt_img": self.clip.txt_to_img_similarity(text, gen_images),
            "id_cosine": ids.cosine,
            "id_mse": ids.mse,
            "id_l2": ids.l2,
            "has_face": ids.has_face,
            "no_face": ids.no_face,
        }


class IDCLIPScoreCalculator:
    """Walk a generated-eval folder tree and aggregate mean scores
    (base_class.py:357-402).

    Layout contract: ``<root>/<prompt_dir>/<i:05d>_id<j>_*.jpg`` for generated
    images; source images come from a {id -> image} mapping.
    """

    def __init__(self, evaluator: IdCLIPEvaluator,
                 src_images_by_id: Dict[int, np.ndarray]):
        self.evaluator = evaluator
        self.src = src_images_by_id

    @staticmethod
    def parse_id(filename: str) -> Optional[int]:
        base = os.path.basename(filename)
        for part in base.split("_"):
            if part.startswith("id") and part[2:].split(".")[0].isdigit():
                return int(part[2:].split(".")[0])
        return None

    def start_calc(self, root: str, prompt_of_dir=lambda d: d
                   ) -> Dict[str, float]:
        from PIL import Image
        totals: Dict[str, float] = {}
        n = 0
        for prompt_dir in sorted(os.listdir(root)):
            full = os.path.join(root, prompt_dir)
            if not os.path.isdir(full):
                continue
            by_id: Dict[int, List[np.ndarray]] = {}
            for f in sorted(os.listdir(full)):
                if not f.lower().endswith((".jpg", ".png", ".jpeg")):
                    continue
                idx = self.parse_id(f)
                if idx is None or idx not in self.src:
                    continue
                arr = np.asarray(Image.open(os.path.join(full, f))
                                 .convert("RGB"), np.float32) / 127.5 - 1.0
                by_id.setdefault(idx, []).append(arr)
            for idx, gen_list in by_id.items():
                scores = self.evaluator.evaluate(
                    self.src[idx][None] if self.src[idx].ndim == 3
                    else self.src[idx],
                    np.stack(gen_list), prompt_of_dir(prompt_dir))
                for k, v in scores.items():
                    totals[k] = totals.get(k, 0.0) + v
                n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}
