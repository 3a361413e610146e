"""FaceId training dataset — pickle contract, captions, augmentation.

Behavior parity with `/root/reference/ldm/data/face_id.py` (FaceIdDataset
StyleGAN3/OneShot/E4T/Nobody families):

* the W0 stage emits a pickle holding a flat list of absolute image paths;
  identity = file basename, one id per file for the one-shot datasets
  (face_id.py:556-575);
* ``num_ids``/``specific_ids``/``images_per_id``/``repeats`` select and tile
  the training list (face_id.py:515-521);
* per-example augmentation: resize-512, random hflip, color jitter
  (brightness/contrast/saturation 0.8-1.2, hue 0.01), normalize to [-1,1];
* the training image gets a random-scale paste onto a black (-1) background
  (``_add_bg``, scale U[0.1,1.0], face_id.py:713-730); the two-person
  ``_mix_two_tensors`` composition exists behind ``dual_prob`` (the
  reference's dual branch is dead code — ``np.random.randint(10) < 50`` is
  always true ⇒ single-person — so the default here is 0.0, SURVEY §2.1);
* ``faces``: the (1 + diff_cnt + 1 + diff_cnt) face crops per example that
  feed MetaIdNet, with their ids; caption from CLIP-style templates around
  'face of <placeholder> person' (face_id.py:598-644).

Pure numpy/PIL — no torch; a thread-prefetching loader feeds jit steps.
"""
from __future__ import annotations

import os
import pickle
import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

# CLIP-style prompt templates (same role as the textual-inversion template
# bank, face_id.py:13-156).
TEMPLATES_SMALLEST = ["a photo of a {}"]

TEMPLATES_SMALL = [
    "a photo of a {}",
    "a rendering of a {}",
    "a cropped photo of the {}",
    "the photo of a {}",
    "a photo of a clean {}",
    "a photo of a dirty {}",
    "a dark photo of the {}",
    "a photo of my {}",
    "a photo of the cool {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a cropped photo of a {}",
    "a photo of the {}",
    "a good photo of the {}",
    "a photo of one {}",
    "a close-up photo of the {}",
    "a rendition of the {}",
    "a photo of the clean {}",
    "a rendition of a {}",
    "a photo of a nice {}",
    "a good photo of a {}",
    "a photo of the nice {}",
    "a photo of the small {}",
    "a photo of the weird {}",
    "a photo of the large {}",
    "a photo of a cool {}",
    "a photo of a small {}",
]

TEMPLATES_DUAL = [
    "a photo of a {} and a {}",
    "a rendering of a {} and a {}",
    "a cropped photo of a {} and a {}",
    "the photo of a {} with a {}",
    "a dark photo of a {} and a {}",
    "a close-up photo of a {} and a {}",
    "a bright photo of a {} and a {}",
]

# single-sourced with the tokenizer's primed pseudo-words (aigc_id.yaml list)
from celebbasis_tpu.text.tokenizer import PLACEHOLDER_WORDS as PLACEHOLDER_STRINGS


# -- torchvision-functional color ops (PIL backend) ---------------------------
# Exact math of torchvision.transforms.functional's PIL path, which is what
# the reference's ColorJitter executes (it runs before ToTensor,
# reference face_id.py:526-532).

def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    from PIL import ImageEnhance
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    from PIL import ImageEnhance
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    from PIL import ImageEnhance
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """HSV round-trip with uint8 wraparound on the H channel — torchvision
    F_pil.adjust_hue semantics (shift = trunc(hue_factor*255) mod 256)."""
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError(f"hue_factor {hue_factor} not in [-0.5, 0.5]")
    h, s, v = img.convert("HSV").split()
    np_h = np.asarray(h, np.uint8)
    np_h = ((np_h.astype(np.int16) + int(hue_factor * 255)) % 256
            ).astype(np.uint8)
    return Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)
                       ).convert("RGB")


@dataclass
class FaceIdDatasetConfig:
    pickle_path: str
    num_ids: int = 10
    specific_ids: Optional[Sequence[int]] = None
    images_per_id: int = 1
    image_size: int = 512
    repeats: int = 100
    flip_p: float = 0.5
    split: str = "train"
    diff_cnt: int = 0
    dual_prob: float = 0.0     # the reference's dual branch is dead (always 0)
    reg_ids: int = 0
    reg_repeats: int = 0
    seed: int = 0


def parse_specific_ids(spec) -> Optional[List[int]]:
    """'3-7' -> [3,4,5,6]; lists pass through (face_id.py:491-497)."""
    if spec is None or isinstance(spec, (list, tuple)):
        return list(spec) if spec is not None else None
    lo, hi = (int(x) for x in str(spec).split("-"))
    return list(range(lo, hi))


class FaceIdDataset:
    def __init__(self, cfg: FaceIdDatasetConfig):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.img_dict: Dict[int, Dict] = {}
        self._load_from_pickle()
        n_train_imgs = cfg.num_ids * cfg.images_per_id
        self._length = n_train_imgs * cfg.repeats
        self.num_train = self._length

    def _load_from_pickle(self):
        cfg = self.cfg
        with open(cfg.pickle_path, "rb") as f:
            paths = pickle.load(f)
        by_id: Dict[str, List[str]] = {}
        if paths and isinstance(paths[0], (tuple, list)):
            # VGG-style pickle: (path, quality) tuples, identity = parent dir,
            # best-quality images first (reference FaceIdDatasetVGG,
            # face_id.py:282-296)
            for p, _iqa in sorted(paths, key=lambda x: x[1], reverse=True):
                key = os.path.basename(os.path.dirname(p))
                by_id.setdefault(key, []).append(p)
        else:
            # one-shot pickle: flat path list, identity = file basename
            for p in paths:
                key = os.path.basename(p).split(".")[0]
                by_id.setdefault(key, []).append(p)
        spec = parse_specific_ids(cfg.specific_ids)
        walk, use = 0, 0
        for key, images in by_id.items():
            if use >= cfg.num_ids:
                break
            if len(images) >= cfg.images_per_id:
                if spec is not None and walk not in spec:
                    walk += 1
                    continue
                self.img_dict[use] = {"id": key,
                                      "images": images[: cfg.images_per_id]}
                walk += 1
                use += 1
        if use < cfg.num_ids:
            raise ValueError(
                f"not enough identities: wanted {cfg.num_ids}, found {use} "
                f"in {cfg.pickle_path}")

    def __len__(self):
        return self._length

    # -- augmentation -------------------------------------------------------
    def _color_jitter(self, img: Image.Image) -> Image.Image:
        """torchvision ``ColorJitter(brightness=(0.8,1.2), contrast=(0.8,1.2),
        saturation=(0.8,1.2), hue=0.01)`` semantics on the PIL backend — the
        backend the reference transform actually runs, since ColorJitter sits
        before ToTensor (reference face_id.py:526-532): all four factors are
        pre-sampled, then the ops apply in a random permutation
        (torchvision ColorJitter.get_params)."""
        fb = self.rng.uniform(0.8, 1.2)
        fc = self.rng.uniform(0.8, 1.2)
        fs = self.rng.uniform(0.8, 1.2)
        fh = self.rng.uniform(-0.01, 0.01)
        for idx in self.rng.permutation(4):
            if idx == 0:
                img = adjust_brightness(img, fb)
            elif idx == 1:
                img = adjust_contrast(img, fc)
            elif idx == 2:
                img = adjust_saturation(img, fs)
            else:
                img = adjust_hue(img, fh)
        return img

    def _load_aug(self, id_idx: int, img_idx: int) -> np.ndarray:
        cfg = self.cfg
        img = Image.open(self.img_dict[id_idx]["images"][img_idx]).convert("RGB")
        if img.size != (cfg.image_size, cfg.image_size):
            img = img.resize((cfg.image_size, cfg.image_size), Image.BILINEAR)
        # reference op order: Resize -> RandomHorizontalFlip -> ColorJitter
        # -> ToTensor -> Normalize(.5,.5) (face_id.py:526-532)
        if self.rng.random() < cfg.flip_p:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if cfg.split != "dev":
            img = self._color_jitter(img)
        arr = np.asarray(img, np.float32) / 255.0
        return arr * 2.0 - 1.0  # (H, W, 3) in [-1, 1]

    def _add_bg(self, img: np.ndarray, scale=(0.1, 1.0)) -> np.ndarray:
        h, w = img.shape[:2]
        out = np.full_like(img, -1.0)
        rh = min(int(h * self.rng.uniform(*scale)), h)
        rh = max(rh, 1)
        rw = max(min(int(rh * self.rng.uniform(0.9, 1.1)), w), 1)
        small = np.asarray(Image.fromarray(
            ((img + 1) * 127.5).astype(np.uint8)).resize((rw, rh),
                                                         Image.BILINEAR),
            np.float32) / 127.5 - 1.0
        ph = self.rng.integers(0, h - rh) if h > rh else 0
        pw = self.rng.integers(0, w - rw) if w > rw else 0
        out[ph: ph + rh, pw: pw + rw] = small
        return out

    def _mix_two(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        h, w = left.shape[:2]
        out = np.full_like(left, -1.0)

        def rescale(img, size_hw):
            return np.asarray(Image.fromarray(
                ((img + 1) * 127.5).astype(np.uint8)).resize(
                    (size_hw[1], size_hw[0]), Image.BILINEAR),
                np.float32) / 127.5 - 1.0

        lw = int(self.rng.integers(h // 4, h // 4 * 3))
        lh = min(int(lw * self.rng.uniform(0.8, 1.2)), h)
        rw_ = min(int((w - lw) * self.rng.uniform(0.9, 1.0)), w - lw)
        rh_ = min(int(rw_ * self.rng.uniform(0.9, 1.1)), h)
        lph = int(self.rng.integers(0, max(h - lh, 1)))
        lpw = max(int(self.rng.integers(0, max(w - lw - rw_, 1))), 0)
        rph = int(self.rng.integers(0, max(h - rh_, 1)))
        rpw = max(int(self.rng.integers(lpw + lw, max(w - rw_, lpw + lw + 1))), 0)
        out[lph: lph + lh, lpw: lpw + lw] = rescale(left, (lh, lw))
        out[rph: rph + rh_, rpw: rpw + rw_] = rescale(right, (rh_, rw_))
        return out

    # -- sampling -----------------------------------------------------------
    def _id_and_img(self, i: int):
        i %= self.cfg.num_ids * self.cfg.images_per_id
        return i // self.cfg.images_per_id, i % self.cfg.images_per_id

    def __getitem__(self, i: int) -> Dict:
        cfg = self.cfg
        id_idx, img_idx = self._id_and_img(i)
        img = self._load_aug(id_idx, img_idx)

        # different-identity crops (face_id.py:657-670)
        diff_ids, diff_imgs = [], []
        for _ in range(cfg.diff_cnt):
            other = id_idx
            while other == id_idx:
                other, oimg = self._id_and_img(
                    int(self.rng.integers(self.num_train)))
            diff_ids.append(other)
            diff_imgs.append(self._load_aug(other, oimg))
        # second augmentation of each (face_id.py:672-681)
        aug2_ids = [id_idx] + diff_ids
        aug2_imgs = [self._load_aug(j, int(self.rng.integers(
            cfg.images_per_id))) for j in aug2_ids]

        dual = cfg.dual_prob > 0 and self.rng.random() < cfg.dual_prob \
            and len(diff_imgs) > 0
        faces = np.stack([img] + diff_imgs + aug2_imgs)  # (k, H, W, 3)
        ids = np.asarray([id_idx] + diff_ids + aug2_ids, np.int32)

        if dual:
            train_img = self._mix_two(img, diff_imgs[0])
            num_ids = 2
            t = str(self.rng.choice(TEMPLATES_DUAL))
            s1, s2 = PLACEHOLDER_STRINGS[0], PLACEHOLDER_STRINGS[1]
            caption = t.format(f"face of {s1} person", f"face of {s2} person")
            caption = (f"{caption}, left is a face of {s1} person, "
                       f"right is another face of {s2} person")
        else:
            train_img = self._add_bg(img) if cfg.split != "dev" else img
            num_ids = 1
            t = str(self.rng.choice(TEMPLATES_SMALL))
            caption = t.format(
                f"face of {PLACEHOLDER_STRINGS[0]} person")

        return {"image": train_img.astype(np.float32),
                "faces": faces.astype(np.float32),
                "ids": ids, "num_ids": np.int32(num_ids),
                "caption": caption, "id_idx": id_idx}


class PrefetchLoader:
    """Threaded batcher: collates dataset items and tokenizes captions.

    Replaces the reference's torch DataLoader + Lightning DataModule
    (main_id_embed.py:217-292) with a dependency-free prefetcher whose output
    dicts feed the jitted train step directly.
    """

    def __init__(self, dataset: FaceIdDataset, tokenizer, batch_size: int,
                 face_size: Optional[int] = None, shuffle: bool = True,
                 prefetch: int = 4, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1):
        """``shard_id``/``num_shards``: per-host data sharding for multi-host
        pods (SURVEY §2.5).  Every host shuffles the SAME global order (the
        seed must match across hosts) and takes the ``shard_id``-th strided
        slice, so hosts see disjoint examples; ``batch_size`` is the
        per-host batch and the global batch is ``batch_size * num_shards``
        (the mesh 'data' axis spans hosts).  Defaults are single-host."""
        assert 0 <= shard_id < num_shards, (shard_id, num_shards)
        self.ds = dataset
        self.tokenizer = tokenizer
        self.bs = batch_size
        self.face_size = face_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards

    @classmethod
    def for_host(cls, dataset, tokenizer, batch_size, **kw):
        """Shard by this JAX process (multi-host pods)."""
        import jax
        return cls(dataset, tokenizer, batch_size,
                   shard_id=jax.process_index(),
                   num_shards=jax.process_count(), **kw)

    def _resize_faces(self, faces: np.ndarray) -> np.ndarray:
        if self.face_size is None or faces.shape[1] == self.face_size:
            return faces
        out = []
        for f in faces:
            im = Image.fromarray(((f + 1) * 127.5).astype(np.uint8))
            im = im.resize((self.face_size, self.face_size), Image.BILINEAR)
            out.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        return np.stack(out)

    def _collate(self, items: List[Dict]) -> Dict:
        return {
            "image": np.stack([it["image"] for it in items]),
            "faces": np.stack([self._resize_faces(it["faces"])
                               for it in items]),
            "ids": np.stack([it["ids"] for it in items]),
            "num_ids": np.stack([it["num_ids"] for it in items]),
            "tokens": self.tokenizer([it["caption"] for it in items]),
            "captions": [it["caption"] for it in items],
        }

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_id::self.num_shards]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            batch = []
            for i in order:
                batch.append(self.ds[int(i)])
                if len(batch) == self.bs:
                    q.put(self._collate(batch))
                    batch = []
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item

    def __len__(self):
        return len(self.ds) // self.bs
