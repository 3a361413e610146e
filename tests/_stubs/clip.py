"""Stub of the OpenAI `clip` package (absent in this image), backed by a
tiny deterministic transformers.CLIPModel so the reference's
CLIPEvaluator (evaluation/clip_eval.py:20-77) runs for real: `load`
returns a wrapper exposing encode_image/encode_text plus a preprocess
whose `.transforms` list has the real 5-slot structure the evaluator
slices ([:2] Resize+CenterCrop, [4:] Normalize).  Our jax towers bridge
the same state_dict via convert_hf_clip, so the W4 oracle compares two
independent executions of the same random-init model.

`tokenize` is a deterministic hash scheme shared with the jax side (no
BPE vocab ships offline on either side): [SOT] word-ids [EOT] zeros,
with EOT = vocab-1 so both towers pool at argmax(ids).
"""
import numpy as np

_VOCAB = 1024
_CTX = 77
_IMG_SIZE = 32

_MEAN = (0.48145466, 0.4578275, 0.40821073)
_STD = (0.26862954, 0.26130258, 0.27577711)


def hf_tiny_clip_config():
    import transformers
    tcfg = transformers.CLIPTextConfig(
        vocab_size=_VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=_CTX, hidden_act="quick_gelu",
        projection_dim=32, eos_token_id=_VOCAB - 1)
    vcfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=_IMG_SIZE, patch_size=8,
        hidden_act="quick_gelu", projection_dim=32)
    return transformers.CLIPConfig.from_text_vision_configs(
        tcfg, vcfg, projection_dim=32)


class _Wrapper:
    def __init__(self, model):
        self.hf = model

    def encode_image(self, images):
        return self.hf.get_image_features(pixel_values=images)

    def encode_text(self, tokens):
        return self.hf.get_text_features(input_ids=tokens)


class _Identity:
    def __call__(self, x):
        return x


def load(name="ViT-B/32", device="cpu", jit=False, seed=7):
    import torch
    import transformers
    from torchvision.transforms import (CenterCrop, Compose, Normalize,
                                        Resize, ToTensor)
    from PIL import Image
    torch.manual_seed(seed)
    model = transformers.CLIPModel(hf_tiny_clip_config()).eval()
    preprocess = Compose([
        Resize(_IMG_SIZE, interpolation=Image.BICUBIC),
        CenterCrop(_IMG_SIZE),
        _Identity(),            # _convert_image_to_rgb slot
        ToTensor(),
        Normalize(_MEAN, _STD),
    ])
    return _Wrapper(model), preprocess


def tokenize_np(texts, context_length=_CTX):
    if isinstance(texts, str):
        texts = [texts]
    import zlib
    out = np.zeros((len(texts), context_length), np.int64)
    for i, t in enumerate(texts):
        ids = [_VOCAB - 2]  # SOT
        for word in t.lower().split():
            # crc32: stable across processes (unlike salted hash())
            ids.append(1 + (zlib.crc32(word.encode()) % (_VOCAB - 3)))
        ids = ids[: context_length - 1]
        ids.append(_VOCAB - 1)  # EOT (max id -> argmax pooling position)
        out[i, : len(ids)] = ids
    return out


def tokenize(texts, context_length=_CTX, truncate=False):
    import torch
    return torch.from_numpy(tokenize_np(texts, context_length))
