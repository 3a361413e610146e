"""Faithful minimal torchvision.transforms (torchvision is absent in this
image).  The W0 composed-align oracle runs the reference's own dataloader
and demo_image through these, so ToTensor / Normalize / ToPILImage / Resize
replicate torchvision's arithmetic exactly:

- ToTensor: uint8 HWC (PIL or ndarray) -> float32 CHW / 255
- Normalize: per-channel (t - mean) / std, fp32
- ToPILImage: CHW tensor / HWC uint8 ndarray -> PIL.Image
- Resize: PIL bilinear; int size = short side (aspect kept), tuple = exact

Augmentation transforms the parity tests never execute keep raising.
"""
import numpy as np
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    def __init__(self, *a, **k):
        pass

    def __call__(self, pic):
        import torch
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            return t.float().div(255)
        return t.float()


class Normalize:
    def __init__(self, mean, std, *a, **k):
        self.mean = mean
        self.std = std

    def __call__(self, t):
        import torch
        mean = torch.as_tensor(self.mean, dtype=t.dtype)[:, None, None]
        std = torch.as_tensor(self.std, dtype=t.dtype)[:, None, None]
        return (t - mean) / std


class ToPILImage:
    def __init__(self, *a, **k):
        pass

    def __call__(self, pic):
        import torch
        if isinstance(pic, torch.Tensor):
            arr = pic.numpy()
            if arr.ndim == 3:
                arr = arr.transpose(1, 2, 0)
            if arr.dtype != np.uint8:
                arr = (arr * 255).clip(0, 255).astype(np.uint8)
        else:
            arr = np.asarray(pic)
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[:, :, 0]
        return Image.fromarray(arr)


class Resize:
    """PIL path: PIL resample.  Tensor path ((...,C,H,W) torch tensors, as
    the reference eval preprocessing applies): F.interpolate with
    antialias=False — torchvision's reference-era tensor kernel."""

    _MODES = {Image.NEAREST: "nearest", Image.BILINEAR: "bilinear",
              Image.BICUBIC: "bicubic"}

    def __init__(self, size, interpolation=Image.BILINEAR, *a, **k):
        self.size = size
        self.interpolation = interpolation

    def _target(self, h, w):
        if isinstance(self.size, int):
            if min(h, w) == self.size:
                return h, w
            if w <= h:
                return int(self.size * h / w), self.size
            return self.size, int(self.size * w / h)
        return tuple(self.size)

    def __call__(self, img):
        import torch
        if isinstance(img, torch.Tensor):
            h, w = img.shape[-2:]
            nh, nw = self._target(h, w)
            if (nh, nw) == (h, w):
                return img
            batched = img.ndim == 4
            t = img if batched else img[None]
            mode = self._MODES[self.interpolation]
            out = torch.nn.functional.interpolate(
                t, size=(nh, nw), mode=mode,
                **({"antialias": False} if mode != "nearest" else {}))
            return out if batched else out[0]
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        w, h = img.size
        nh, nw = self._target(h, w)
        if (nh, nw) == (h, w):
            return img
        return img.resize((nw, nh), self.interpolation)


class CenterCrop:
    def __init__(self, size, *a, **k):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        import torch
        th, tw = self.size
        if isinstance(img, torch.Tensor):
            h, w = img.shape[-2:]
            top = int(round((h - th) / 2.0))
            left = int(round((w - tw) / 2.0))
            return img[..., top:top + th, left:left + tw]
        w, h = img.size
        left = int(round((w - tw) / 2.0))
        top = int(round((h - th) / 2.0))
        return img.crop((left, top, left + tw, top + th))


class _T:
    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        raise RuntimeError("torchvision.transforms stub: offline")


RandomHorizontalFlip = ColorJitter = RandomCrop = _T


class functional:  # noqa: N801
    @staticmethod
    def resize(img, size, interpolation=Image.BILINEAR, *a, **k):
        return Resize(size, interpolation)(img)


# `from torchvision.transforms import transforms` (the real package has a
# transforms submodule re-exporting the same names) — alias to ourselves
import sys as _sys
transforms = _sys.modules[__name__]
