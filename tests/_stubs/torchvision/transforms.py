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
    def __init__(self, size, interpolation=Image.BILINEAR, *a, **k):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        if isinstance(self.size, int):
            w, h = img.size
            short, long = (w, h) if w <= h else (h, w)
            if short == self.size:
                return img
            new_short = self.size
            new_long = int(self.size * long / short)
            nw, nh = ((new_short, new_long) if w <= h
                      else (new_long, new_short))
            return img.resize((nw, nh), self.interpolation)
        return img.resize((self.size[1], self.size[0]), self.interpolation)


class CenterCrop:
    def __init__(self, size, *a, **k):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
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
