"""Minimal albumentations stand-in so the reference's
``ldm/modules/image_degradation/bsrgan_light.py`` imports as a test oracle
(the real package is not in this image; the oracle tests only exercise its
numpy/scipy kernel functions, never these transforms)."""


class _Transform:
    def __init__(self, *a, **k):
        pass

    def __call__(self, image=None, **k):
        return {"image": image}


SmallestMaxSize = _Transform
CenterCrop = _Transform
RandomCrop = _Transform
