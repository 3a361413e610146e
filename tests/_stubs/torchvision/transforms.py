"""Stub transforms module: enough for the reference's ldm.data.personalized
module-level import; the parity tests never execute these."""


class _T:
    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        raise RuntimeError("torchvision.transforms stub: offline")


Compose = Resize = RandomHorizontalFlip = ColorJitter = _T
ToTensor = Normalize = CenterCrop = RandomCrop = _T


class functional:  # noqa: N801
    @staticmethod
    def resize(*a, **k):
        raise RuntimeError("torchvision.transforms stub: offline")
