"""Minimal stub of kornia for importing the reference's encoder module;
the parity tests never call into it."""
class _NS:
    def __getattr__(self, name):
        raise RuntimeError(f"kornia stub: {name} not available offline")


augmentation = _NS()
geometry = _NS()


def __getattr__(name):
    raise RuntimeError(f"kornia stub: {name} not available offline")
