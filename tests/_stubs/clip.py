"""Minimal stub of the OpenAI `clip` package — only needed so the reference's
ldm.modules.encoders.modules imports; the parity tests never call into it."""
def load(*a, **k):
    raise RuntimeError("clip stub: not available offline")


def tokenize(*a, **k):
    raise RuntimeError("clip stub: not available offline")
