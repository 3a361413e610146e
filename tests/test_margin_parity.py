"""Margin-head parity vs the reference's own torch modules
(`/root/reference/ldm/modules/id_embedding/margin_losses.py`) — closes the
§2.1 margin-loss family (VERDICT r2 missing #3).

The reference's plain CosFace/ArcFace hard-code ``.cuda()`` on the one-hot
buffer (:128-131, :185-189); we monkeypatch ``Tensor.cuda`` to identity so
the reference module itself runs on this CPU-only image.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.core import losses

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from ldm.modules.id_embedding import margin_losses as ref  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)


def _pair(kind, num_classes=6, dim=8, **kw):
    head = losses.MarginHead(num_classes=num_classes, kind=kind, **kw)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((num_classes, dim)).astype(np.float32)
    params = {"params": {"weight": jnp.asarray(w)}}
    if kind == "softmax":
        b = rng.standard_normal((num_classes,)).astype(np.float32)
        params["params"]["bias"] = jnp.asarray(b)
        t = ref.Softmax(dim, num_classes, None)
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(w))
            t.bias.copy_(torch.from_numpy(b))
    else:
        cls = {"cosface": ref.CosFace, "arcface": ref.ArcFace,
               "am_cosface": ref.AMCosFace, "am_arcface": ref.AMArcFace}[kind]
        t = cls(dim, num_classes, None, **{k: v for k, v in kw.items()
                                           if k in ("s", "m", "a", "k")})
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(w))
    x = rng.standard_normal((5, dim)).astype(np.float32)
    return head, params, t, x


@pytest.mark.parametrize("kind,kw", [
    ("softmax", {}),
    ("cosface", dict(s=64.0, m=0.4)),
    ("arcface", dict(s=64.0, m=0.5)),
    ("am_cosface", dict(s=64.0, m=0.4, a=1.2, k=0.1)),
    ("am_arcface", dict(s=64.0, m=0.5, a=1.2, k=0.1)),
])
def test_margin_head_matches_reference(kind, kw):
    head, params, t, x = _pair(kind, **kw)
    labels = np.array([0, 3, 1, 5, 2], np.int64)
    ours = np.asarray(head.apply(params, jnp.asarray(x),
                                 jnp.asarray(labels)))
    with torch.no_grad():
        expect = t(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kind", ["am_cosface", "am_arcface"])
def test_partialfc_invalid_labels_get_no_margin(kind):
    """label == -1 rows keep raw cosine logits (margin_losses.py:246-252)."""
    head, params, t, x = _pair(kind, s=64.0, m=0.4, a=1.2, k=0.1)
    labels = np.array([0, -1, 1, -1, 2], np.int64)
    ours = np.asarray(head.apply(params, jnp.asarray(x),
                                 jnp.asarray(labels)))
    with torch.no_grad():
        expect = t(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-4)


def test_am_degenerates_to_plain():
    """k=0 makes AM heads equal the plain heads (the reference docstrings'
    own claim, margin_losses.py:204-206,321-323)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    w = rng.standard_normal((6, 8)).astype(np.float32)
    params = {"params": {"weight": jnp.asarray(w)}}
    am = losses.MarginHead(6, "am_cosface", m=0.4, s=64.0, a=1.2, k=0.0)
    plain = losses.MarginHead(6, "cosface", m=0.4, s=64.0)
    np.testing.assert_allclose(np.asarray(am.apply(params, x, labels)),
                               np.asarray(plain.apply(params, x, labels)),
                               rtol=1e-6)
