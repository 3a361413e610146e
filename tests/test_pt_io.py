"""Round-trip tests for the torch-free .pt reader/writer.

Uses real torch (available in the test env only) as ground truth for both
directions; the runtime package itself never imports torch.
"""
import numpy as np
import pytest

from celebbasis_tpu.utils import pt_io

pytestmark = pytest.mark.smoke

torch = pytest.importorskip("torch")


def test_load_torch_saved(tmp_path):
    obj = {
        "id_coefficients": [torch.randn(2, 1, 512) for _ in range(3)],
        "step": 799,
        "name": "exp",
        "nested": {"a": torch.arange(10), "b": [1.5, True, None]},
        "half": torch.randn(4, 4).half(),
    }
    p = tmp_path / "ckpt.pt"
    torch.save(obj, p)

    loaded = pt_io.load_pt(str(p))
    assert loaded["step"] == 799 and loaded["name"] == "exp"
    for ref, got in zip(obj["id_coefficients"], loaded["id_coefficients"]):
        np.testing.assert_array_equal(ref.numpy(), got)
    np.testing.assert_array_equal(obj["nested"]["a"].numpy(), loaded["nested"]["a"])
    assert loaded["nested"]["b"] == [1.5, True, None]
    np.testing.assert_array_equal(obj["half"].numpy(), loaded["half"])
    assert loaded["half"].dtype == np.float16


def test_save_then_torch_load(tmp_path):
    obj = {
        "id_coefficients": [np.random.randn(2, 1, 512).astype(np.float32)
                            for _ in range(2)],
        "meta": {"steps": 800, "lr": 1e-2, "tag": "sks"},
        "ints": np.arange(7, dtype=np.int64),
    }
    p = tmp_path / "ours.pt"
    pt_io.save_pt(obj, str(p))

    loaded = torch.load(str(p), map_location="cpu", weights_only=True)
    for ref, got in zip(obj["id_coefficients"], loaded["id_coefficients"]):
        assert isinstance(got, torch.Tensor)
        np.testing.assert_allclose(ref, got.numpy())
    assert loaded["meta"] == obj["meta"]
    np.testing.assert_array_equal(obj["ints"], loaded["ints"].numpy())


def test_roundtrip_self(tmp_path):
    obj = {"w": np.random.randn(8, 16).astype(np.float32),
           "b": np.random.randn(16).astype(np.float16)}
    p = tmp_path / "self.pt"
    pt_io.save_pt(obj, str(p))
    loaded = pt_io.load_pt(str(p))
    np.testing.assert_array_equal(obj["w"], loaded["w"])
    np.testing.assert_array_equal(obj["b"], loaded["b"])


def test_noncontiguous_tensor(tmp_path):
    t = torch.randn(6, 8).t()  # transposed -> non-default strides
    p = tmp_path / "nc.pt"
    torch.save({"t": t}, p)
    loaded = pt_io.load_pt(str(p))
    np.testing.assert_array_equal(t.numpy(), loaded["t"])
