"""Checked-in checkpoint manifests stay loadable by the bridges (torch-free).

Runs scripts/verify_weights.py's dry-run: zero-filled state dicts with the
manifest shapes through every converter, asserting full key coverage — the
guard that the first real pretrained-weight load won't surprise
(VERDICT r1 item 9; reference ckpt layouts cited in the script).
"""
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "verify_weights", os.path.join(REPO, "scripts", "verify_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


vw = _load_script()


@pytest.mark.parametrize("name", sorted(vw.DRYRUNS))
def test_manifest_dryrun(name):
    assert vw.dryrun(name, vw.load_manifest(name))


def test_check_mode_detects_drift(tmp_path):
    """--check flags missing keys and shape mismatches in a real .pt file."""
    import numpy as np
    from celebbasis_tpu.utils.pt_io import save_pt

    keys = vw.load_manifest("sphere20")
    state = {k: np.zeros(shape, np.float32) for k, shape in keys.items()}
    good = tmp_path / "good.pt"
    save_pt(dict(state), str(good))
    assert vw.check(str(good), "sphere20")

    state.pop(next(iter(keys)))
    k2 = next(iter(state))
    state[k2] = np.zeros((1, 2, 3), np.float32)
    bad = tmp_path / "bad.pt"
    save_pt(state, str(bad))
    assert not vw.check(str(bad), "sphere20")
