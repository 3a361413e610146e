"""Trainer callback tests: orbax full-state resume, device monitor, profiler."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.train import step as tstep
from celebbasis_tpu.train.callbacks import DeviceMonitor, OrbaxResume


def _tiny_state():
    cfg = mgr.ManagerConfig(placeholder_token_ids=(5,), max_ids=2, num_es=2,
                            heads=1, inner_dim=4, token_dim=8)
    mstate = mgr.init_state(cfg, jax.random.key(0))
    trainable = {"params": {"mlp": {"w": jnp.ones((3, 3))}}}
    import optax
    opt = optax.adamw(1e-2)
    return tstep.init_train_state(jax.random.key(1), trainable, opt, mstate)


def test_orbax_resume_roundtrip(tmp_path):
    state = _tiny_state()
    cb = OrbaxResume(str(tmp_path), every=1)
    cb.maybe_save(1, state._replace(step=jnp.int32(1)))
    cb.maybe_save(3, state._replace(step=jnp.int32(3)))
    cb.close()
    assert cb.latest_step() == 3

    cb2 = OrbaxResume(str(tmp_path), every=1)
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        state._replace(step=jnp.int32(3)))
    restored = cb2.restore(3, abstract)
    cb2.close()
    assert int(restored.step) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.trainable["params"]["mlp"]["w"]),
        np.asarray(state.trainable["params"]["mlp"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored.manager_state.id_coefficients),
        np.asarray(state.manager_state.id_coefficients))


def test_device_monitor_writes(tmp_path):
    mon = DeviceMonitor(str(tmp_path), every=2)
    mon.maybe_log(1)   # skipped
    mon.maybe_log(2)   # logged
    mon.maybe_log(4)   # logged
    lines = [json.loads(l) for l in open(mon.path)]
    assert [l["step"] for l in lines] == [2, 4]
    assert all("interval_s" in l for l in lines)
