"""CosFace sphere20/sphere64 eval face encoder in Flax (+ torch bridge).

Parity target: `/root/reference/evaluation/face_align/cosface/net.py` —
the identity scorer used by IdentityEvaluator (clip_eval.py:134-259):
4 stages of [stride-2 conv + PReLU + N residual (conv-PReLU-conv-PReLU)
blocks], then fc(512*7*7 -> 512) on 112x112 inputs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from celebbasis_tpu.models.iresnet import PReLU
from celebbasis_tpu.utils.bridge import KeyMap, _lin, unflatten


@dataclass(frozen=True)
class SphereConfig:
    layers: Tuple[int, int, int, int] = (1, 2, 4, 1)    # sphere20
    filters: Tuple[int, ...] = (64, 128, 256, 512)
    feat_dim: int = 512

    @staticmethod
    def sphere20():
        return SphereConfig((1, 2, 4, 1))

    @staticmethod
    def sphere64():
        return SphereConfig((3, 7, 16, 3))

    @staticmethod
    def tiny():
        return SphereConfig((1, 1, 1, 1), (8, 16, 32, 64), feat_dim=64)


class SphereBlock(nn.Module):
    planes: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        conv = lambda name: nn.Conv(self.planes, (3, 3), padding="SAME",
                                    use_bias=False, dtype=self.dtype,
                                    param_dtype=jnp.float32, name=name)
        h = PReLU(name="prelu1")(conv("conv1")(x)).astype(self.dtype)
        h = PReLU(name="prelu2")(conv("conv2")(h)).astype(self.dtype)
        return x + h


class SphereNet(nn.Module):
    cfg: SphereConfig = SphereConfig.sphere20()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 112, 112, 3) in [-1,1] -> (B, feat_dim)."""
        cfg = self.cfg
        h = x.astype(self.dtype)
        for li, (n_blocks, planes) in enumerate(zip(cfg.layers, cfg.filters),
                                                start=1):
            h = nn.Conv(planes, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"layer{li}_down")(h)
            h = PReLU(name=f"layer{li}_prelu")(h).astype(self.dtype)
            for bi in range(n_blocks):
                h = SphereBlock(planes, self.dtype,
                                name=f"layer{li}_block{bi}")(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(cfg.feat_dim, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="fc")(
                            h.astype(jnp.float32))


def convert_sphere(state: Dict, cfg: SphereConfig = SphereConfig.sphere20()
                   ) -> Dict:
    """torch sphere state_dict (Sequential layerX.Y keys) -> Flax params."""
    state = {k[7:] if k.startswith("module.") else k: np.asarray(v)
             for k, v in state.items() if hasattr(v, "shape")}
    km = KeyMap(state)
    for li, n_blocks in enumerate(cfg.layers, start=1):
        km.conv(f"layer{li}_down", f"layer{li}.0")
        km.put(f"layer{li}_prelu/alpha", km.take(f"layer{li}.1.weight"))
        for bi in range(n_blocks):
            s = f"layer{li}.{2 + bi}"
            d = f"layer{li}_block{bi}"
            km.conv(f"{d}/conv1", f"{s}.conv1")
            km.put(f"{d}/prelu1/alpha", km.take(f"{s}.prelu1.weight"))
            km.conv(f"{d}/conv2", f"{s}.conv2")
            km.put(f"{d}/prelu2/alpha", km.take(f"{s}.prelu2.weight"))
    # NCHW->NHWC flatten reorder for fc
    fc_w = km.take("fc.weight")
    C = cfg.filters[-1]
    s = int(np.sqrt(fc_w.shape[1] // C))
    fc_w = fc_w.reshape(fc_w.shape[0], C, s, s).transpose(0, 2, 3, 1)
    km.put("fc/kernel", _lin(fc_w.reshape(fc_w.shape[0], -1)))
    km.put("fc/bias", km.take("fc.bias"))
    return {"params": unflatten(km.out)}
