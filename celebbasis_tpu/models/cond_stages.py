"""Spatial conditioning stages for the concat-mode legacy workloads.

Parity targets (reference `/root/reference/ldm/modules/encoders/modules.py`):

* ``SpatialRescaler`` (modules.py:126-155) — n_stages of
  ``F.interpolate(scale_factor=multiplier)`` plus an optional 1x1
  channel-mapping conv.  Used by the semantic-synthesis configs
  (``models/ldm/semantic_synthesis{256,512}/config.yaml``: 182-channel
  one-hot segmentation -> 3 channels at latent resolution, concat-fed to
  the UNet).
* ``torch.nn.Identity`` cond stages (``models/ldm/bsr_sr/config.yaml``)
  are handled without a module (legacy.py passes the array through).

TPU note: torch's ``interpolate(mode='bilinear', align_corners=False)``
at scale 0.5 without antialias samples every output pixel at the centre of
a 2x2 input block — i.e. it IS 2x2 average pooling, which is what we run
(one fused reduce-window, no gather).  ``nearest`` at 0.5 is a stride-2
slice.  Other (method, multiplier) combinations are not used by any
shipped config and raise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class SpatialRescaler(nn.Module):
    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: int | None = None
    bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, H, W, C) -> (B, H*m^n, W*m^n, C or out_channels)."""
        if self.multiplier != 0.5 or self.method not in ("bilinear",
                                                         "nearest"):
            raise NotImplementedError(
                f"SpatialRescaler({self.method!r}, {self.multiplier}) — "
                "shipped reference configs only use bilinear x0.5")
        h = x
        for _ in range(self.n_stages):
            if self.method == "bilinear":
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            else:
                h = h[:, ::2, ::2, :]
        if self.out_channels is not None:
            h = nn.Conv(self.out_channels, (1, 1), use_bias=self.bias,
                        param_dtype=jnp.float32,
                        name="channel_mapper")(h)
        return h

    def encode(self, x: jax.Array) -> jax.Array:
        return self(x)
