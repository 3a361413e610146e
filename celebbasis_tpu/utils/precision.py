"""Parameter-storage precision helpers.

The frozen SD weights are 860M+84M+123M params; stored fp32 they are
~3.4 GB of the ~19 GB HBM traffic of one CFG UNet forward (HLO cost
analysis, PERF.md roofline).  For inference, storing them bf16 halves that
slice of traffic — measured +4.5% end-to-end on the 512² DDIM bench
(scripts/exp_bf16_params.py).  Training keeps fp32 storage (master
weights); compute is bf16 either way via each module's ``dtype``.

bf16 keeps fp32's exponent range, so the cast cannot overflow; the
mantissa rounding matches what the bf16 compute path already does to every
activation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_params(tree, dtype=jnp.bfloat16):
    """Cast every float32 leaf of a params pytree to ``dtype``.

    Non-float leaves (ints, bools) and non-fp32 floats are left untouched,
    so calling this on an already-cast tree is a no-op.
    """
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        tree)
