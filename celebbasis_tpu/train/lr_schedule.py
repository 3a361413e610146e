"""LR schedules — the reference's LambdaWarmUpCosine family as optax fns.

Parity: `/root/reference/ldm/lr_scheduler.py` (LambdaWarmUpCosineScheduler
and the interval-based Scheduler2) — available but unused in the aigc_id
config path, provided for full configurability.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import optax


def warmup_cosine(base_lr: float, warm_up_steps: int, lr_min: float,
                  lr_max: float, lr_start: float, max_decay_steps: int):
    """LambdaWarmUpCosineScheduler: linear warmup then cosine to lr_min.

    Like the reference, the returned schedule is a multiplier applied to
    ``base_lr`` (lr_scheduler.py uses LambdaLR semantics).
    """
    def fn(step):
        step = np.minimum(step, max_decay_steps)
        warm = lr_start + step * (lr_max - lr_start) / max(warm_up_steps, 1)
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = np.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + np.cos(t * np.pi))
        return base_lr * np.where(step < warm_up_steps, warm, cos)
    return fn


def _cycle_of(bounds: np.ndarray, step) -> int:
    """Reference ``find_in_interval`` (lr_scheduler.py:53-58): the boundary
    step itself still belongs to the *earlier* cycle (``n <= cl``)."""
    cyc = int(np.searchsorted(bounds, step, side="left"))
    return min(cyc, len(bounds) - 1)


def warmup_cosine_cycles(base_lr: float, warm_up_steps: Sequence[int],
                         f_min: Sequence[float], f_max: Sequence[float],
                         f_start: Sequence[float],
                         cycle_lengths: Sequence[int]):
    """LambdaWarmUpCosineScheduler2: repeated warmup+cosine cycles."""
    bounds = np.cumsum(cycle_lengths)

    def fn(step):
        cyc = _cycle_of(bounds, step)
        start = bounds[cyc - 1] if cyc > 0 else 0
        s = step - start
        if s < warm_up_steps[cyc]:
            mult = (f_start[cyc] + s * (f_max[cyc] - f_start[cyc])
                    / max(warm_up_steps[cyc], 1))
        else:
            t = (s - warm_up_steps[cyc]) / max(
                cycle_lengths[cyc] - warm_up_steps[cyc], 1)
            t = min(t, 1.0)
            mult = f_min[cyc] + 0.5 * (f_max[cyc] - f_min[cyc]) * (
                1 + np.cos(t * np.pi))
        return base_lr * mult
    return fn


def lambda_linear(base_lr: float, warm_up_steps: Sequence[int],
                  f_min: Sequence[float], f_max: Sequence[float],
                  f_start: Sequence[float], cycle_lengths: Sequence[int]):
    """LambdaLinearScheduler (lr_scheduler.py:82-98): per-cycle linear warmup
    then linear decay f_max→f_min across the remaining cycle length.  This is
    the scheduler every shipped ``txt2img-1p4B-*`` config names."""
    bounds = np.cumsum(cycle_lengths)

    def fn(step):
        cyc = _cycle_of(bounds, step)
        start = bounds[cyc - 1] if cyc > 0 else 0
        s = step - start
        if s < warm_up_steps[cyc]:
            mult = (f_start[cyc] + s * (f_max[cyc] - f_start[cyc])
                    / max(warm_up_steps[cyc], 1))
        else:
            mult = f_min[cyc] + (f_max[cyc] - f_min[cyc]) \
                * (cycle_lengths[cyc] - s) / cycle_lengths[cyc]
        return base_lr * mult
    return fn


def adamw_with_schedule(schedule_fn) -> optax.GradientTransformation:
    return optax.adamw(learning_rate=lambda step: schedule_fn(step))


def lambda_linear_traceable(base_lr: float, warm_up_steps: Sequence[int],
                            f_min: Sequence[float], f_max: Sequence[float],
                            f_start: Sequence[float],
                            cycle_lengths: Sequence[int]):
    """jnp twin of :func:`lambda_linear` usable as an optax schedule inside
    jit (the reference's LambdaLR runs host-side between steps; an XLA
    schedule must trace)."""
    import jax.numpy as jnp
    bounds = jnp.asarray(np.cumsum(cycle_lengths), jnp.float32)
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmn = jnp.asarray(f_min, jnp.float32)
    fmx = jnp.asarray(f_max, jnp.float32)
    fst = jnp.asarray(f_start, jnp.float32)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        cyc = jnp.clip(jnp.searchsorted(bounds, step, side="left"), 0,
                       len(cycle_lengths) - 1)
        start = jnp.where(cyc > 0, bounds[jnp.maximum(cyc - 1, 0)], 0.0)
        s = step - start
        warm = fst[cyc] + s * (fmx[cyc] - fst[cyc]) / jnp.maximum(wu[cyc], 1)
        lin = fmn[cyc] + (fmx[cyc] - fmn[cyc]) * (cl[cyc] - s) / cl[cyc]
        return base_lr * jnp.where(s < wu[cyc], warm, lin)
    return fn
