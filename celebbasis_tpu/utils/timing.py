"""Honest device timing over the axon tunnel.

A synchronous jitted call on this image pays ~65 ms of tunnel round-trip
latency (measured: a 30-op unrolled add chain and a 4096³ matmul converge to
the same per-call floor).  Naive per-call timing therefore over-reports any
op under ~50 ms by up to two orders of magnitude — round-1's isolated-op
numbers in PERF.md suffered from this.

``per_iter_ms`` cancels the constant: it times one compiled
``fori_loop(op, n)`` call at two different trip counts and divides the
difference — the call overhead (RPC, fetch, sync) subtracts out exactly.
Verified: the tiny-add floor measures ~0 ms/iter and a 4096³ bf16 matmul
measures 204 TFLOP/s (chip peak class) where naive timing said 6.6.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import numpy as np


def _time_call(fn, x, reps: int = 7) -> float:
    out = fn(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # force a real fetch
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def per_iter_ms(op: Callable, x, iters_low: int = 20, iters_high: int = 80,
                reps: int = 7) -> float:
    """ms per application of ``op`` (a shape-preserving device fn), with the
    per-call tunnel latency cancelled by differential trip counts."""
    def chain(n, x):
        return jax.lax.fori_loop(0, n, lambda i, h: op(h), x)

    lo = jax.jit(partial(chain, iters_low))
    hi = jax.jit(partial(chain, iters_high))
    return (_time_call(hi, x, reps) - _time_call(lo, x, reps)) / (
        iters_high - iters_low)


def call_ms(fn, *args, reps: int = 7) -> float:
    """Wall-clock of one synchronous call (includes ~65 ms tunnel latency —
    honest for CLI-style single dispatches, NOT for kernel comparisons)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3
