#!/usr/bin/env python
"""Head-packing A/B (VERDICT r3 #3): can packing 3 d=40 heads into the
128-lane MXU contraction beat per-head lane-padded matmuls?

Measures, latency-cancelled (utils/timing.per_iter_ms), at SD v1's
4096-token self-attention shapes in bf16:

  QK^T  per-head   : 3 x (N,40)·(40,N)      — contraction 40/128 lanes
  QK^T  block-diag : (N,128)·(128,3N)       — contraction 120/128 lanes,
                     but 3x the output width (the packed K is block-diagonal
                     so scores stay per-head); dense MXU cycles are
                     N·128·3N either way — the lane win is exactly cancelled
  QK^T  d=128 ideal: 3 x (N,128)·(128,N)    — the lane-efficiency ceiling
  PV    per-head   : 3 x (N,N)·(N,40)       — output 40/128 lanes
  PV    packed-out : (N,N)·(N,120)          — WRONG math (heads need their
                     own P) — timed only to show what the lane win would be
                     worth if it were achievable

Run on the real chip: python scripts/bench_headpack.py
"""
import os
import sys

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.utils.timing import per_iter_ms

N, D, H = 4096, 40, 3
DT = jnp.bfloat16


def tflops(flops, ms):
    return flops / (ms * 1e-3) / 1e12


def _consume(s):
    """Fold the full score matrix into a per-row scalar the carry absorbs.

    relu-then-sum over the key axis: every score element feeds the result
    (no DCE), the relu blocks XLA's reduce(dot) -> dot(reduce) algebraic
    rewrite (a plain sum would let it collapse the matmul to a matvec), and
    slicing is avoided entirely (s[..., :D] let XLA narrow the matmul to a
    40-column strip — the bug in the first run of this benchmark, which
    reported negative times).
    """
    return jnp.maximum(s, 0.0).sum(axis=-1, keepdims=True)


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # absorb the one-off ~10 s pollution of the first timed loop in a
    # process (CLAUDE.md timing notes) before any real measurement
    warm = jnp.ones((256, 256), DT)
    per_iter_ms(lambda x: jnp.dot(x, x).astype(DT), warm, 50, 450)

    # --- QK^T ---------------------------------------------------------------
    qh = jnp.asarray(rng.normal(size=(H, N, D)), DT)
    kh = jnp.asarray(rng.normal(size=(H, N, D)), DT)

    def per_head(x):
        q, k = x
        s = jnp.einsum("hnd,hmd->hnm", q, k,
                       preferred_element_type=jnp.float32)
        return (q + (_consume(s) * 1e-6).astype(DT), k)

    ms_ph = per_iter_ms(per_head, (qh, kh), 50, 450)
    useful = 2 * H * N * N * D
    print(f"QK^T per-head 3x(4096,40): {ms_ph:.3f} ms "
          f"({tflops(useful, ms_ph):.1f} useful TFLOP/s)")

    # block-diagonal packing: q_packed (N,128), k_packed (128, 3N)
    qp = np.zeros((N, 128), np.float32)
    kp = np.zeros((128, H * N), np.float32)
    qarr = np.asarray(qh, np.float32)
    karr = np.asarray(kh, np.float32)
    for h in range(H):
        qp[:, h * D:(h + 1) * D] = qarr[h]
        kp[h * D:(h + 1) * D, h * N:(h + 1) * N] = karr[h].T
    qp, kp = jnp.asarray(qp, DT), jnp.asarray(kp, DT)

    def packed(x):
        q, k = x
        s = jnp.dot(q, k, preferred_element_type=jnp.float32)  # (N, 3N)
        return (q + (_consume(s) * 1e-6).astype(DT), k)

    ms_bd = per_iter_ms(packed, (qp, kp), 50, 450)
    print(f"QK^T block-diag (4096,128)x(128,12288): {ms_bd:.3f} ms "
          f"({tflops(useful, ms_bd):.1f} useful TFLOP/s) "
          f"-> {'WIN' if ms_bd < 0.95 * ms_ph else 'no win'}")

    # correctness of the packing (scores per-head, no mixing)
    want = np.einsum("hnd,hmd->hnm", qarr.astype(np.float32),
                     karr.astype(np.float32))
    got = np.asarray(jnp.dot(qp.astype(jnp.float32),
                             kp.astype(jnp.float32)))
    got = np.stack([got[:, h * N:(h + 1) * N] for h in range(H)])
    np.testing.assert_allclose(got, want, atol=2.0, rtol=0.1)  # bf16 inputs
    print("block-diag packing numerically correct (per-head scores)")

    # d=128 ideal ceiling
    q128 = jnp.asarray(rng.normal(size=(H, N, 128)), DT)
    k128 = jnp.asarray(rng.normal(size=(H, N, 128)), DT)
    ms_ideal = per_iter_ms(lambda x: (x[0] + (_consume(jnp.einsum(
        "hnd,hmd->hnm", x[0], x[1],
        preferred_element_type=jnp.float32)) * 1e-6)
        .astype(DT), x[1]), (q128, k128), 50, 450)
    print(f"QK^T d=128 ideal 3x(4096,128): {ms_ideal:.3f} ms "
          f"(same MXU cycles as packed; {128 / D:.1f}x the useful flops)")

    # --- PV ------------------------------------------------------------------
    p = jnp.asarray(rng.normal(size=(H, N, N)), DT)
    vh = jnp.asarray(rng.normal(size=(H, N, D)), DT)

    def pv_per_head(x):
        pp, v = x
        o = jnp.einsum("hnm,hmd->hnd", pp, v,
                       preferred_element_type=jnp.float32)
        return (pp, v + (o * 1e-6).astype(DT))

    ms_pv = per_iter_ms(pv_per_head, (p, vh), 50, 450)
    useful_pv = 2 * H * N * N * D
    print(f"PV per-head 3x(4096x4096)x(4096,40): {ms_pv:.3f} ms "
          f"({tflops(useful_pv, ms_pv):.1f} useful TFLOP/s)")

    p1 = jnp.asarray(rng.normal(size=(N, N)), DT)
    v120 = jnp.asarray(rng.normal(size=(N, H * D)), DT)

    def pv_packed(x):
        pp, v = x
        o = jnp.dot(pp, v, preferred_element_type=jnp.float32)
        return (pp, v + (o * 1e-6).astype(DT))

    ms_pvp = per_iter_ms(pv_packed, (p1, v120), 50, 450)
    print(f"PV packed-out (4096x4096)x(4096,120): {ms_pvp:.3f} ms "
          f"[math-invalid upper bound on the lane win: each head needs its "
          f"own P; a shared P mixes heads]")
    print(f"  3x per-head = {ms_pv:.3f} ms vs 1x packed {ms_pvp:.3f}: "
          f"the lane win would be {ms_pv / max(ms_pvp, 1e-9):.2f}x "
          f"IF P could be shared — it can't.")


if __name__ == "__main__":
    main()
