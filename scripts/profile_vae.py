#!/usr/bin/env python
"""VAE conv-shape microbenchmark on the real TPU: NHWC vs space-to-depth.

The decoder spends its time in 3x3 stride-1 convs at high spatial / low
channel count (512²x128 ... 128²x512).  This measures each shape as-is and
in an exact space-to-depth rewrite — per output subpixel (a,b) a 2x2 conv
over the 4C-channel low-res layout with the 3x3 kernel embedded (same math,
16/9 the MACs, 4x the channel depth for MXU tiling) — to decide whether an
s2d decode/encode path is worth wiring in (VERDICT r1 next #7; PERF.md
"known remaining headroom").
"""
import json
import os
import time

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # force a real fetch
    return (time.perf_counter() - t0) / iters * 1000.0


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def make_s2d_kernels(w):
    """3x3 HWIO -> four 2x2 (4Cin, Cout) kernels, one per output subpixel.

    High-res y[2i+a, 2j+b] reads blocks {i-1+a..i+a} x {j-1+b..j+b}; embed
    the 9 taps into the (block, subpixel-channel) layout.
    """
    w = np.asarray(w, np.float32)
    Cin, Cout = w.shape[2], w.shape[3]
    ks = []
    for a in (0, 1):
        for b in (0, 1):
            k = np.zeros((2, 2, 4 * Cin, Cout), np.float32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    by, ry = divmod(a + dy + 2, 2)
                    bx, rx = divmod(b + dx + 2, 2)
                    kY, kX = (by - 1) + (1 - a), (bx - 1) + (1 - b)
                    k[kY, kX, (ry * 2 + rx) * Cin:(ry * 2 + rx + 1) * Cin] \
                        += w[dy + 1, dx + 1]
            ks.append(k)
    return ks


def conv_s2d(xl, ks):
    """Exact 3x3-SAME conv in s2d layout; xl (B,H/2,W/2,4Cin), ks from
    make_s2d_kernels. Returns high-res (B,H,W,Cout)."""
    outs = []
    for (a, b), k in zip(((0, 0), (0, 1), (1, 0), (1, 1)), ks):
        xp = jnp.pad(xl, ((0, 0), (1 - a, a), (1 - b, b), (0, 0)))
        outs.append(jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    o00, o01, o10, o11 = outs
    row0 = jnp.stack([o00, o01], axis=3)           # (B,Hl,Wl,2,C) over b
    row1 = jnp.stack([o10, o11], axis=3)
    y = jnp.stack([row0, row1], axis=2)            # (B,Hl,2,Wl,2,C)
    B, Hl, _, Wl, _, C = y.shape
    return y.reshape(B, Hl * 2, Wl * 2, C)


def main():
    rng = np.random.default_rng(0)
    results = {}
    for H, C in ((512, 128), (256, 256), (128, 512), (64, 512)):
        x = jnp.asarray(rng.standard_normal((1, H, H, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
        f = jax.jit(conv3x3)
        ms = timed(f, x, w)
        tflops = 2 * H * H * 9 * C * C / ms / 1e9
        results[f"{H}x{C}"] = {"ms": round(ms, 3), "tflops": round(tflops, 1)}

        xl = s2d(x)
        ks = [jnp.asarray(k, jnp.bfloat16)
              for k in make_s2d_kernels(np.asarray(w, np.float32))]
        f2 = jax.jit(conv_s2d)
        ms2 = timed(f2, xl, ks)
        want = np.asarray(f(x, w), np.float32)
        got = np.asarray(f2(xl, ks), np.float32)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
        results[f"{H}x{C}"]["s2d_ms"] = round(ms2, 3)
        results[f"{H}x{C}"]["s2d_relerr"] = float(f"{err:.2e}")
        results[f"{H}x{C}"]["s2d_speedup"] = round(ms / ms2, 2)
        print(json.dumps({f"{H}x{C}": results[f"{H}x{C}"]}))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
