"""Persistent txt2img serving daemon — the production counterpart of
``cli/txt2img.py`` (reference: ``scripts/stable_txt2img.py``, which pays the
full model build + first-compile on every invocation).

Loads the assembly once, jits the prompt->pixels graph at a fixed batch
shape, optionally warms it at startup (with the persistent compile cache the
warm-up is seconds on repeat launches), then serves requests over plain
HTTP — no extra dependencies, ``http.server`` from the stdlib:

    GET  /healthz            -> {"ok": true, "warm": true, ...}
    POST /txt2img  {"prompt": "...", "seed": 1, "ids": [0,1],
                    "n_samples": 2}
                             -> {"images": [<base64 PNG>...], "ms": ...}

Requests are serialized through a device lock (one TPU program at a time);
the HTTP layer is threaded so health checks and queued requests don't block
on the device.  ``n_samples`` up to the server's ``--batch`` run in one
compiled call (the batch is padded to the fixed shape and sliced — no
recompile per request size); larger requests are rejected with 400.

Usage:
    python -m celebbasis_tpu.cli.serve --config configs/aigc_id.yaml \
        --embedding_path logs/.../embeddings_gs-800.pt --port 8310
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


class TxtToImgService:
    """Owns the assembly + compiled graph; thread-safe generate()."""

    def __init__(self, args):
        from celebbasis_tpu.loader import assemble
        from celebbasis_tpu.utils.config import load_run_spec

        spec = load_run_spec(args.config)
        self.asm = assemble(
            spec, sd_ckpt=args.ckpt, vocab_path=args.vocab,
            embedding_ckpt=args.embedding_path, image_size=args.H,
            seed=args.seed,
            param_dtype=jnp.bfloat16 if args.precision == "bf16" else None)
        self.fn = self.asm.pipeline.make_txt2img_fn(
            num_steps=args.ddim_steps, guidance_scale=args.scale,
            eta=args.ddim_eta, image_size=args.H,
            sampler="plms" if args.plms else "ddim")
        self.batch = args.batch
        self.k = len(self.asm.pipeline.manager_cfg.placeholder_token_ids)
        self.default_ids = list(args.ids)
        self.image_size = args.H
        self.steps = args.ddim_steps
        self._lock = threading.Lock()   # one device program at a time
        self.warm = False
        self.requests = 0

    def warmup(self):
        self.generate("a photo of a person", seed=0)
        self.warm = True

    def generate(self, prompt: str, seed: int = 42, ids=None,
                 n_samples: int = 1) -> np.ndarray:
        """-> (n_samples, H, W, 3) float in [-1, 1]."""
        if not (1 <= n_samples <= self.batch):
            raise ValueError(
                f"n_samples must be in [1, {self.batch}] (fixed compile "
                f"shape); got {n_samples}")
        B = self.batch
        ids = list(self.default_ids if ids is None else ids)
        ids_row = (ids + [0] * self.k)[:self.k]
        tokens = jnp.asarray(self.asm.tokenizer([prompt] * B))
        uncond = jnp.asarray(self.asm.tokenizer([""] * B))
        ids_arr = jnp.asarray(np.tile(ids_row, (B, 1)).astype(np.int32))
        num_ids = jnp.full((B,), len(ids), jnp.int32)
        rng = jax.random.key(seed)
        with self._lock:
            imgs = self.fn(self.asm.params, self.asm.manager_state,
                           self.asm.basis, tokens, uncond, ids_arr, num_ids,
                           rng)
            imgs = np.asarray(imgs)          # fetch inside the lock
            self.requests += 1
        return imgs[:n_samples]


def _png_b64(img: np.ndarray) -> str:
    from PIL import Image
    arr = ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(service: TxtToImgService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "ok": True, "warm": service.warm,
                    "batch": service.batch, "steps": service.steps,
                    "image_size": service.image_size,
                    "requests": service.requests,
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/txt2img":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req["prompt"]
                t0 = time.perf_counter()
                imgs = service.generate(
                    prompt, seed=int(req.get("seed", 42)),
                    ids=req.get("ids"),
                    n_samples=int(req.get("n_samples", 1)))
                ms = (time.perf_counter() - t0) * 1e3
            except (KeyError, ValueError, TypeError) as e:
                return self._reply(400, {"error": str(e)})
            self._reply(200, {"images": [_png_b64(im) for im in imgs],
                              "ms": round(ms, 1)})

        def log_message(self, fmt, *a):   # quiet access log -> stdout once
            print(f"[serve] {self.address_string()} {fmt % a}")

    return Handler


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--embedding_path", type=str, default=None)
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--scale", type=float, default=10.0)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--batch", type=int, default=2,
                   help="fixed compile batch; requests serve 1..batch "
                        "samples from the same graph")
    p.add_argument("--ids", type=int, nargs="+", default=[0, 1])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8310)
    p.add_argument("--no-warmup", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    service = TxtToImgService(args)
    if not args.no_warmup:
        print("[serve] warming the sampling graph "
              "(seconds with a hot compile cache, minutes cold)...")
        t0 = time.perf_counter()
        service.warmup()
        print(f"[serve] warm in {time.perf_counter() - t0:.1f}s")
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(service))
    print(f"[serve] listening on http://{args.host}:{httpd.server_address[1]}"
          f" (batch={args.batch}, {args.ddim_steps} steps)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        httpd.shutdown()


if __name__ == "__main__":
    main()
