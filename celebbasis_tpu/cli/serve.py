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
    POST /faces2img {"prompt": "...", "faces": [<base64 image>...],
                     "seed": 1}
                             -> {"images": [...], "ms": ...}
                     live-face personalization: identity embeddings come
                     from a MetaIdNet forward on the uploaded aligned
                     crops — no training round-trip (the reference's
                     test_mode='image', stable_txt2img.py:271-318).

**Continuous batching**: concurrent /txt2img requests are coalesced into
one device program — a batcher thread drains the queue into up to
``--batch`` rows (mixed prompts/seeds/ids per row; requests queue up
naturally during the previous device call).  Every sample row gets its own
PRNG stream (``fold_in(key(seed), sample_idx)`` — per-sample keys in
``diffusion/sampler.py``), so a request's pixels are bit-identical no
matter what it is co-batched with or where it lands in the batch.
Requests larger than ``--batch`` are rejected with 400.

Usage:
    python -m celebbasis_tpu.cli.serve --config configs/aigc_id.yaml \
        --embedding_path logs/.../embeddings_gs-800.pt --port 8310
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


class _Job:
    __slots__ = ("prompt", "seed", "ids", "n", "event", "result", "error")

    def __init__(self, prompt, seed, ids, n):
        self.prompt, self.seed, self.ids, self.n = prompt, seed, ids, n
        self.event = threading.Event()
        self.result = None
        self.error = None


class TxtToImgService:
    """Owns the assembly + compiled graphs; a single batcher thread owns the
    device, so HTTP threads never race a TPU program."""

    def __init__(self, args, start_batcher: bool = True):
        from celebbasis_tpu.loader import assemble
        from celebbasis_tpu.utils.config import load_run_spec

        spec = load_run_spec(args.config)
        self.asm = assemble(
            spec, sd_ckpt=args.ckpt, vocab_path=args.vocab,
            embedding_ckpt=args.embedding_path, image_size=args.H,
            seed=args.seed,
            param_dtype=jnp.bfloat16 if args.precision == "bf16" else None)
        base_fn = self.asm.pipeline.make_txt2img_fn(
            num_steps=args.ddim_steps, guidance_scale=args.scale,
            eta=args.ddim_eta, image_size=args.H,
            sampler="plms" if args.plms else "ddim", output="uint8")

        # per-row seeds/offsets -> per-sample keys *inside* the graph (one
        # dispatch; eager key construction costs ~60 ms/op on this host)
        def fn(params, mstate, basis, tokens, uncond, ids, num_ids, seeds,
               offs):
            keys = jax.vmap(
                lambda s, o: jax.random.fold_in(jax.random.key(s), o)
            )(seeds, offs)
            return base_fn(params, mstate, basis, tokens, uncond, ids,
                           num_ids, keys)

        self.fn = jax.jit(fn)
        self._sampler_args = dict(
            num_steps=args.ddim_steps, guidance_scale=args.scale,
            eta=args.ddim_eta, image_size=args.H,
            sampler="plms" if args.plms else "ddim")
        self.batch = args.batch
        self.k = len(self.asm.pipeline.manager_cfg.placeholder_token_ids)
        self.default_ids = list(args.ids)
        self.image_size = args.H
        self.steps = args.ddim_steps
        self.window = args.batch_window_ms / 1e3
        self._lock = threading.Lock()   # one device program at a time
        self._queue: "queue.Queue[_Job|None]" = queue.Queue()
        self._carry: _Job | None = None  # job that didn't fit the last batch
        self._uncond = None              # cached "" token batch
        self._faces_fn = None            # lazily compiled on first request
        self.warm = False
        self.requests = 0
        self.batched_calls = 0
        self.batched_rows = 0
        self._batcher = threading.Thread(target=self._batch_loop,
                                         daemon=True, name="batcher")
        if start_batcher:
            self._batcher.start()

    def warmup(self):
        self.generate("a photo of a person", seed=0)
        self.warm = True

    def stop(self):
        self._queue.put(None)

    # -- continuous batcher -------------------------------------------------
    def _next_job(self, timeout):
        if self._carry is not None:
            job, self._carry = self._carry, None
            return job
        return self._queue.get(timeout=timeout)

    def _batch_loop(self):
        while True:
            try:
                job = self._next_job(timeout=None)
            except queue.Empty:      # pragma: no cover
                continue
            if job is None:
                return
            jobs, rows = [job], job.n
            deadline = time.perf_counter() + self.window
            while rows < self.batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._next_job(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    self._run_batch(jobs)
                    return
                if rows + nxt.n > self.batch:
                    self._carry = nxt   # head-of-line for the next batch
                    break
                jobs.append(nxt)
                rows += nxt.n
            self._run_batch(jobs)

    def _run_batch(self, jobs):
        try:
            prompts, ids_rows, nids, seeds, offs = [], [], [], [], []
            for job in jobs:
                row = (list(job.ids) + [0] * self.k)[:self.k]
                for j in range(job.n):
                    prompts.append(job.prompt)
                    ids_rows.append(row)
                    nids.append(len(job.ids))
                    seeds.append(job.seed)
                    offs.append(j)
            pad = self.batch - len(prompts)      # fixed compile shape
            prompts += [""] * pad
            ids_rows += [[0] * self.k] * pad
            nids += [0] * pad
            seeds += [0] * pad
            offs += [0] * pad
            tokens = jnp.asarray(self.asm.tokenizer(prompts))
            if self._uncond is None:
                self._uncond = jnp.asarray(
                    self.asm.tokenizer([""] * self.batch))
            uncond = self._uncond
            with self._lock:
                imgs = self.fn(
                    self.asm.params, self.asm.manager_state, self.asm.basis,
                    tokens, uncond,
                    jnp.asarray(np.asarray(ids_rows, np.int32)),
                    jnp.asarray(np.asarray(nids, np.int32)),
                    jnp.asarray(np.asarray(seeds, np.uint32)),
                    jnp.asarray(np.asarray(offs, np.uint32)))
                imgs = np.asarray(imgs)          # fetch inside the lock
            self.batched_calls += 1
            self.batched_rows += self.batch - pad
            at = 0
            for job in jobs:
                job.result = imgs[at:at + job.n]
                at += job.n
                self.requests += 1
                job.event.set()
        except Exception as e:               # noqa: BLE001 — report to caller
            for job in jobs:
                job.error = e
                job.event.set()

    # -- request API --------------------------------------------------------
    def generate(self, prompt: str, seed: int = 42, ids=None,
                 n_samples: int = 1) -> np.ndarray:
        """-> (n_samples, H, W, 3) uint8 pixels (quantized on device; the
        tunnel download is 4x smaller than fetching fp32).  Sample j of a
        request is keyed ``fold_in(key(seed), j)`` — deterministic across
        batch compositions."""
        if not (1 <= n_samples <= self.batch):
            raise ValueError(
                f"n_samples must be in [1, {self.batch}] (fixed compile "
                f"shape); got {n_samples}")
        job = _Job(prompt, int(seed),
                   list(self.default_ids if ids is None else ids), n_samples)
        self._queue.put(job)
        job.event.wait()
        if job.error is not None:
            raise job.error
        return job.result

    def generate_faces(self, prompt: str, faces_u8: np.ndarray,
                       seed: int = 42, n_samples: int = 1) -> np.ndarray:
        """Live-face personalization: ``faces_u8`` (k, H, W, 3) uint8 aligned
        crops; identity embeddings come from a MetaIdNet forward — the
        reference's test_mode='image' (stable_txt2img.py:271-318).  Compiles
        its own graph on first use (cached afterwards)."""
        if not (1 <= n_samples <= self.batch):
            raise ValueError(f"n_samples must be in [1, {self.batch}]")
        if self._faces_fn is None:
            self._faces_fn = self.asm.pipeline.make_txt2img_faces_fn(
                self.asm.meta_net, output="uint8", **self._sampler_args)
        B, k = self.batch, faces_u8.shape[0]
        faces = jnp.broadcast_to(
            jnp.asarray(faces_u8.astype(np.float32) / 127.5 - 1.0)[None],
            (B,) + faces_u8.shape)
        tokens = jnp.asarray(self.asm.tokenizer([prompt] * B))
        uncond = jnp.asarray(self.asm.tokenizer([""] * B))
        ids = jnp.asarray(np.tile(np.arange(k, dtype=np.int32), (B, 1)))
        num_ids = jnp.full((B,), k, jnp.int32)
        rng = jax.random.key(int(seed))
        with self._lock:
            imgs = np.asarray(self._faces_fn(
                self.asm.params, self.asm.meta_params, self.asm.basis,
                tokens, uncond, faces, ids, num_ids, rng))
            self.requests += 1
        return imgs[:n_samples]


def _decode_faces(b64_list, size: int) -> np.ndarray:
    """Base64 images -> (k, size, size, 3) uint8 aligned crops (the CLI's
    load_face_crops preprocessing, txt2img.py: Resize + [-1,1] normalize —
    normalization happens on device in generate_faces)."""
    from PIL import Image
    if not b64_list:
        raise ValueError("faces must be a non-empty list of base64 images")
    out = []
    for b in b64_list:
        img = Image.open(io.BytesIO(base64.b64decode(b))).convert("RGB")
        out.append(np.asarray(img.resize((size, size), Image.BILINEAR),
                              np.uint8))
    return np.stack(out)


def _png_b64(img: np.ndarray) -> str:
    from PIL import Image
    arr = (img if img.dtype == np.uint8
           else ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8))
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
                    "batched_calls": service.batched_calls,
                    "batched_rows": service.batched_rows,
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/txt2img", "/faces2img"):
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req["prompt"]
                t0 = time.perf_counter()
                if self.path == "/faces2img":
                    faces = _decode_faces(req["faces"], service.image_size)
                    imgs = service.generate_faces(
                        prompt, faces, seed=int(req.get("seed", 42)),
                        n_samples=int(req.get("n_samples", 1)))
                else:
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
                        "samples from the same graph, and concurrent "
                        "requests coalesce into one device call")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="how long the batcher waits for more requests after "
                        "the first before launching (requests also pile up "
                        "naturally during the previous device call)")
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
