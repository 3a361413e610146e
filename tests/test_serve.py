"""Serving daemon: warm fixed-shape graph behind HTTP (cli/serve.py).

Drives the real ThreadingHTTPServer end-to-end on the tiny config:
health check, PNG round-trip, seed determinism, fixed-shape batch limit.
"""
import base64
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    from celebbasis_tpu.cli.serve import (TxtToImgService, build_argparser,
                                          make_handler)

    cfg = os.path.join(REPO, "configs", "tiny.yaml")
    args = build_argparser().parse_args([
        "--config", cfg, "--H", "32", "--ddim_steps", "4", "--batch", "2",
        "--precision", "fp32", "--ids", "0",
    ])
    service = TxtToImgService(args)
    service.warmup()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url + "/txt2img", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _decode(b64):
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def test_healthz(server):
    url, service = server
    with urllib.request.urlopen(url + "/healthz") as r:
        h = json.loads(r.read())
    assert h["ok"] and h["warm"] and h["batch"] == 2


def test_txt2img_roundtrip_and_determinism(server):
    url, _ = server
    code, a = _post(url, {"prompt": "a photo of a sks person", "seed": 7,
                          "n_samples": 2})
    assert code == 200 and len(a["images"]) == 2 and a["ms"] > 0
    img = _decode(a["images"][0])
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    code, b = _post(url, {"prompt": "a photo of a sks person", "seed": 7,
                          "n_samples": 2})
    assert code == 200
    np.testing.assert_array_equal(_decode(a["images"][0]),
                                  _decode(b["images"][0]))

    code, c = _post(url, {"prompt": "a photo of a sks person", "seed": 8})
    assert code == 200 and len(c["images"]) == 1
    assert np.abs(_decode(c["images"][0]).astype(int)
                  - _decode(a["images"][0]).astype(int)).sum() > 0


def test_bad_requests(server):
    url, _ = server
    code, e = _post(url, {"prompt": "x", "n_samples": 3})
    assert code == 400 and "n_samples" in e["error"]
    code, e = _post(url, {"n_samples": 1})
    assert code == 400
    with urllib.request.urlopen(url + "/healthz") as r:
        assert json.loads(r.read())["ok"]    # server survived the 400s


def test_concurrent_requests_serialized(server):
    """Two parallel posts both succeed — the device lock serializes them."""
    url, service = server
    before = service.requests
    results = []

    def go(seed):
        results.append(_post(url, {"prompt": "a photo of a sks person",
                                   "seed": seed}))

    ts = [threading.Thread(target=go, args=(s,)) for s in (1, 2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert all(code == 200 for code, _ in results)
    assert service.requests == before + 2


def _post_path(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_continuous_batching_coalesces_and_is_deterministic(server):
    """Two concurrent 1-sample requests run in ONE device call, and each
    request's pixels are identical to what it gets when served alone —
    per-sample PRNG streams make results independent of batch
    composition."""
    url, service = server
    # solo references (batcher idle -> each is its own call)
    _, solo_a = _post(url, {"prompt": "a photo of a sks person", "seed": 21})
    _, solo_b = _post(url, {"prompt": "a portrait of a sks person",
                            "seed": 22})
    old_window = service.window
    service.window = 1.0          # generous coalescing window for the test
    try:
        calls_before = service.batched_calls
        results = {}

        def go(name, prompt, seed):
            results[name] = _post(url, {"prompt": prompt, "seed": seed})

        ts = [threading.Thread(target=go,
                               args=("a", "a photo of a sks person", 21)),
              threading.Thread(target=go,
                               args=("b", "a portrait of a sks person", 22))]
        [t.start() for t in ts]
        [t.join() for t in ts]
    finally:
        service.window = old_window
    assert all(code == 200 for code, _ in results.values())
    assert service.batched_calls == calls_before + 1, \
        "concurrent requests were not coalesced into one device call"
    np.testing.assert_array_equal(_decode(results["a"][1]["images"][0]),
                                  _decode(solo_a["images"][0]))
    np.testing.assert_array_equal(_decode(results["b"][1]["images"][0]),
                                  _decode(solo_b["images"][0]))


def test_multi_sample_row_matches_single(server):
    """Sample j of a request is keyed fold_in(key(seed), j): the first row
    of an n_samples=2 request equals the lone sample of an n_samples=1
    request with the same seed."""
    url, _ = server
    _, two = _post(url, {"prompt": "a photo of a sks person", "seed": 33,
                         "n_samples": 2})
    _, one = _post(url, {"prompt": "a photo of a sks person", "seed": 33})
    np.testing.assert_array_equal(_decode(two["images"][0]),
                                  _decode(one["images"][0]))
    assert np.abs(_decode(two["images"][1]).astype(int)
                  - _decode(two["images"][0]).astype(int)).sum() > 0


def test_faces2img_endpoint(server):
    """Live-face personalization over HTTP: uploaded aligned crops ->
    MetaIdNet identity embeddings -> pixels; deterministic per seed."""
    from PIL import Image
    url, service = server
    rng = np.random.default_rng(5)
    face = rng.integers(0, 256, (40, 40, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(face).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode("ascii")

    code, a = _post_path(url, "/faces2img",
                         {"prompt": "a photo of a sks person",
                          "faces": [b64], "seed": 11})
    assert code == 200 and len(a["images"]) == 1
    img = _decode(a["images"][0])
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    code, b = _post_path(url, "/faces2img",
                         {"prompt": "a photo of a sks person",
                          "faces": [b64], "seed": 11})
    assert code == 200
    np.testing.assert_array_equal(_decode(a["images"][0]),
                                  _decode(b["images"][0]))
    code, e = _post_path(url, "/faces2img", {"prompt": "x", "faces": []})
    assert code == 400
