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
