"""Tracking-service tests: HTTP round-trip and micro-batching."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from deep_prob_feature_track_tpu.apps.serve import build_service, make_handler

    service = build_service("RGB", "", max_batch=4, H=32, W=40, batch_timeout_ms=20.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", service
    httpd.shutdown()
    service.stop()


def _payload(seed=0, H=32, W=40):
    rng = np.random.RandomState(seed)
    buf = io.BytesIO()
    np.savez(
        buf,
        color0=rng.rand(3, H, W).astype(np.float32),
        color1=rng.rand(3, H, W).astype(np.float32),
        depth0=rng.uniform(0.5, 3.0, (1, H, W)).astype(np.float32),
        depth1=rng.uniform(0.5, 3.0, (1, H, W)).astype(np.float32),
        calib=np.asarray([26.0, 26.0, 19.5, 15.5], np.float32),
    )
    return buf.getvalue()


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"


def test_track_roundtrip(server):
    url, _ = server
    req = urllib.request.Request(url + "/track", data=_payload(), method="POST")
    with urllib.request.urlopen(req) as r:
        out = np.load(io.BytesIO(r.read()))
    assert out["R"].shape == (3, 3)
    assert out["t"].shape == (3,)
    assert np.all(np.isfinite(out["t"]))


def test_track_concurrent_batched(server):
    url, service = server
    n0 = service.n_batches
    results = [None] * 6

    def call(i):
        req = urllib.request.Request(url + "/track", data=_payload(i), method="POST")
        with urllib.request.urlopen(req) as r:
            results[i] = np.load(io.BytesIO(r.read()))["t"]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and np.isfinite(r).all() for r in results)
    # 6 concurrent requests should need at most 6 batches; with
    # micro-batching usually fewer device calls than requests
    assert service.n_batches - n0 <= 6


def test_track_malformed_payload(server):
    url, _ = server
    req = urllib.request.Request(url + "/track", data=b"not-an-npz", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
