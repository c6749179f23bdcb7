"""Batched two-view tracking service (HTTP + npz payloads).

A minimal production-serving runtime around the tracker: requests are
queued, micro-batched up to ``--max_batch`` (or flushed after
``--batch_timeout_ms``), padded to the compiled batch size and dispatched
as ONE device call; per-request poses return as npz.  The device runs a
single jitted program with a static batch shape, so there is exactly one
compilation and requests never retrace.

    POST /track   body: npz with color0/color1 [3,H,W] float32 in [0,1],
                  depth0/depth1 [1,H,W] float32 meters, calib [4]
                  -> npz with R [3,3], t [3]
    GET  /healthz -> {"status": "ok", ...}

Run: python -m deep_prob_feature_track_tpu.apps.serve --preset feature \
        --checkpoint ckpt.msgpack --port 8642
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class TrackingService:
    """Micro-batching dispatcher around a jitted fixed-batch forward."""

    def __init__(self, forward_fn, max_batch: int = 8, batch_timeout_ms: float = 5.0,
                 expected_hw=None):
        self.forward_fn = forward_fn
        self.max_batch = max_batch
        self.expected_hw = expected_hw  # (H, W) the program was compiled for
        self.batch_timeout = batch_timeout_ms / 1e3
        self.requests: "queue.Queue" = queue.Queue()
        self.n_served = 0
        self.n_batches = 0
        self._stop = False
        self.worker = threading.Thread(target=self._loop, daemon=True)
        self.worker.start()

    def submit(self, item: dict, timeout: float = 120.0) -> dict:
        """Blocking request: returns {'R': [3,3], 't': [3]}.

        Raises ValueError for shape mismatches (a different resolution
        would silently retrace the fixed-shape program) and RuntimeError
        if the dispatcher failed or timed out.
        """
        if self.expected_hw is not None:
            H, W = self.expected_hw
            if item["color0"].shape != (3, H, W):
                raise ValueError(
                    f"payload color0 shape {item['color0'].shape} != compiled (3,{H},{W})"
                )
            if item["depth0"].shape != (1, H, W):
                raise ValueError(
                    f"payload depth0 shape {item['depth0'].shape} != compiled (1,{H},{W})"
                )
        done = threading.Event()
        slot = {"item": item, "done": done, "out": None, "error": None}
        self.requests.put(slot)
        if not done.wait(timeout):
            raise RuntimeError("tracking request timed out")
        if slot["error"] is not None:
            raise RuntimeError(slot["error"])
        return slot["out"]

    def stop(self):
        self._stop = True

    def _loop(self):
        import jax.numpy as jnp

        while not self._stop:
            try:
                first = self.requests.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.batch_timeout
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.requests.get(timeout=remaining))
                except queue.Empty:
                    break

            n = len(batch)
            try:
                pad = self.max_batch - n
                stacked = {
                    k: np.stack(
                        [s["item"][k] for s in batch] + [batch[-1]["item"][k]] * pad
                    )
                    for k in ("color0", "color1", "depth0", "depth1", "calib")
                }
                R, t = self.forward_fn(
                    jnp.asarray(stacked["color0"]),
                    jnp.asarray(stacked["color1"]),
                    jnp.asarray(stacked["depth0"]),
                    jnp.asarray(stacked["depth1"]),
                    jnp.asarray(stacked["calib"]),
                )
                R = np.asarray(R)
                t = np.asarray(t)
                for i, slot in enumerate(batch):
                    slot["out"] = {"R": R[i], "t": t[i]}
                    slot["done"].set()
                self.n_served += n
                self.n_batches += 1
            except Exception as e:  # fail the batch, keep the worker alive
                for slot in batch:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    slot["done"].set()


def make_handler(service: TrackingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps(
                    {
                        "status": "ok",
                        "served": service.n_served,
                        "batches": service.n_batches,
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/track":
                self.send_response(404)
                self.end_headers()
                return
            try:
                length = int(self.headers["Content-Length"])
                data = np.load(io.BytesIO(self.rfile.read(length)))
                item = {k: np.asarray(data[k], np.float32)
                        for k in ("color0", "color1", "depth0", "depth1", "calib")}
            except Exception as e:  # malformed payload
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                out = service.submit(item)
            except (ValueError, RuntimeError) as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400 if isinstance(e, ValueError) else 500)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            buf = io.BytesIO()
            np.savez(buf, R=out["R"], t=out["t"])
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def build_service(preset: str, checkpoint: str, max_batch: int, H=120, W=160,
                  batch_timeout_ms: float = 5.0):
    import jax
    import jax.numpy as jnp

    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking

    net = LeastSquareTracking(cfg=get_preset(preset))
    rng = np.random.RandomState(0)
    ex = (
        jnp.asarray(rng.rand(max_batch, 3, H, W), jnp.float32),
        jnp.asarray(rng.rand(max_batch, 3, H, W), jnp.float32),
        jnp.asarray(rng.rand(max_batch, 1, H, W) + 0.5, jnp.float32),
        jnp.asarray(rng.rand(max_batch, 1, H, W) + 0.5, jnp.float32),
        jnp.asarray(np.tile([[131.25, 131.25, 79.875, 59.875]], (max_batch, 1)), jnp.float32),
    )
    if checkpoint:
        from ..training.checkpoints import restore_variables

        raw = restore_variables(checkpoint)
        variables = (
            {"params": raw["params"], "batch_stats": raw["batch_stats"]}
            if "params" in raw
            else raw
        )
    else:
        variables = net.init(jax.random.PRNGKey(0), *ex, train=False)

    forward = jax.jit(lambda *a: net.apply(variables, *a, train=False))
    # warm the compile before serving traffic
    jax.block_until_ready(forward(*ex))
    return TrackingService(
        forward, max_batch=max_batch, batch_timeout_ms=batch_timeout_ms,
        expected_hw=(H, W),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="Two-view tracking service")
    p.add_argument("--preset", default="feature")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--port", type=int, default=8642)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_timeout_ms", type=float, default=5.0)
    args = p.parse_args(argv)

    service = build_service(args.preset, args.checkpoint, args.max_batch,
                            batch_timeout_ms=args.batch_timeout_ms)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(service))
    print(f"[serve] tracking service on :{args.port} (max_batch={args.max_batch})")
    server.serve_forever()


if __name__ == "__main__":
    raise SystemExit(main())
