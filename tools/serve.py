"""HTTP pose-serving daemon over an exported pipeline artifact.

The reference has no serving story (research checkpoints + python eval
loops, ref tools/train_linemod.py); pvnet-tpu's deployment path is a
weights-baked jax.export artifact (tools/export.py) plus this daemon:
a dependency-free (stdlib http.server) front that micro-batches
concurrent requests into the artifact's fixed batch shape and runs one
device call per window — the pattern production TPU serving needs, since
the compiled program has a static batch and per-request dispatch would
waste the chip.

  python tools/serve.py --export_dir export_out [--port 8400]
      [--max_wait_ms 10]

API:
  GET  /healthz          -> {"status": "ok", ...manifest...}
  POST /pose             -> {"pose": [3,4], "keypoints": [vn,2]}
      body: image file bytes (PNG/JPEG, decoded to RGB and resized to the
      artifact's HxW if needed) or a .npy array [h,w,3] (uint8 or f32).
      Raw images are ImageNet-normalized server-side; pass
      "X-Normalized: 1" if the payload already is.

Throughput: requests arriving within --max_wait_ms share one batched
device call; a lone request pays the full batch anyway (static shape),
so latency under load ~= latency idle while throughput scales to
batch/call.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class PoseBatcher:
    """Micro-batching wrapper around the exported fn."""

    def __init__(self, fn, batch: int, height: int, width: int,
                 max_wait_ms: float = 10.0, request_timeout: float = 600.0,
                 input_dtype=np.float32):
        self.fn = fn
        self.batch, self.h, self.w = batch, height, width
        self.input_dtype = input_dtype
        self.max_wait = max_wait_ms / 1e3
        self.request_timeout = request_timeout
        self.q: "queue.Queue" = queue.Queue()
        self.seed = 0
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def warmup(self):
        """Run one batched call before accepting traffic: the first
        dispatch compiles (minutes on a cold cache through the TPU
        tunnel) and would otherwise burn the first requests' timeout."""
        import jax.numpy as jnp
        t0 = time.monotonic()
        self.fn.call(jnp.zeros((self.batch, self.h, self.w, 3),
                               self.input_dtype), jnp.int32(0))
        return time.monotonic() - t0

    def infer(self, image: np.ndarray, timeout: float = None):
        """image: [h, w, 3] float32 (normalized). Returns (pose, kps)."""
        done = threading.Event()
        slot = {}
        self.q.put((image, slot, done))
        if not done.wait(self.request_timeout if timeout is None else timeout):
            raise TimeoutError("inference timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["pose"], slot["kps"]

    def close(self):
        self._stop = True
        self.q.put(None)
        self.thread.join(timeout=5)

    def _loop(self):
        import jax.numpy as jnp
        while not self._stop:
            item = self.q.get()
            if item is None:
                continue
            pending = [item]
            deadline = time.monotonic() + self.max_wait
            while len(pending) < self.batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    continue
                pending.append(nxt)
            imgs = np.zeros((self.batch, self.h, self.w, 3),
                            self.input_dtype)
            for i, (im, _, _) in enumerate(pending):
                imgs[i] = im
            try:
                self.seed += 1
                pose, kps = self.fn.call(jnp.asarray(imgs),
                                         jnp.int32(self.seed))
                pose = np.asarray(pose)
                kps = np.asarray(kps)
                for i, (_, slot, done) in enumerate(pending):
                    slot["pose"] = pose[i]
                    slot["kps"] = kps[i]
                    done.set()
            except Exception as e:                     # surface to callers
                for _, slot, done in pending:
                    slot["error"] = repr(e)
                    done.set()


def decode_image(body: bytes, content_type: str, h: int, w: int,
                 normalized: bool, raw_uint8: bool = False) -> np.ndarray:
    """Request body -> [h, w, 3] float32 ImageNet-normalized, or raw
    uint8 for packed-stem artifacts (normalization runs on device)."""
    from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    if content_type == "application/x-npy" or body[:6] == b"\x93NUMPY":
        arr = np.load(io.BytesIO(body), allow_pickle=False)
    else:
        from PIL import Image
        arr = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
    arr = np.asarray(arr)
    if arr.shape[:2] != (h, w):
        from PIL import Image
        if np.issubdtype(arr.dtype, np.floating):
            # already-normalized floats: resize per channel in 'F' mode —
            # a uint8 cast would wrap negatives/fractions into garbage
            arr = np.stack([
                np.asarray(Image.fromarray(
                    arr[..., ch].astype(np.float32), mode="F").resize(
                        (w, h), Image.BILINEAR))
                for ch in range(arr.shape[-1])], axis=-1)
        else:
            arr = np.asarray(Image.fromarray(
                arr.astype(np.uint8)).resize((w, h), Image.BILINEAR))
    if raw_uint8:
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.clip(arr * (255.0 if arr.max() <= 2.0 else 1.0),
                          0, 255)
        return arr.astype(np.uint8)
    arr = arr.astype(np.float32)
    if normalized:
        return arr
    if arr.max() > 2.0:                                # uint8 range
        arr = arr / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def make_handler(batcher: PoseBatcher, manifest: dict):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "batch": batcher.batch,
                                 "height": batcher.h, "width": batcher.w,
                                 "vn": manifest.get("vn"),
                                 "weights": manifest.get("weights")})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/pose":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                img = decode_image(
                    body, self.headers.get("Content-Type", ""),
                    batcher.h, batcher.w,
                    self.headers.get("X-Normalized") == "1",
                    raw_uint8=batcher.input_dtype == np.uint8)
                pose, kps = batcher.infer(img)
                self._send(200, {"pose": pose.tolist(),
                                 "keypoints": kps.tolist()})
            except Exception as e:
                self._send(400, {"error": repr(e)})

        def log_message(self, fmt, *a):                # quiet by default
            pass

    return Handler


def load_artifact(export_dir: str):
    from jax import export as jexport
    with open(os.path.join(export_dir, "pipeline.jaxexport"), "rb") as f:
        fn = jexport.deserialize(f.read())
    with open(os.path.join(export_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return fn, manifest


def serve(export_dir: str, host: str = "0.0.0.0", port: int = 8400,
          max_wait_ms: float = 10.0, started: "threading.Event" = None):
    from http.server import ThreadingHTTPServer
    fn, manifest = load_artifact(export_dir)
    batcher = PoseBatcher(
        fn, manifest["batch"], manifest["height"], manifest["width"],
        max_wait_ms,
        input_dtype=(np.uint8 if manifest.get("input_dtype") == "uint8"
                     else np.float32))
    dt = batcher.warmup()
    print(f"warmup compile: {dt:.1f}s", flush=True)
    httpd = ThreadingHTTPServer((host, port), make_handler(batcher, manifest))
    if started is not None:
        started.server = httpd                          # for tests
        started.set()
    print(f"serving {export_dir} (batch {manifest['batch']}, "
          f"{manifest['height']}x{manifest['width']}) on {host}:{port}")
    try:
        httpd.serve_forever()
    finally:
        batcher.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export_dir", default="export_out")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    args = ap.parse_args()
    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
    enable_compilation_cache()
    serve(args.export_dir, args.host, args.port, args.max_wait_ms)
    return 0


if __name__ == "__main__":
    sys.exit(main())
