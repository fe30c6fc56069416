"""HTTP serving front end over Predictor/ServingQueue (stdlib-only).

    python -m retr_tpu.serve --checkpoint data/models/refcoco/Concat_refcoco_checkpoint_7 \
        [--host 0.0.0.0] [--port 8000] [--max-batch 32] [--decoder greedy] \
        [--max-wait-s 0.05]

Endpoints:
- ``POST /predict``  body ``{"image": <base64 PNG/JPEG> | "image_path": <path under
  the --allow-local-paths root; disabled by default>, "bbox": [x, y, w, h]}`` →
  ``{"expression": "..."}``. Concurrent requests are
  dynamically batched by the ServingQueue (pipelined dispatch/collect — see
  predictor.py; measured 141 req/s saturation, p50 0.31-0.63 s on one v5e chip,
  docs/BENCH_SERVING.json). Under overload the bounded admission queue sheds:
  HTTP 503 with a Retry-After header (and ``retry_after_s`` in the body) instead
  of an unbounded-latency backlog (--max-queued).
- ``GET /healthz``  → ``{"ok": true, "device": "...", "queue": {admission stats}}``.

The reference has no serving surface at all (its only single-request path is the
notebook helper eval_utils/decode.py:30-50, one full model rerun per token); this
plus Predictor is the framework's production-serving layer.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _decode_image(payload: dict, image_root: "str | None" = None) -> np.ndarray:
    if "image" in payload:
        from PIL import Image

        raw = base64.b64decode(payload["image"])
        return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    if "image_path" in payload:
        # 'image_path' reads files from the server host, so it is disabled unless
        # the operator opted in with --allow-local-paths ROOT; even then only
        # paths inside ROOT resolve (symlinks included) — a remote client must
        # not be able to probe arbitrary files through the image loader.
        if image_root is None:
            raise ValueError("'image_path' is disabled (start with --allow-local-paths)")
        import os

        root = os.path.realpath(image_root)
        p = os.path.realpath(os.path.join(root, payload["image_path"]))
        if os.path.commonpath([p, root]) != root:
            raise ValueError("image_path escapes the allowed root")
        from retr_tpu.data.preprocess import load_image

        return load_image(p)
    raise ValueError("request needs 'image' (base64) or 'image_path'")


def make_server(queue, host: str = "127.0.0.1", port: int = 8000,
                request_timeout_s: float = 120.0,
                image_root: "str | None" = None) -> ThreadingHTTPServer:
    """Build (don't start) the HTTP server bound to a ServingQueue. Separated from
    main() so tests can run it on an ephemeral port in-process."""
    import jax

    from retr_tpu.predictor import ServingOverloaded

    device = str(jax.devices()[0])

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict, headers: "dict | None" = None) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._send(200, {"ok": True, "device": device,
                                 "queue": queue.stats()})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                img = _decode_image(payload, image_root)
                bbox = payload["bbox"]
                fut = queue.submit(img, bbox)
                text = fut.result(timeout=request_timeout_s)
                self._send(200, {"expression": text})
            except ServingOverloaded as exc:
                # Load shed: tell the client when to come back instead of
                # queueing it into a minutes-deep backlog (docs/BENCH_SERVING.json
                # soak section records the bounded tail this buys).
                self._send(503, {"error": "overloaded",
                                 "retry_after_s": round(exc.retry_after_s, 3)},
                           headers={"Retry-After":
                                    str(max(1, int(round(exc.retry_after_s))))})
            except Exception as exc:  # per-request error -> 400, server stays up
                # generic body: exception text can echo host paths/internals
                self._send(400, {"error": type(exc).__name__})

        def log_message(self, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="retr_tpu checkpoint dir or reference .pth")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-s", type=float, default=0.05)
    ap.add_argument("--max-queued", type=int, default=None,
                    help="admission bound: requests queued beyond this are shed "
                    "with HTTP 503 + Retry-After (default 4 * max_batch)")
    ap.add_argument("--decoder", default="greedy", choices=["greedy", "beam", "sample"])
    ap.add_argument("--allow-local-paths", default=None, metavar="ROOT",
                    help="enable 'image_path' requests, restricted to this directory")
    args = ap.parse_args()

    from retr_tpu.predictor import Predictor, ServingQueue

    pred = Predictor.from_checkpoint(args.checkpoint, max_batch=args.max_batch)
    queue = ServingQueue(pred, max_wait_s=args.max_wait_s, decoder=args.decoder,
                         max_queued=args.max_queued)
    server = make_server(queue, args.host, args.port,
                         image_root=args.allow_local_paths)
    print(f"serving on http://{args.host}:{args.port} (decoder={args.decoder}, "
          f"max_batch={args.max_batch})")

    # SIGTERM (orchestrators' stop signal) takes the same graceful path as ^C:
    # stop accepting, then drain the standing queue so accepted requests finish
    # (ServingQueue.close(wait=True) — drain asserted under overload in the soak
    # artifact, docs/BENCH_SERVING.json).
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        queue.close(wait=True)


if __name__ == "__main__":
    main()


def run_in_thread(queue, host="127.0.0.1", port=0, image_root=None):
    """Start the server on an ephemeral port in a daemon thread; returns
    (server, base_url). Used by tests and notebook demos."""
    server = make_server(queue, host, port, image_root=image_root)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://{server.server_address[0]}:{server.server_address[1]}"
