"""Serve a frozen artifact over HTTP with micro-batching.

    python tools/export.py --cfg_file <cfg> --ckpt <ckpt> --output out/model
    python tools/serve.py --artifact out/model --port 8008 [--max_wait_ms 20]

Protocol (stdlib only, no extra deps):
  POST /infer   body = raw little-endian float32 bytes of an (n, F) point
                array (F from the manifest), header X-Num-Feats optional
                sanity check.  Response: JSON {"boxes": [[...7]], "scores":
                [...], "labels": [...]}.
  GET  /stats   JSON micro-batching stats (occupancy, mean infer ms).
  GET  /health  200 once the module has warmed up.

Concurrent POSTs share device batches via com_tpu.serving.BatchServer — the
ThreadingHTTPServer handler threads block on their futures while the single
dispatch thread feeds the chip full (B, N, F) batches.
"""
import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True, help="artifact stem (no ext)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--max_wait_ms", type=float, default=20.0)
    p.add_argument("--score_thresh", type=float, default=0.1)
    args = p.parse_args()

    from com_tpu.serving import BatchServer
    from com_tpu.utils.serving import load_artifact

    run, manifest = load_artifact(Path(args.artifact))
    server = BatchServer(run, manifest["input_spec"],
                         max_wait_ms=args.max_wait_ms,
                         score_thresh=args.score_thresh)
    nf = server.num_feats
    ready = threading.Event()

    def warmup():
        server.infer(np.zeros((1, nf), np.float32))
        ready.set()

    threading.Thread(target=warmup, daemon=True).start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/health":
                self._json(200 if ready.is_set() else 503,
                           {"ready": ready.is_set(),
                            "model": manifest["model"],
                            "classes": manifest["class_names"]})
            elif self.path == "/stats":
                self._json(200, server.stats.as_dict())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/infer":
                return self._json(404, {"error": "unknown path"})
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            if len(raw) % (4 * nf):
                return self._json(400, {
                    "error": f"body must be float32 (n, {nf}) bytes"})
            hdr_nf = self.headers.get("X-Num-Feats")
            if hdr_nf is not None and hdr_nf != str(nf):
                return self._json(400, {
                    "error": f"X-Num-Feats={hdr_nf} but the artifact "
                             f"expects {nf} features per point"})
            pts = np.frombuffer(raw, np.float32).reshape(-1, nf)
            try:
                out = server.infer(pts)
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except TimeoutError:
                return self._json(503, {"error": "inference queue timed out"})
            except Exception as e:  # surface as JSON, not a dropped socket
                return self._json(500, {
                    "error": f"{type(e).__name__}: {e}"})
            self._json(200, {
                "boxes": out["boxes"].tolist(),
                "scores": out["scores"].tolist(),
                "labels": out["labels"].tolist(),
            })

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving {manifest['model']} on http://{args.host}:{args.port} "
          f"(batch {server.batch_size}, cap {server.max_points} pts)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
