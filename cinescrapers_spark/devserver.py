"""Dev read API — the reference's little Flask file server re-expressed
over the engine's export artifacts (``/root/reference/devserver.py:10-38``:
``/cinescrapers.json``, ``/cinemas.json``, ``/thumbnails/<file>`` with
``Access-Control-Allow-Origin: *``).

Serving is a LAYER over artifacts the engine already writes — the Spark
work is in building them (``build_artifacts``: the showtimes export
projection and the cinemas dimension); the HTTP part is stdlib
(``http.server``), no Flask in this sandbox and none needed for three
static routes. ``make_server(port=0)`` binds an ephemeral port so tests
drive it over localhost.
"""

from __future__ import annotations

import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame


def build_artifacts(store, cinemas: DataFrame, out_dir: str, now) -> dict:
    """Write the two JSON artifacts the reference dev server fronts:
    ``cinescrapers.json`` (the current-showtimes export, same projection
    as export-json) and ``cinemas.json`` (the dimension). Returns
    {'showtimes': n, 'cinemas': n}."""
    os.makedirs(os.path.join(out_dir, "thumbnails"), exist_ok=True)
    rows = [r.asDict() for r in store.export_rows(now=now).collect()]
    with open(os.path.join(out_dir, "cinescrapers.json"), "w", encoding="utf-8") as f:
        json.dump(rows, f, default=str)
    cin = [r.asDict() for r in cinemas.orderBy("shortcode").collect()]
    with open(os.path.join(out_dir, "cinemas.json"), "w", encoding="utf-8") as f:
        json.dump(cin, f, default=str)
    return {"showtimes": len(rows), "cinemas": len(cin)}


class _Handler(BaseHTTPRequestHandler):
    artifact_dir = "."

    def log_message(self, *args):  # quiet in tests
        pass

    def _send_file(self, path: str, content_type: str) -> None:
        try:
            with open(path, "rb") as f:
                body = f.read()
        except OSError:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", content_type)
        # the reference sets CORS wide open for local frontend dev
        # (devserver.py:20,29)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        root = os.path.abspath(self.artifact_dir)
        if self.path == "/cinescrapers.json":
            self._send_file(
                os.path.join(root, "cinescrapers.json"), "application/json"
            )
        elif self.path == "/cinemas.json":
            self._send_file(os.path.join(root, "cinemas.json"), "application/json")
        elif self.path.startswith("/thumbnails/"):
            name = self.path[len("/thumbnails/") :]
            full = os.path.abspath(os.path.join(root, "thumbnails", name))
            # path-traversal guard: resolved target must stay inside the dir
            if not full.startswith(os.path.join(root, "thumbnails") + os.sep):
                self.send_error(404)
                return
            self._send_file(full, "application/octet-stream")
        else:
            self.send_error(404)


def make_server(artifact_dir: str, host: str = "127.0.0.1", port: int = 8080):
    """Bound server (not yet serving) — call ``serve_forever()`` /
    ``shutdown()``; ``port=0`` picks an ephemeral port
    (``server.server_address[1]``)."""
    handler = type("Handler", (_Handler,), {"artifact_dir": artifact_dir})
    return ThreadingHTTPServer((host, port), handler)


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="cinescrapers_spark.devserver")
    ap.add_argument("--artifacts", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    srv = make_server(args.artifacts, args.host, args.port)
    print(f"serving {args.artifacts} on {args.host}:{srv.server_address[1]}")
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
