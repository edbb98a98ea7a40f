"""SPICE reward service: the reference's HTTP file-handoff protocol, backed
by the in-repo approximate scorer (no Java).

The reference's RL pipeline scores SPICE against a persistent external Java
service: the client writes the jar-format input JSON to a shared filesystem
and issues `GET http://ip:port/test?in=<in>&out=<out>&cache=<dir>&subset=1
&silent=1`; the service runs SPICE, writes the jar-format output JSON to
`out`, and echoes it in the response body
(cider/pyciderevalcap/spiceD/spiceD.py:66-88). This module implements that
exact service contract over `metrics/spice_approx.py`, so both this repo's
`SpiceHTTPScorer` (metrics/spice.py) and the reference's own SpiceD client
can point `--ip/--port` here and the SCST SPICE reward works end-to-end
in-sandbox — with APPROXIMATE SPICE numbers (see spice_approx.py's header
for the deviation list). A real spice-1.0.jar service remains drop-in
compatible: nothing in the client side knows which backend answered.

CLI (console script `rfnet-spice-server`):
  rfnet-spice-server --port 8090 [--host 127.0.0.1] [--synonyms groups.txt]

SECURITY: the protocol hands FILESYSTEM PATHS to the service in query
params (the jar convention — client and service share a filesystem), so
any peer that can reach the socket can make it read/write files as this
process. The default bind is therefore loopback; set --host 0.0.0.0 only
on a trusted network where remote SCST workers share the filesystem.
"""

from __future__ import annotations

import argparse
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .spice_approx import spice_approx_runner

# scoring is CPU-bound pure Python: serialize it so N concurrent SCST
# workers queue instead of spawning N GIL-thrashing scorer threads (the
# ThreadingHTTPServer thread-per-request model only helps for IO)
_SCORE_LOCK = threading.Lock()


def make_handler(synonyms=None):
    class Handler(BaseHTTPRequestHandler):
        # bound how long a stalled client can pin a handler thread
        timeout = 120

        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/healthz":
                self._send(200, json.dumps(
                    {"ok": True, "backend": "spice_approx"}).encode())
                return
            if parsed.path != "/test":
                self._send(404, b'{"error": "unknown path"}')
                return
            q = urllib.parse.parse_qs(parsed.query)
            try:
                in_path = q["in"][0]
                out_path = q["out"][0]
                cache_dir = q.get("cache", [""])[0]
            except (KeyError, IndexError):
                self._send(400, b'{"error": "missing in/out params"}')
                return
            import os

            # distinguish the CLIENT's error (missing input file -> 400)
            # from OUR deployment errors (unwritable out dir -> 500): a
            # single FileNotFoundError catch blamed the input for both
            if not os.path.exists(in_path):
                self._send(400, json.dumps(
                    {"error": f"input file not found: {in_path}"}).encode())
                return
            try:
                # reads jar-format input, writes jar-format output to `out`
                with _SCORE_LOCK:
                    # the client may have TIMED OUT and deleted its input
                    # while we queued — skip the work and write nothing, or
                    # the recreated out file would orphan forever
                    if not os.path.exists(in_path):
                        self._send(503, b'{"error": "client gave up"}')
                        return
                    spice_approx_runner(in_path, out_path, cache_dir,
                                        synonyms=synonyms)
                with open(out_path, "rb") as f:
                    body = f.read()
            except Exception as e:  # malformed records, unwritable out, ...
                self._send(500, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode())
                return
            # the reference service responds with the result JSON body AND
            # leaves the out file in place (spiceD.py:74-88 reads both)
            self._send(200, body)

    return Handler


class _Server(ThreadingHTTPServer):
    daemon_threads = True
    request_queue_size = 64


def run_spice_server(host: str = "127.0.0.1", port: int = 8090,
                     synonyms=None) -> ThreadingHTTPServer:
    """Start the service; returns the running server (serve thread attached
    as ._serve_thread, same pattern as decoding/http_serve.run_server)."""
    httpd = _Server((host, port), make_handler(synonyms))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    httpd._serve_thread = thread
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--synonyms", default="",
                    help="optional synonym-groups file "
                         "(metrics.meteor.SynonymTable format)")
    args = ap.parse_args(argv)
    synonyms = None
    if args.synonyms:
        from .meteor import SynonymTable

        synonyms = SynonymTable.from_file(args.synonyms)
    httpd = run_spice_server(args.host, args.port, synonyms)
    print(f"approximate-SPICE service on {args.host}:{args.port} "
          f"(reference spiceD protocol; synonyms "
          f"{'user file' if synonyms else 'built-in'})")
    try:
        httpd._serve_thread.join()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
