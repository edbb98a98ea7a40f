"""asyncio HTTP front end for CaptionService: ingest past the thread-server.

The threading front end (http_serve.py) tops out around ~270 req/s — each
request burns a Python thread on header parsing + a blocking Future wait,
and the GIL serializes them. This front end serves the same endpoints from
ONE event loop: asyncio stream parsing, keep-alive connections, and
`asyncio.wrap_future` bridging the CaptionServer's concurrent Futures into
awaitables, so thousands of in-flight requests cost coroutines instead of
threads. The TPU side is unchanged — requests still coalesce into
CaptionServer's static-shape batches; only the HTTP ingest path scales.

Measured on the bench host (tiny model, 64 concurrent keep-alive clients):
see PERF_NOTES.md §4f — the asyncio loop sustains >1k req/s where the
threading server saturated at ~270.

stdlib-only. Endpoints match http_serve.py:
  GET  /healthz        -> service status JSON
  POST /caption        -> {"fc": [...], "att": [...]} JSON, or binary npz
                          (Content-Type application/x-npz; fc_0../att_0..
                          arrays — http_serve.parse_features_payload) ->
                          caption JSON

Raw-image extraction (`/caption_image`) stays on the threading server: PIL
decode is CPU-bound work that would block the loop; bulk image pipelines
should use the in-process API (eval_folder / CaptionServer).
"""

from __future__ import annotations

import asyncio
import json
import threading
from typing import Optional

import numpy as np

_MAX_HEADER = 64 * 1024


def _max_body() -> int:
    from .http_serve import MAX_BODY  # one cap for both front ends

    return MAX_BODY


def _response(code: int, body: bytes, keep_alive: bool) -> bytes:
    reason = {200: "OK", 400: "Bad Request", 404: "Not Found",
              413: "Payload Too Large", 500: "Internal Server Error",
              503: "Service Unavailable"}
    return (
        f"HTTP/1.1 {code} {reason.get(code, 'OK')}\r\n"
        f"Content-Type: application/json\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"Connection: {'keep-alive' if keep_alive else 'close'}\r\n"
        "\r\n"
    ).encode() + body


class AsyncCaptionFrontend:
    """One event loop serving CaptionService over HTTP/1.1 keep-alive."""

    def __init__(self, service):
        self.service = service
        self._server: Optional[asyncio.AbstractServer] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._thread: Optional[threading.Thread] = None
        self._started = threading.Event()
        self.port: Optional[int] = None
        # requests past header parse and not yet responded — read by the
        # drain path; loop-confined writes (the event loop is one thread)
        self._inflight = 0
        # set by the drain path: handlers stop admitting NEW requests (the
        # listener close alone only blocks new CONNECTIONS — existing
        # keep-alive clients would keep the drain from ever reaching zero)
        self._draining = False

    # ------------------------------------------------------------- request

    async def _caption(self, payload: bytes, content_type: str = "") -> tuple:
        from .http_serve import parse_features_payload

        try:
            fcs, atts = parse_features_payload(payload, content_type)
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
            return 400, {"error": f"{type(e).__name__}: {e}"}
        try:
            fut = self.service.server.submit(fcs, atts)
        except ValueError as e:  # shape-contract violation: caller's fault
            return 400, {"error": f"{type(e).__name__}: {e}"}
        except RuntimeError as e:  # server closed/closing: RETRYABLE — a
            # rolling restart needs clients/load-balancers to see 503, not
            # "your request was malformed"
            return 503, {"error": f"{type(e).__name__}: {e}"}
        try:
            row = await asyncio.wrap_future(fut)
        except Exception as e:  # device/batch failure
            return 500, {"error": f"{type(e).__name__}: {e}"}
        # shared row postprocessing: one EOS/logprob semantics for both
        # front ends (http_serve.CaptionService.postprocess_row)
        return 200, self.service.postprocess_row(row)

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        try:
            while True:
                if self._draining:
                    # graceful stop: cut this keep-alive connection instead
                    # of admitting another request (HTTP/1.1 clients treat
                    # the close-between-requests as normal)
                    return
                try:
                    head = await reader.readuntil(b"\r\n\r\n")
                except asyncio.IncompleteReadError:
                    return  # client closed between requests
                except asyncio.LimitOverrunError:
                    # the oversize-header cap: start_server(limit=_MAX_HEADER)
                    # makes readuntil raise before a longer head can return
                    writer.write(_response(413, b'{"error":"headers"}', False))
                    await writer.drain()
                    return
                lines = head.decode("latin-1").split("\r\n")
                try:
                    method, path, _ = lines[0].split(" ", 2)
                except ValueError:
                    writer.write(_response(400, b'{"error":"request line"}',
                                           False))
                    await writer.drain()
                    return
                headers = {}
                for ln in lines[1:]:
                    if ":" in ln:
                        k, v = ln.split(":", 1)
                        headers[k.strip().lower()] = v.strip()
                try:
                    length = int(headers.get("content-length", 0) or 0)
                except ValueError:
                    length = -1
                if length < 0:
                    writer.write(_response(
                        400, b'{"error":"content-length"}', False))
                    await writer.drain()
                    return
                if length > _max_body():
                    writer.write(_response(413, b'{"error":"body"}', False))
                    await writer.drain()
                    return
                try:
                    body = await reader.readexactly(length) if length else b""
                except asyncio.IncompleteReadError:
                    return  # client closed mid-body (not Connection*Error)
                keep = headers.get("connection", "keep-alive").lower() != "close"

                # request-level in-flight accounting: graceful stop (drain)
                # waits for requests being PROCESSED, not for idle keep-alive
                # connections parked in readuntil above
                self._inflight += 1
                try:
                    if method == "GET" and path == "/healthz":
                        code, payload = 200, {
                            "ok": True,
                            "model": type(self.service.model).__name__,
                            "batch_size": self.service.batch_size,
                            "beam_size": self.service.beam_size,
                            "frontend": "asyncio",
                            "stats": dict(self.service.server.stats),
                        }
                    elif method == "POST" and path == "/caption":
                        code, payload = await self._caption(
                            body, headers.get("content-type", ""))
                    else:
                        code, payload = 404, {"error": "unknown path"}
                    writer.write(_response(code, json.dumps(payload).encode(),
                                           keep))
                    await writer.drain()
                finally:
                    self._inflight -= 1
                if not keep:
                    return
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    # ------------------------------------------------------------ lifecycle

    async def _serve(self, host: str, port: int) -> None:
        self._server = await asyncio.start_server(
            self._handle, host, port, limit=_MAX_HEADER, backlog=512
        )
        self.port = self._server.sockets[0].getsockname()[1]
        self._started.set()
        async with self._server:
            await self._server.serve_forever()

    def start(self, host: str = "0.0.0.0", port: int = 8080) -> None:
        """Run the loop in a daemon thread (same embedding model as
        http_serve.run_server); returns once the socket is listening."""
        startup_error: list = []

        def run():
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            try:
                self._loop.run_until_complete(self._serve(host, port))
            except asyncio.CancelledError:
                pass
            except Exception as e:  # e.g. OSError(EADDRINUSE) from bind
                startup_error.append(e)
                self._started.set()  # unblock start() immediately
            finally:
                # let just-cancelled handler tasks finish unwinding (their
                # finally blocks await writer.wait_closed()) before closing
                # the loop — closing with pending tasks leaks sockets and
                # spews 'Task was destroyed but it is pending'
                try:
                    pending = asyncio.all_tasks(self._loop)
                    if pending:
                        self._loop.run_until_complete(asyncio.wait(
                            pending, timeout=5
                        ))
                except Exception:
                    pass
                self._loop.close()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        if not self._started.wait(timeout=30):
            raise RuntimeError("asyncio front end failed to start")
        if startup_error:
            raise RuntimeError(
                f"asyncio front end failed to start: {startup_error[0]}"
            ) from startup_error[0]

    def stop(self, drain: bool = False, timeout: float = 30.0) -> None:
        """Stop the front end.

        drain=False: cancel everything immediately (tests/teardown).
        drain=True (graceful shutdown, e.g. SIGTERM): close the listening
        socket first — no new connections — then wait up to `timeout` for
        requests already past header parse to get their responses, and only
        then cancel the remaining tasks (idle keep-alive connections parked
        between requests are cut without a response, which HTTP/1.1 clients
        treat as a normal connection close)."""
        if self._loop is None:
            return
        if drain:
            drained = threading.Event()

            async def _drain():
                self._draining = True  # handlers stop admitting new requests
                if self._server is not None:
                    # close the listener WITHOUT awaiting wait_closed():
                    # on Python >= 3.12.1 wait_closed() waits for every
                    # CONNECTION to drop, so one idle keep-alive client
                    # would stall the drain for the full timeout
                    self._server.close()
                deadline = self._loop.time() + timeout
                while self._inflight and self._loop.time() < deadline:
                    await asyncio.sleep(0.01)
                drained.set()

            try:
                fut = asyncio.run_coroutine_threadsafe(_drain(), self._loop)
                drained.wait(timeout=timeout + 1)
                fut.cancel()
            except RuntimeError:  # loop already closing
                pass

        def shutdown():
            for task in asyncio.all_tasks(self._loop):
                task.cancel()

        try:
            self._loop.call_soon_threadsafe(shutdown)
        except RuntimeError:
            pass
        self._thread.join(timeout=10)


def run_server_async(service, host: str = "0.0.0.0",
                     port: int = 8080) -> AsyncCaptionFrontend:
    """Start the asyncio front end; returns the running frontend object."""
    fe = AsyncCaptionFrontend(service)
    fe.start(host, port)
    return fe
