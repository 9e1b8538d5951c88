"""HTTP front-end for the continuous-batching Engine (stdlib-only).

The reference has no serving layer at all (SURVEY §1); this provides the
llama.cpp-`server`-style deployment surface over serving.engine.Engine:

    POST /v1/generate   {"prompt": [ids], "max_new_tokens": 32,
                         "temperature": 0.7, "top_k": 40, "top_p": 0.9,
                         "repeat_penalty": 1.1, "eos_id": 2,
                         "prefix_id": 0}
        → {"id": N, "tokens": [...], "error": null}   (blocks until done)
        With a tokenizer (EngineServer(..., tokenizer=...)), "text" may
        replace "prompt" and responses carry decoded "text"; pass
        "stream": true for chunked NDJSON (one token per line).
    POST /v1/cancel     {"id": N} → {"cancelled": true|false}
    GET  /v1/stats      → Engine.stats() + uptime
    GET  /health        → {"ok": true}

Threading model: ALL jax work happens on ONE background tick thread (the
engine loop); HTTP handler threads only append to the submission queue and
wait on per-request events — a hard requirement on the axon TPU backend
(one jax client, single-threaded dispatch) and good hygiene everywhere.
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .engine import Request


class EngineServer:
    """Runs an Engine on a background tick thread and serves HTTP."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8080,
                 tokenizer=None):
        self.engine = engine
        self.tokenizer = tokenizer  # io.tokenizer SPM/BPE (encode/decode)
        self.host, self.port = host, port
        self._lock = threading.Lock()  # guards engine.pending/cancel
        self._events: dict[int, threading.Event] = {}
        self._results: dict[int, Request] = {}
        self._next_id = 0
        self._stop = threading.Event()
        self._t0 = time.time()
        self._tick_thread = threading.Thread(target=self._loop, daemon=True)
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        self.port = self._httpd.server_address[1]  # resolved when port=0

    # --- engine loop (the ONLY thread touching jax) ------------------------
    def _loop(self):
        while not self._stop.is_set():
            with self._lock:
                busy = self.engine.pending or any(
                    s is not None for s in self.engine.slots)
                if busy:
                    self.engine.step_once()
                done, self.engine.finished = self.engine.finished, []
            for req in done:
                self._results[req.id] = req
                ev = self._events.pop(req.id, None)
                if ev is not None:
                    ev.set()
            if not busy:
                self._stop.wait(0.005)

    def submit(self, body: dict, on_token=None) -> Request:
        """Enqueue a request from a handler thread; block until finished.
        on_token(req, tok) is fired from the tick thread per token."""
        with self._lock:
            rid = self._next_id
            self._next_id += 1
            req = Request(
                id=rid,
                prompt=list(body["prompt"]),
                max_new_tokens=int(body.get("max_new_tokens", 64)),
                temperature=float(body.get("temperature", 0.0)),
                top_k=int(body.get("top_k", 0)),
                top_p=float(body.get("top_p", 1.0)),
                repeat_penalty=float(body.get("repeat_penalty", 1.0)),
                repeat_last_n=int(body.get("repeat_last_n", 64)),
                eos_id=body.get("eos_id"),
                prefix_id=body.get("prefix_id"),
                on_token=on_token,
            )
            ev = threading.Event()
            self._events[rid] = ev
            self.engine.submit(req)
        ev.wait()
        return self._results.pop(rid)

    def cancel(self, rid: int) -> bool:
        with self._lock:
            return self.engine.cancel(rid)

    # --- http ---------------------------------------------------------------
    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    return self._json(200, {"ok": True})
                if self.path == "/v1/stats":
                    st = server.engine.stats()
                    st["uptime_s"] = round(time.time() - server._t0, 3)
                    return self._json(200, st)
                return self._json(404, {"error": "not found"})

            def _stream(self, body: dict):
                """Chunked NDJSON: one {"token": t} line per emitted token
                (pushed from the tick thread via on_token), then a final
                {"done": true, ...} line."""
                import queue

                q: "queue.Queue" = queue.Queue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(obj):
                    data = json.dumps(obj).encode() + b"\n"
                    self.wfile.write(
                        f"{len(data):x}\r\n".encode() + data + b"\r\n")
                    self.wfile.flush()

                done_box = []

                def waiter():
                    done_box.append(server.submit(
                        body, on_token=lambda r, t: q.put(t)))
                    q.put(None)  # sentinel: finished

                t = threading.Thread(target=waiter, daemon=True)
                t.start()
                while True:
                    tok = q.get()
                    if tok is None:
                        break
                    chunk({"token": tok})
                t.join()
                req = done_box[0]
                fin = {"done": True, "id": req.id, "tokens": req.out_tokens,
                       "error": req.error}
                if server.tokenizer is not None:
                    fin["text"] = server.tokenizer.decode(req.out_tokens)
                chunk(fin)
                self.wfile.write(b"0\r\n\r\n")
                self.wfile.flush()

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "bad json"})
                if self.path == "/v1/generate":
                    if isinstance(body.get("text"), str):
                        if server.tokenizer is None:
                            return self._json(400, {
                                "error": "no tokenizer configured; send "
                                         "'prompt' as a token list"})
                        body["prompt"] = server.tokenizer.encode(
                            body.pop("text"))
                        if body.get("eos_id") is None:
                            body["eos_id"] = getattr(
                                server.tokenizer, "eos_id", None)
                    if not isinstance(body.get("prompt"), list):
                        return self._json(
                            400, {"error": "prompt must be a token list"})
                    if body.get("stream"):
                        return self._stream(body)
                    req = server.submit(body)
                    out = {
                        "id": req.id,
                        "tokens": req.out_tokens,
                        "error": req.error,
                    }
                    if server.tokenizer is not None:
                        out["text"] = server.tokenizer.decode(req.out_tokens)
                    return self._json(200, out)
                if self.path == "/v1/cancel":
                    ok = server.cancel(int(body.get("id", -1)))
                    return self._json(200, {"cancelled": ok})
                return self._json(404, {"error": "not found"})

        return Handler

    def start(self):
        self._tick_thread.start()
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._http_thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._httpd.shutdown()
        self._tick_thread.join(timeout=5)
