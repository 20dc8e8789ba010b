"""Embedding/retrieval serving daemon.

The reference has no serving story — every consumer re-loads the HF ViT
and pays its startup cost per script (the embedder is re-created in 8
files, e.g. reference: nba_proj/train/training.py:37-60,
nba_proj/db_maintainence/build_embeddings_store.py:32-35). This daemon
keeps ONE warm jitted engine (no recompiles after the first batch: the
engine pads every request to its static batch size) plus an optional
open vector-store collection, and serves both over a Unix domain
socket.

Protocol: newline-delimited JSON, one request object per line, one
response object per line.

    {"op": "ping"}
    {"op": "embed", "paths": [...]}            -> {"ok": true, "embeddings": [[...], ...]}
    {"op": "embed", "frames_b64": [...]}       (base64 JPEG/PNG bytes)
    {"op": "query", "paths"|"frames_b64"|"embeddings": ..., "n_results": 5,
     "where": {...}}                           -> per-query ids/distances/metadatas
    {"op": "shutdown"}

Concurrency: requests are parsed on per-connection threads; device work
is serialized by a lock (one chip, one engine — batching inside
``embed_batch`` already pipelines sub-batches). Malformed requests get
``{"ok": false, "error": ...}`` instead of killing the connection.
"""

from __future__ import annotations

import base64
import io
import json
import os
import socket
import socketserver
import threading

import numpy as np


def _decode_b64_frames(frames_b64, spec) -> np.ndarray:
    from PIL import Image

    from vit_research_tpu.data.preprocess import load_frames

    imgs = []
    for b64 in frames_b64:
        with Image.open(io.BytesIO(base64.b64decode(b64))) as im:
            imgs.append(np.asarray(im.convert("RGB")))
    # load_frames accepts in-memory arrays (preprocess_frame is
    # path-or-image), so the serve path shares the parity preprocessing.
    return load_frames(imgs, spec)


class EmbedServer:
    """Warm-engine embedding (+ optional retrieval) server."""

    def __init__(self, engine, *, collection=None):
        self.engine = engine
        self.collection = collection
        self._lock = threading.Lock()  # serialize device work
        self._server = None

    # ---- request handling -------------------------------------------------

    def _embed_request(self, req) -> np.ndarray:
        # Decode on the caller's connection thread, OUTSIDE the lock —
        # only device work serializes, so client B's JPEG decode overlaps
        # client A's forward pass.
        if "paths" in req:
            missing = [p for p in req["paths"] if not os.path.exists(p)]
            if missing:
                raise ValueError(f"missing paths: {missing[:3]}")
            from vit_research_tpu.data.preprocess import load_frames

            batch = load_frames(req["paths"], self.engine.spec)
        elif "frames_b64" in req:
            batch = _decode_b64_frames(req["frames_b64"], self.engine.spec)
        else:
            raise ValueError("embed needs 'paths' or 'frames_b64'")
        with self._lock:
            return self.engine.embed_batch(batch)

    def handle(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"ok": True, "batch_size": self.engine.batch_size,
                    "out_dim": self.engine.out_dim,
                    "collection": getattr(self.collection, "name", None)}
        if op == "embed":
            emb = self._embed_request(req)
            return {"ok": True, "embeddings": emb.tolist()}
        if op == "query":
            if self.collection is None:
                raise ValueError("server started without a collection")
            if "embeddings" in req:
                q = np.asarray(req["embeddings"], np.float32)
            else:
                q = self._embed_request(req)
            # Under the device lock: the query's top-k matmul is device
            # work too, and the documented contract is that device work
            # from concurrent clients is serialized.
            with self._lock:
                res = self.collection.query(
                    q, n_results=int(req.get("n_results", 5)),
                    where=req.get("where"),
                    include=("metadatas", "distances"))
            return {"ok": True, "ids": res["ids"],
                    "distances": res["distances"],
                    "metadatas": res["metadatas"]}
        if op == "shutdown":
            # The connection handler stops the server AFTER flushing this
            # response, so the client always sees the acknowledgement.
            return {"ok": True, "stopping": True}
        raise ValueError(f"unknown op {op!r}")

    # ---- socket plumbing ---------------------------------------------------

    def serve(self, socket_path: str, *, ready_event=None) -> None:
        """Blocking serve loop (call :meth:`stop` or send ``shutdown``)."""
        handler_self = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for line in self.rfile:
                    if not line.strip():
                        continue
                    try:
                        req = json.loads(line)
                        resp = handler_self.handle(req)
                    except Exception as e:  # keep the connection alive
                        resp = {"ok": False, "error": str(e)}
                    self.wfile.write(
                        (json.dumps(resp) + "\n").encode())
                    self.wfile.flush()
                    if resp.get("stopping"):
                        # Response is on the wire; now stop. shutdown()
                        # is safe here: handlers run on their own
                        # threads, not the serve_forever thread.
                        handler_self.stop()
                        return

        class Server(socketserver.ThreadingUnixStreamServer):
            daemon_threads = True
            allow_reuse_address = True

        if os.path.exists(socket_path):
            # Only reclaim the path from a DEAD server: if something
            # still answers on it, binding here would silently orphan
            # that daemon (warm engine and all) with no error anywhere.
            probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            try:
                probe.settimeout(1.0)
                probe.connect(socket_path)
            except OSError:
                os.unlink(socket_path)  # stale socket from a dead server
            else:
                raise RuntimeError(
                    f"a live server already owns {socket_path}")
            finally:
                probe.close()
        self._server = Server(socket_path, Handler)
        if ready_event is not None:
            ready_event.set()
        try:
            self._server.serve_forever(poll_interval=0.1)
        finally:
            self._server.server_close()
            if os.path.exists(socket_path):
                os.unlink(socket_path)

    def stop(self):
        if self._server is not None:
            self._server.shutdown()


def request(socket_path: str, req: dict, timeout: float = 60.0) -> dict:
    """One-shot client: send a request object, return the response."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(socket_path)
        s.sendall((json.dumps(req) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(1 << 20)
            if not chunk:
                if not buf:
                    raise ConnectionError(
                        "server closed the connection without replying")
                break
            buf += chunk
    return json.loads(buf)
