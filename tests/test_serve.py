"""Serving daemon (serve.py): warm-engine embed + retrieval over a Unix
socket. The reference had no serving surface (each of its 8 embedder
call sites reloaded the model per script)."""

import base64
import io
import os
import threading

import numpy as np
import pytest

from vit_research_tpu.data.preprocess import PreprocessSpec
from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.parallel.embed import EmbeddingEngine
from vit_research_tpu.serve import EmbedServer, request
from vit_research_tpu.utils.configs import ViTConfig

TINY = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=64,
                 num_layers=1, num_heads=2, mlp_dim=128,
                 use_flash_attention=False)
SPEC = PreprocessSpec(size=(32, 32), rescale=1 / 255.0,
                      mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))


@pytest.fixture(scope="module")
def engine():
    model, params = init_vit(TINY, seed=0)
    return EmbeddingEngine(model, params, SPEC, batch_size=4,
                           use_fused_patch_embed=False)


@pytest.fixture()
def server(engine, tmp_path):
    from vit_research_tpu.store.vector_store import PersistentClient

    coll = PersistentClient(str(tmp_path / "db")).get_or_create_collection(
        "served", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(0)
    base = rng.normal(size=(8, engine.out_dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    coll.upsert([f"id{i}" for i in range(8)], base,
                metadatas=[{"vid": i % 2} for i in range(8)])

    srv = EmbedServer(engine, collection=coll)
    sock = str(tmp_path / "vrt.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    yield sock, srv, coll, base
    srv.stop()
    t.join(timeout=10)


def _write_frames(tmp_path, n=3):
    from PIL import Image

    rng = np.random.default_rng(1)
    paths = []
    for i in range(n):
        img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_ping(server):
    sock, _, _, _ = server
    resp = request(sock, {"op": "ping"})
    assert resp["ok"] and resp["out_dim"] == 64
    assert resp["collection"] == "served"


def test_embed_paths_matches_engine(server, engine, tmp_path):
    sock, _, _, _ = server
    paths = _write_frames(tmp_path)
    resp = request(sock, {"op": "embed", "paths": paths})
    assert resp["ok"]
    served = np.asarray(resp["embeddings"], np.float32)
    direct = engine.embed_paths(paths)
    np.testing.assert_allclose(served, direct, atol=1e-6)


def test_embed_b64(server, engine, tmp_path):
    sock, _, _, _ = server
    paths = _write_frames(tmp_path, n=2)
    frames = [base64.b64encode(open(p, "rb").read()).decode()
              for p in paths]
    resp = request(sock, {"op": "embed", "frames_b64": frames})
    assert resp["ok"]
    served = np.asarray(resp["embeddings"], np.float32)
    direct = engine.embed_paths(paths)
    np.testing.assert_allclose(served, direct, atol=1e-6)


def test_query_by_embedding(server):
    sock, _, coll, base = server
    resp = request(sock, {"op": "query",
                          "embeddings": [base[3].tolist()],
                          "n_results": 2})
    assert resp["ok"]
    assert resp["ids"][0][0] == "id3"  # exact self-match first
    resp = request(sock, {"op": "query",
                          "embeddings": [base[3].tolist()],
                          "n_results": 2, "where": {"vid": 0}})
    assert all(int(i[2:]) % 2 == 0 for i in resp["ids"][0])


def test_query_with_sharded_collection(engine, tmp_path):
    """The daemon answers identically when the collection's device
    corpus is sharded over the (virtual) mesh — cli serve --shard-device."""
    from vit_research_tpu.parallel.mesh import make_mesh
    from vit_research_tpu.store.vector_store import PersistentClient

    coll = PersistentClient(str(tmp_path / "db")).get_or_create_collection(
        "served", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(3)
    base = rng.normal(size=(21, engine.out_dim)).astype(np.float32)
    coll.upsert([f"id{i}" for i in range(21)], base)
    q = base[5] + 0.01 * rng.normal(size=engine.out_dim)
    expected = coll.query(q[None], n_results=3)["ids"]
    coll.shard_device(make_mesh())

    srv = EmbedServer(engine, collection=coll)
    sock = str(tmp_path / "shard.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        res = request(sock, {"op": "query", "embeddings": [q.tolist()],
                             "n_results": 3})
        assert res["ids"] == expected
        assert res["ids"][0][0] == "id5"
    finally:
        srv.stop()
        t.join(timeout=10)


def test_bad_requests_keep_connection(server):
    sock, _, _, _ = server
    assert not request(sock, {"op": "nope"})["ok"]
    assert not request(sock, {"op": "embed"})["ok"]
    assert not request(sock, {"op": "embed",
                              "paths": ["/does/not/exist.jpg"]})["ok"]
    assert request(sock, {"op": "ping"})["ok"]  # server still alive


def test_concurrent_clients(server, tmp_path):
    sock, _, _, base = server
    errs = []

    def client(i):
        try:
            r = request(sock, {"op": "query",
                               "embeddings": [base[i % 8].tolist()],
                               "n_results": 1})
            assert r["ok"] and r["ids"][0][0] == f"id{i % 8}"
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errs


class _CountingEngine:
    """Wraps an engine, counting embed_batch invocations."""

    def __init__(self, engine):
        self._engine = engine
        self.calls = 0

    def __getattr__(self, name):
        return getattr(self._engine, name)

    def embed_batch(self, batch):
        self.calls += 1
        return self._engine.embed_batch(batch)


def test_coalescer_merges_concurrent_requests(engine, tmp_path):
    """Concurrent small embed requests within the linger window run as
    ONE device batch (cross-request micro-batching), with per-request
    rows identical to direct embedding."""
    counting = _CountingEngine(engine)
    srv = EmbedServer(counting, coalesce_ms=200.0)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    direct = engine.embed_batch(frames)
    counting.calls = 0

    results, errs = {}, []

    def client(i):
        try:
            results[i] = srv._coalescer.embed(frames[i:i + 1])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errs
    assert counting.calls == 1  # 4 requests -> one padded device batch
    for i in range(4):
        np.testing.assert_allclose(results[i][0], direct[i], atol=1e-6)


def test_coalescer_full_batch_skips_linger(engine):
    """A request already holding >= batch_size frames must dispatch
    immediately — the linger is only for filling partial batches."""
    import time as _time

    counting = _CountingEngine(engine)
    srv = EmbedServer(counting, coalesce_ms=5000.0)
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    t0 = _time.monotonic()
    out = srv._coalescer.embed(frames)  # == engine batch_size (4)
    assert _time.monotonic() - t0 < 4.0  # did not sleep the 5 s linger
    assert out.shape == (4, engine.out_dim)


def test_coalescer_propagates_errors(engine):
    srv = EmbedServer(engine, coalesce_ms=1.0)
    with pytest.raises(Exception):
        # Wrong rank: engine.embed_batch raises inside the worker; the
        # error must surface on the caller, not kill the worker thread.
        srv._coalescer.embed(np.zeros((2, 7), np.uint8))
    # Worker survives and still serves good requests.
    out = srv._coalescer.embed(
        np.zeros((1, 32, 32, 3), np.uint8))
    assert out.shape == (1, engine.out_dim)


def test_coalescer_survives_mismatched_concurrent_shapes(engine):
    """A failed np.concatenate of two coalesced requests must fail THOSE
    requests and leave the worker alive — not strand later requests in
    done.wait() forever."""
    srv = EmbedServer(engine, coalesce_ms=200.0)
    results = {}

    def client(i, shape):
        try:
            results[i] = srv._coalescer.embed(np.zeros(shape, np.uint8))
        except Exception as e:
            results[i] = e

    threads = [
        threading.Thread(target=client, args=(0, (1, 32, 32, 3))),
        threading.Thread(target=client, args=(1, (1, 16, 16, 3))),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == 2  # neither client hung
    assert any(isinstance(r, Exception) for r in results.values())
    # Worker alive: a fresh good request completes.
    out = srv._coalescer.embed(np.zeros((1, 32, 32, 3), np.uint8))
    assert out.shape == (1, engine.out_dim)


def test_coalescer_large_request_bypasses_merge(engine):
    """Requests already >= the engine batch size dispatch directly (no
    concatenate copy, no linger) and don't enter the pending queue."""
    counting = _CountingEngine(engine)
    srv = EmbedServer(counting, coalesce_ms=5000.0)
    frames = np.zeros((engine.batch_size + 1, 32, 32, 3), np.uint8)
    out = srv._coalescer.embed(frames)
    assert out.shape == (engine.batch_size + 1, engine.out_dim)
    assert counting.calls == 1
    assert not srv._coalescer._pending


def test_stop_reaps_coalescer_worker(engine):
    srv = EmbedServer(engine, coalesce_ms=1.0)
    worker = srv._coalescer._thread
    assert worker.is_alive()
    srv.stop()  # no serve() running: must still close the coalescer
    assert not worker.is_alive()
    with pytest.raises(RuntimeError, match="shutting down"):
        srv._coalescer.embed(np.zeros((1, 32, 32, 3), np.uint8))


def test_coalesce_disabled_path(engine, tmp_path):
    srv = EmbedServer(engine, coalesce_ms=0)
    assert srv._coalescer is None
    sock = str(tmp_path / "nc.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        paths = _write_frames(tmp_path, n=2)
        resp = request(sock, {"op": "embed", "paths": paths})
        assert resp["ok"] and len(resp["embeddings"]) == 2
    finally:
        srv.stop()
        t.join(timeout=10)


def test_shutdown_op(engine, tmp_path):
    srv = EmbedServer(engine)
    sock = str(tmp_path / "s.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    assert request(sock, {"op": "shutdown"})["ok"]
    t.join(timeout=10)
    assert not t.is_alive()
    assert not os.path.exists(sock)  # socket file cleaned up


def test_second_server_refuses_live_socket(server, engine):
    sock, _, _, _ = server
    with pytest.raises(RuntimeError, match="live server"):
        EmbedServer(engine).serve(sock)


def test_get_collection_strict(tmp_path):
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(str(tmp_path / "db"))
    client.get_or_create_collection("real")
    assert client.get_collection("real").name == "real"
    with pytest.raises(ValueError, match="does not exist"):
        client.get_collection("typo")


# ---- live segmentation sessions ------------------------------------------


@pytest.fixture()
def seg_world(engine, tmp_path):
    """Three distinct frames on disk + a labeled corpus collection built
    from the ENGINE'S OWN embeddings of those frames (so streamed copies
    of a frame kNN-match their class exactly)."""
    from PIL import Image

    from vit_research_tpu.store.vector_store import PersistentClient

    sides = ("left", "right", "none")
    paths = {}
    for i, side in enumerate(sides):
        img = np.full((32, 32, 3), 40 + 80 * i, np.uint8)
        img[: 8 * (i + 1), :8] = 255  # make the three frames distinct
        p = str(tmp_path / f"{side}.png")
        Image.fromarray(img).save(p)
        paths[side] = p
    embs = engine.embed_batch(
        np.stack([np.asarray(Image.open(paths[s])) for s in sides]))
    coll = PersistentClient(str(tmp_path / "segdb")).get_or_create_collection(
        "corpus", metadata={"hnsw:space": "l2"})
    ids, rows, metas = [], [], []
    for i, side in enumerate(sides):
        probs = {f"{s}_prob": (0.9 if s == side else 0.05) for s in sides}
        for c in range(5):  # 5 copies so k=5 votes stay in-class
            ids.append(f"{side}{c}")
            rows.append(embs[i])
            metas.append({"label": side, **probs})
    coll.upsert(ids, np.asarray(rows), metadatas=metas)
    return paths, coll


@pytest.fixture()
def seg_server(engine, seg_world, tmp_path):
    paths, coll = seg_world
    srv = EmbedServer(engine, collection=coll)
    sock = str(tmp_path / "seg.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    yield sock, paths
    srv.stop()
    t.join(timeout=10)


def test_segment_session_streams_clips_mid_game(seg_server):
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    with SessionClient(sock) as c:
        resp = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                          "pad": 2, "max_lag": 64})
        assert resp["ok"] and resp["corpus_size"] == 15
        stream = ["left"] * 30 + ["none"] * 20
        clips, seen_mid_stream = [], False
        for i in range(0, len(stream), 10):
            resp = c.request({"op": "segment_push",
                              "paths": [paths[s]
                                        for s in stream[i: i + 10]]})
            assert resp["ok"]
            clips.extend(resp["clips"])
            if resp["clips"] and i + 10 < len(stream):
                seen_mid_stream = True
        fin = c.request({"op": "segment_finish"})
        assert fin["ok"] and fin["frames_seen"] == 50
        clips.extend(fin["clips"])
    # one left possession: frames 0..29, padded end 31 (pad=2)
    assert clips == [{"side": "left", "start": 0, "end": 31}]
    assert seen_mid_stream  # the clip surfaced before the stream ended
    assert fin["forced"] == 0  # decisive stream: every emission exact


def test_segment_session_protocol_errors(seg_server, engine, tmp_path):
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    with SessionClient(sock) as c:
        r = c.request({"op": "segment_push", "paths": [paths["left"]]})
        assert not r["ok"] and "segment_start" in r["error"]
        assert not c.request({"op": "segment_finish"})["ok"]
        assert c.request({"op": "segment_start", "k": 5})["ok"]
        r = c.request({"op": "segment_start", "k": 5})
        assert not r["ok"] and "already active" in r["error"]
        # errors keep the session usable
        assert c.request({"op": "segment_push",
                          "paths": [paths["left"]]})["ok"]
        assert c.request({"op": "segment_finish"})["ok"]
    # sessions are per connection: a new connection starts clean
    with SessionClient(sock) as c2:
        r = c2.request({"op": "segment_finish"})
        assert not r["ok"]

    # a server without a collection refuses sessions
    srv = EmbedServer(engine, collection=None)
    sock2 = str(tmp_path / "nocoll.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock2,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        r = request(sock2, {"op": "segment_start"})
        assert not r["ok"] and "collection" in r["error"]
    finally:
        srv.stop()
        t.join(timeout=10)


def test_segment_session_write_back_opt_in(seg_server, seg_world):
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    _, coll = seg_world
    before = coll.count()
    with SessionClient(sock) as c:
        assert c.request({"op": "segment_start", "k": 5})["ok"]
        assert c.request({"op": "segment_push",
                          "paths": [paths["left"]] * 4})["ok"]
        c.request({"op": "segment_finish"})
    assert coll.count() == before  # default: snapshot only, no growth

    with SessionClient(sock) as c:
        assert c.request({"op": "segment_start", "k": 5,
                          "write_back": True, "vid": 7})["ok"]
        assert c.request({"op": "segment_push",
                          "paths": [paths["left"]] * 4})["ok"]
        c.request({"op": "segment_finish"})
    assert coll.count() == before + 1  # one distinct new frame id
    got = coll.get(ids=["left.png"])
    assert got["metadatas"][0]["label"] == "left"
    assert got["metadatas"][0]["video"] == 7


def test_segment_session_uses_collection_metric(engine, tmp_path):
    """A cosine-space corpus must be ranked like the query op (normalize
    + dot), not silently with l2."""
    from PIL import Image

    from vit_research_tpu.serve import SessionClient
    from vit_research_tpu.store.vector_store import PersistentClient

    sides = ("left", "right", "none")
    paths = {}
    embs = []
    for i, side in enumerate(sides):
        img = np.full((32, 32, 3), 30 + 90 * i, np.uint8)
        img[:6 * (i + 1), :6] = 250
        p = str(tmp_path / f"{side}.png")
        Image.fromarray(img).save(p)
        paths[side] = p
    embs = engine.embed_batch(
        np.stack([np.asarray(Image.open(paths[s])) for s in sides]))
    coll = PersistentClient(str(tmp_path / "cdb")).get_or_create_collection(
        "ccorpus", metadata={"hnsw:space": "cosine"})
    ids, rows, metas = [], [], []
    for i, side in enumerate(sides):
        probs = {f"{s}_prob": (0.9 if s == side else 0.05) for s in sides}
        for k in range(5):
            ids.append(f"{side}{k}")
            # scale rows wildly: only cosine ranking survives this
            rows.append(embs[i] * (1.0 + 10.0 * k))
            metas.append({"label": side, **probs})
    coll.upsert(ids, np.asarray(rows), metadatas=metas)

    srv = EmbedServer(engine, collection=coll)
    sock = str(tmp_path / "cos.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    try:
        with SessionClient(sock) as c:
            r = c.request({"op": "segment_start", "k": 5, "min_len": 10,
                           "pad": 1})
            assert r["ok"] and r["metric"] == "cosine"
            stream = ["right"] * 15 + ["none"] * 10
            clips = []
            for i in range(0, len(stream), 5):
                resp = c.request({"op": "segment_push",
                                  "paths": [paths[s]
                                            for s in stream[i: i + 5]]})
                assert resp["ok"], resp
                clips.extend(resp["clips"])
            clips.extend(c.request({"op": "segment_finish"})["clips"])
        assert clips == [{"side": "right", "start": 0, "end": 15}]
    finally:
        srv.stop()
        t.join(timeout=10)


def test_corpus_snapshot_cached_until_mutation(engine, seg_world):
    _, coll = seg_world
    srv = EmbedServer(engine, collection=coll)
    first = srv._corpus_snapshot(coll)
    assert srv._corpus_snapshot(coll) is first  # cached across sessions
    coll.upsert(["extra"], first["embeddings"][:1],
                metadatas=[{"label": "left", "left_prob": 0.9,
                            "right_prob": 0.05, "none_prob": 0.05}])
    second = srv._corpus_snapshot(coll)
    assert second is not first and len(second["labels"]) == 16


def test_session_client_poisons_after_connection_failure(seg_server):
    from vit_research_tpu.serve import SessionClient

    sock, _ = seg_server
    c = SessionClient(sock)
    assert c.request({"op": "ping"})["ok"]
    c._sock.close()  # simulate a mid-flight failure (e.g. timeout path)
    with pytest.raises(OSError):
        c.request({"op": "ping"})
    with pytest.raises(ConnectionError, match="poisoned"):
        c.request({"op": "ping"})


def test_segment_write_back_requires_vid(seg_server):
    from vit_research_tpu.serve import SessionClient

    sock, _ = seg_server
    with SessionClient(sock) as c:
        r = c.request({"op": "segment_start", "write_back": True})
        assert not r["ok"] and "vid" in r["error"]


def test_session_client_survives_unserializable_request(seg_server):
    """A json TypeError before any bytes hit the wire must NOT poison
    the client — the stream is still in sync."""
    from vit_research_tpu.serve import SessionClient

    sock, _ = seg_server
    with SessionClient(sock) as c:
        with pytest.raises(TypeError):
            c.request({"op": "ping", "bad": np.int64(3)})
        assert c.request({"op": "ping"})["ok"]  # still usable


def test_two_segment_sessions_interleaved_stay_isolated(seg_server):
    """Per-connection session state: two clients pushing interleaved,
    different-length streams must each get their own frame counts and
    clips, unaffected by the other's pushes."""
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    with SessionClient(sock) as a, SessionClient(sock) as b:
        assert a.request({"op": "segment_start", "k": 5, "min_len": 20,
                          "pad": 2, "max_lag": 64})["ok"]
        assert b.request({"op": "segment_start", "k": 5, "min_len": 20,
                          "pad": 2, "max_lag": 64})["ok"]
        # a streams a left possession; b streams a right one, shorter
        clips_a, clips_b = [], []
        for i in range(5):
            ra = a.request({"op": "segment_push",
                            "paths": [paths["left"]] * 10})
            rb = b.request({"op": "segment_push",
                            "paths": [paths["right"]] * 6})
            assert ra["ok"] and rb["ok"]
            assert ra["frames_seen"] == 10 * (i + 1)
            assert rb["frames_seen"] == 6 * (i + 1)
            clips_a.extend(ra["clips"])
            clips_b.extend(rb["clips"])
        fa = a.request({"op": "segment_finish"})
        fb = b.request({"op": "segment_finish"})
    assert fa["frames_seen"] == 50 and fb["frames_seen"] == 30
    clips_a.extend(fa["clips"])
    clips_b.extend(fb["clips"])
    # full-stream single runs for ground truth — BOTH sessions must
    # match their solo equivalents exactly, or a cross-session leak
    # that suppresses one side's clips would slip through
    def solo(path, n):
        with SessionClient(sock) as c:
            c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64})
            r = c.request({"op": "segment_push", "paths": [path] * n})
            f = c.request({"op": "segment_finish"})
        return r["clips"] + f["clips"]

    want_a = solo(paths["left"], 50)
    want_b = solo(paths["right"], 30)
    assert want_a == [{"side": "left", "start": 0, "end": 49}]
    assert want_b == [{"side": "right", "start": 0, "end": 29}]
    assert clips_a == want_a
    assert clips_b == want_b


def test_segment_session_accepts_transition_override(seg_server):
    """segment_start 'transitions': a calibrated 3x3 matrix (e.g. from
    cli tune-segment) changes the session's HMM; malformed shapes are
    rejected before any session state is created."""
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    with SessionClient(sock) as c:
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64,
                       "transitions": [[1.0, 0.0], [0.0, 1.0]]})
        assert not r["ok"] and "3x3" in r["error"]
        # raw transition COUNTS (rows not summing to 1) are rejected —
        # they would silently corrupt every decode in the session
        counts = [[90, 0, 10], [0, 90, 10], [20, 20, 60]]
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64, "transitions": counts})
        assert not r["ok"] and "sum to 1" in r["error"]
        # ... as are zero rows (log(0) everywhere) and NaNs
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64,
                       "transitions": [[0, 0, 0], [0, 0, 0], [0, 0, 0]]})
        assert not r["ok"] and "sum to 1" in r["error"]
        # the failed starts must not have left a half-open session
        trans = [[0.9, 0.0, 0.1], [0.0, 0.9, 0.1], [0.2, 0.2, 0.6]]
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64, "transitions": trans})
        assert r["ok"]
        clips = []
        for i in range(0, 50, 10):
            stream = (["left"] * 30 + ["none"] * 20)[i: i + 10]
            resp = c.request({"op": "segment_push",
                              "paths": [paths[s] for s in stream]})
            assert resp["ok"]
            clips.extend(resp["clips"])
        fin = c.request({"op": "segment_finish"})
        clips.extend(fin["clips"])
    # same decisive world as the mid-game test: the (valid) override
    # still decodes the single left possession exactly
    assert clips == [{"side": "left", "start": 0, "end": 31}]


# ---- live event scoring over the socket -----------------------------------


@pytest.fixture()
def score_world(engine, tmp_path):
    """Trained-run checkpoints (saved directly, no training — the
    restore path is what's under test) + a ratt_db-schema chunk
    collection, as cli train-stage1/train-stage2 + write-ratt-db would
    leave them. Geometry: chunk_size 6, k_sim 3 / k_contrast 3 /
    k_temporal 2."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.utils.configs import ChunkEncoderConfig, HeadConfig

    dim, cs, ks, kc, kt = engine.out_dim, 6, 3, 3, 2
    enc = ChunkEncoder(ChunkEncoderConfig(embed_dim=dim, mlp_dim=4 * dim,
                                          max_len=cs))
    p1 = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, cs, dim)))
    head = RATTHeadV2(HeadConfig(embed_dim=dim, k_sim=ks, k_contrast=kc,
                                 k_temporal=kt))
    p2 = head.init(jax.random.PRNGKey(2), jnp.zeros((1, dim)),
                   jnp.zeros((1, ks, dim)), jnp.zeros((1, kc, dim)),
                   jnp.zeros((1, kt, dim)))
    ckpt = str(tmp_path / "score_ckpts")
    for run, params in (("stage1_served", p1), ("stage2_served", p2)):
        m = CheckpointManager(ckpt, run)
        m.save(1, {"params": params}, metrics={"val_acc": 1.0})
        m.maybe_update_best(1, 1.0)
        m.wait()

    db = str(tmp_path / "score_db")
    client = PersistentClient(db)
    col = client.get_or_create_collection(
        "ratt_db", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(3)
    ids, embs, metas = [], [], []
    for vid in (7, 8):
        for clip in range(2):
            side = "left" if clip % 2 == 0 else "right"
            for s in range(4):
                ids.append(f"v{vid}c{clip}s{s}")
                e = rng.normal(size=dim).astype(np.float32)
                embs.append(e / np.linalg.norm(e))
                metas.append({"vid_num": vid, "clip_num": clip,
                              "side": side, "label": (vid + clip) % 2,
                              "t_center": (s + 0.5) / 4, "t_width": 0.1,
                              "start_idx": s * 3, "end_idx": s * 3 + 5})
    col.upsert(ids, np.stack(embs), metadatas=metas)
    client.flush()  # the scorer opens the db with a FRESH client
    cfg = {"ckpt": ckpt, "stage1_run_id": "stage1_served",
           "stage2_run_id": "stage2_served", "db": db,
           "collection": "ratt_db", "chunk_size": cs, "chunk_stride": 3,
           "k_sim": ks, "k_contrast": kc, "k_temporal": kt,
           "future_step": 1}
    return cfg


def test_segment_session_scores_events_mid_game(engine, seg_server,
                                                score_world):
    """segment_start with a score_events config: every finished clip
    comes back with an eval row, equal to the library LiveEventScorer
    run on the same frames — the CLI's segment --score-events surface
    over the socket."""
    import json

    from vit_research_tpu.evaluate import scoring
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    stream = ["left"] * 30 + ["none"] * 20
    stream_paths = [paths[s] for s in stream]
    clips, events = [], []
    with SessionClient(sock) as c:
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64, "vid": 7,
                       "score_events": score_world})
        assert r["ok"] and r["scoring"]
        for i in range(0, len(stream_paths), 10):
            resp = c.request({"op": "segment_push",
                              "paths": stream_paths[i: i + 10]})
            assert resp["ok"]
            clips.extend(resp["clips"])
            events.extend(resp.get("events", []))
            # events align with clips in EVERY response
            assert len(resp.get("events", [])) == len(resp["clips"])
        fin = c.request({"op": "segment_finish"})
        clips.extend(fin["clips"])
        events.extend(fin.get("events", []))
    assert clips == [{"side": "left", "start": 0, "end": 31}]
    assert len(events) == 1 and events[0] is not None

    # the daemon row equals the library scorer on the identical frames
    scorer = scoring.make_live_scorer(
        engine.embed_paths, dim=engine.out_dim,
        ckpt=score_world["ckpt"],
        stage1_run_id=score_world["stage1_run_id"],
        stage2_run_id=score_world["stage2_run_id"],
        db=score_world["db"], collection=score_world["collection"],
        chunk_size=score_world["chunk_size"],
        chunk_stride=score_world["chunk_stride"],
        k_sim=score_world["k_sim"], k_contrast=score_world["k_contrast"],
        k_temporal=score_world["k_temporal"],
        future_step=score_world["future_step"])
    lib_row = scorer.score_clip(stream_paths[0:32], side="left",
                                clip_num=1, vid=7)
    assert events[0] == json.loads(json.dumps(lib_row))
    # eval-clips schema: score-events consumes these rows unchanged
    assert events[0]["clip_key"] == "vid7_clip1"
    assert events[0]["label"] == -1
    assert events[0]["topk_chunks"][0]["rank"] == 1


def test_segment_session_score_config_rejected_cleanly(seg_server,
                                                       score_world):
    """A bad score_events config is an error reply that leaves NO
    session state — the connection immediately accepts a good start."""
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    with SessionClient(sock) as c:
        r = c.request({"op": "segment_start", "k": 5,
                       "score_events": {"ckpt": "x"}})
        assert not r["ok"] and "score_events config missing" in r["error"]
        bad_run = dict(score_world, stage2_run_id="no_such_run")
        r = c.request({"op": "segment_start", "k": 5,
                       "score_events": bad_run})
        assert not r["ok"] and "no run directory" in r["error"]
        bad_db = dict(score_world, db=score_world["db"] + "_typo")
        r = c.request({"op": "segment_start", "k": 5,
                       "score_events": bad_db})
        assert not r["ok"] and "no vector store" in r["error"]
        assert not os.path.exists(score_world["db"] + "_typo")
        # no half-open session left behind; scoring stays off when the
        # key is absent
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64})
        assert r["ok"] and r["scoring"] is False
        resp = c.request({"op": "segment_push", "paths": [paths["left"]]})
        assert resp["ok"] and "events" not in resp
        assert "events" not in c.request({"op": "segment_finish"})


def test_segment_session_b64_eviction_errors_per_row(seg_server,
                                                     score_world):
    """Frames pushed as b64 have no disk fallback: once evicted from the
    scorer's LRU they cannot be re-embedded, and the affected CLIP's
    event row carries an error — the clip itself (and the stream) must
    survive."""
    import base64

    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    b64 = {s: base64.b64encode(open(p, "rb").read()).decode()
           for s, p in paths.items()}
    stream = ["left"] * 30 + ["none"] * 20
    cfg = dict(score_world, emb_cache_cap=2)
    clips, events = [], []
    with SessionClient(sock) as c:
        r = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64,
                       "score_events": cfg})
        assert r["ok"]
        for i in range(0, len(stream), 10):
            resp = c.request({"op": "segment_push",
                              "frames_b64": [b64[s]
                                             for s in stream[i: i + 10]]})
            assert resp["ok"]
            clips.extend(resp["clips"])
            events.extend(resp.get("events", []))
        fin = c.request({"op": "segment_finish"})
        assert fin["ok"]
        clips.extend(fin["clips"])
        events.extend(fin.get("events", []))
    # the clip still arrived, with a per-row scoring error
    assert clips == [{"side": "left", "start": 0, "end": 31}]
    assert len(events) == 1
    assert "evicted" in events[0]["error"]


# ---- cli segment --follow --socket (daemon-routed live mode) ---------------


def _follow_world(tmp_path, paths, n_left=30, n_none=20):
    """A canonical-named frames dir (vid1_frame_N.jpg) + STOP marker,
    built from the seg_world frames."""
    import shutil

    fdir = tmp_path / "follow_frames"
    fdir.mkdir()
    stream = ["left"] * n_left + ["none"] * n_none
    for i, s in enumerate(stream, start=1):
        shutil.copy(paths[s], str(fdir / f"vid1_frame_{i}.jpg"))
    (fdir / "STOP").write_text("")
    return str(fdir)


def test_follow_via_daemon_writes_clips(seg_server, tmp_path, capsys):
    """segment --follow --socket: no local engine — the daemon embeds,
    segments against ITS collection, and the follow loop writes the
    same clip dirs the local mode would."""
    from vit_research_tpu import cli

    sock, paths = seg_server
    fdir = _follow_world(tmp_path, paths)
    out = str(tmp_path / "clips_daemon")
    cli.main(["segment", fdir, "--method", "knn-hmm", "--follow",
              "--socket", sock, "--k", "5", "--min-len", "20", "--pad", "2",
              "--max-lag", "64", "--out", out, "--vid", "1",
              "--idle-timeout", "20", "--poll-interval", "0.05",
              "--batch-size", "16"])
    msg = capsys.readouterr().out
    assert "followed 50 frames -> 1 clips" in msg
    dirs = sorted(d for d in os.listdir(out) if d.startswith("vid1_clip"))
    assert dirs == ["vid1_clip_1_left"]
    # padded extent 0..31 like the in-daemon session test: 32 frames
    assert len(os.listdir(os.path.join(out, dirs[0]))) == 32


def test_follow_via_daemon_scores_events(seg_server, score_world, tmp_path,
                                         capsys):
    """--socket + --score-events: scoring runs daemon-side; the follow
    loop writes the event rows it receives to events.jsonl, exactly like
    the local surface."""
    import json

    from vit_research_tpu import cli

    sock, paths = seg_server
    fdir = _follow_world(tmp_path, paths)
    out = str(tmp_path / "clips_daemon_scored")
    cli.main(["segment", fdir, "--method", "knn-hmm", "--follow",
              "--socket", sock, "--k", "5", "--min-len", "20", "--pad", "2",
              "--max-lag", "64", "--out", out, "--vid", "1",
              "--idle-timeout", "20", "--poll-interval", "0.05",
              "--batch-size", "16",
              "--score-events", "--score-ckpt", score_world["ckpt"],
              "--stage1-run-id", score_world["stage1_run_id"],
              "--stage2-run-id", score_world["stage2_run_id"],
              "--score-db", score_world["db"],
              "--score-collection", score_world["collection"],
              "--chunk-size", str(score_world["chunk_size"]),
              "--chunk-stride", str(score_world["chunk_stride"]),
              "--k-sim", str(score_world["k_sim"]),
              "--k-contrast", str(score_world["k_contrast"]),
              "--k-temporal", str(score_world["k_temporal"]),
              "--future-step", str(score_world["future_step"])])
    msg = capsys.readouterr().out
    assert "scored 1 clips live" in msg
    with open(os.path.join(out, "events.jsonl")) as fh:
        rows = [json.loads(l) for l in fh if l.strip()]
    assert len(rows) == 1
    assert rows[0]["clip_key"] == "vid1_clip1"
    assert rows[0]["label"] == -1 and rows[0]["topk_chunks"]


def test_follow_via_daemon_flag_validation(seg_server, tmp_path):
    """--socket without --follow, with a local corpus, or with a bad
    scoring config must fail cleanly before touching anything."""
    from vit_research_tpu import cli

    sock, paths = seg_server
    fdir = _follow_world(tmp_path, paths)
    out = str(tmp_path / "x")
    with pytest.raises(SystemExit, match="requires --follow"):
        cli.main(["segment", fdir, "--method", "knn-hmm",
                  "--socket", sock, "--out", out, "--vid", "1"])
    with pytest.raises(SystemExit, match="DAEMON's"):
        cli.main(["segment", fdir, "--method", "knn-hmm", "--follow",
                  "--socket", sock, "--db", str(tmp_path / "db"),
                  "--corpus-collection", "corpus",
                  "--out", out, "--vid", "1"])
    # a bad daemon-side scoring config comes back as a clean CLI error
    # (here: the score collection doesn't exist in that db root)
    with pytest.raises(SystemExit, match="refused the segment session"):
        cli.main(["segment", fdir, "--method", "knn-hmm", "--follow",
                  "--socket", sock, "--out", out, "--vid", "1",
                  "--score-events", "--score-ckpt", str(tmp_path),
                  "--stage1-run-id", "nope", "--stage2-run-id", "nope",
                  "--score-db", str(tmp_path), "--score-collection", "r"])


def test_failed_push_does_not_misalign_scoring_refs(engine, seg_world,
                                                    score_world):
    """A push that fails INSIDE push_batch (after embedding) consumed
    nothing — scoring refs must not advance, or every later clip would
    silently score the wrong frames (the CLI retry contract)."""
    from vit_research_tpu.evaluate import scoring

    paths, coll = seg_world
    srv = EmbedServer(engine, collection=coll, coalesce_ms=0)
    session = {}
    stream = ["left"] * 30 + ["none"] * 20
    sp = [paths[s] for s in stream]
    r = srv.handle({"op": "segment_start", "k": 5, "min_len": 20,
                    "pad": 2, "max_lag": 64, "vid": 1,
                    "score_events": score_world}, session)
    assert r["ok"] and r["scoring"]
    srv.handle({"op": "segment_push", "paths": sp[:10]}, session)
    seg, st = session["segment"], session["segment_score"]

    orig = seg.push_batch
    seg.push_batch = lambda names, embs: (_ for _ in ()).throw(
        RuntimeError("transient device error"))
    with pytest.raises(RuntimeError):
        srv.handle({"op": "segment_push", "paths": sp[10:20]}, session)
    assert len(st["refs"]) == seg.frames_seen == 10
    seg.push_batch = orig

    events = []
    for i in range(10, 50, 10):
        resp = srv.handle({"op": "segment_push", "paths": sp[i: i + 10]},
                          session)
        events.extend(resp.get("events", []))
    fin = srv.handle({"op": "segment_finish"}, session)
    events.extend(fin.get("events", []))
    assert fin["clips"] + [
    ] == [{"side": "left", "start": 0, "end": 31}] or events
    assert len([e for e in events if e]) == 1
    row = [e for e in events if e][0]
    # ... and the row was computed from the RIGHT frames: equal to the
    # library scorer on the clip's true extent
    scorer = scoring.make_live_scorer(
        engine.embed_paths, dim=engine.out_dim,
        ckpt=score_world["ckpt"],
        stage1_run_id=score_world["stage1_run_id"],
        stage2_run_id=score_world["stage2_run_id"],
        db=score_world["db"], collection=score_world["collection"],
        chunk_size=score_world["chunk_size"],
        chunk_stride=score_world["chunk_stride"],
        k_sim=score_world["k_sim"], k_contrast=score_world["k_contrast"],
        k_temporal=score_world["k_temporal"],
        future_step=score_world["future_step"])
    lib = scorer.score_clip(sp[0:32], side="left", clip_num=1, vid=1)
    assert row["raw_sequence"] == lib["raw_sequence"]


def test_score_config_empty_dict_and_null_fields(engine, seg_world,
                                                 score_world):
    """{} must hit the required-keys error (never silently disable
    scoring); explicit nulls in numeric fields fall back to defaults,
    and emb_cache_cap null means UNBOUNDED (the LiveEventScorer
    sentinel), not a crash."""
    paths, coll = seg_world
    srv = EmbedServer(engine, collection=coll, coalesce_ms=0)
    with pytest.raises(ValueError, match="missing"):
        srv.handle({"op": "segment_start", "score_events": {}}, {})
    session = {}
    cfg = dict(score_world, emb_cache_cap=None, future_step=None)
    r = srv.handle({"op": "segment_start", "k": 5, "min_len": 20,
                    "pad": 2, "vid": 1, "score_events": cfg}, session)
    assert r["ok"] and r["scoring"]
    assert session["segment_score"]["scorer"].emb_cache_cap is None
    assert session["segment_score"]["scorer"].future_step == 2  # default


def test_daemon_backend_sends_absolute_score_paths(monkeypatch):
    """Relative --score-ckpt/--score-db would resolve against the
    DAEMON's cwd; the backend must absolutize them like frame paths."""
    import argparse

    from vit_research_tpu import cli, serve

    reqs = []

    class _FakeClient:
        def __init__(self, *a, **kw):
            pass

        def request(self, req):
            reqs.append(req)
            return {"ok": True, "scoring": True}

    monkeypatch.setattr(serve, "SessionClient", _FakeClient)
    args = argparse.Namespace(
        socket="/tmp/x.sock", k=5, confidence_threshold=0.7, min_len=20,
        pad=2, max_lag=64, write_back=False, vid=1, score_events=True,
        score_ckpt="ckpts", stage1_run_id="r1", stage2_run_id="r2",
        score_db="db", db=None, score_collection="ratt_db", chunk_size=6,
        chunk_stride=3, k_sim=3, k_contrast=3, k_temporal=2, future_step=1)
    cli._DaemonFollowBackend(args)
    sc = reqs[0]["score_events"]
    assert os.path.isabs(sc["ckpt"]) and os.path.isabs(sc["db"])
    assert sc["collection"] == "ratt_db"


def test_two_scored_sessions_interleaved_stay_isolated(seg_server,
                                                       score_world):
    """Scored sessions carry extra per-connection state (refs list,
    embedding LRU, clip counter): two clients pushing interleaved
    DIFFERENT streams must each get event rows computed from their own
    frames — a refs leak would silently score the other game's footage."""
    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    streams = {"a": ["left"] * 30 + ["none"] * 20,
               "b": ["right"] * 30 + ["none"] * 20}
    events = {"a": [], "b": []}
    with SessionClient(sock) as a, SessionClient(sock) as b:
        for c, vid in ((a, 1), (b, 2)):
            assert c.request({"op": "segment_start", "k": 5, "min_len": 20,
                              "pad": 2, "max_lag": 64, "vid": vid,
                              "score_events": score_world})["ok"]
        for i in range(0, 50, 10):
            for key, c in (("a", a), ("b", b)):
                r = c.request({"op": "segment_push",
                               "paths": [paths[s]
                                         for s in streams[key][i: i + 10]]})
                assert r["ok"]
                events[key].extend(r.get("events", []))
        for key, c in (("a", a), ("b", b)):
            events[key].extend(c.request({"op": "segment_finish"})["events"])

    def solo(key, vid):
        out = []
        with SessionClient(sock) as c:
            assert c.request({"op": "segment_start", "k": 5, "min_len": 20,
                              "pad": 2, "max_lag": 64, "vid": vid,
                              "score_events": score_world})["ok"]
            r = c.request({"op": "segment_push",
                           "paths": [paths[s] for s in streams[key]]})
            out.extend(r.get("events", []))
            out.extend(c.request({"op": "segment_finish"})["events"])
        return out

    assert events["a"] == solo("a", 1)
    assert events["b"] == solo("b", 2)
    # the two games really produced different rows (different sides,
    # vids and logits), so the equality above is not vacuous
    ra = [e for e in events["a"] if e]
    rb = [e for e in events["b"] if e]
    assert ra and rb
    assert ra[0]["side"] == "left" and rb[0]["side"] == "right"
    assert ra[0]["clip_key"] != rb[0]["clip_key"]


def test_stats_op(seg_server):
    """{"op": "stats"}: request counts, embed/segment counters, and the
    active/abandoned session gauges — including a session dying with
    its connection."""
    import time as time_mod

    from vit_research_tpu.serve import SessionClient

    sock, paths = seg_server
    with SessionClient(sock) as c:
        assert c.request({"op": "ping"})["ok"]
        assert c.request({"op": "segment_start", "k": 5, "min_len": 20,
                          "pad": 2})["ok"]
        assert c.request({"op": "segment_push",
                          "paths": [paths["left"]] * 4})["ok"]
        assert not c.request({"op": "bogus"})["ok"]  # error counted
        st = c.request({"op": "stats"})
        assert st["ok"] and st["uptime_s"] >= 0
        assert st["requests"]["ping"] == 1
        assert st["requests"]["segment_push"] == 1
        assert st["frames_embedded"] == 4
        assert st["errors"] == 1
        assert st["segment"]["sessions_started"] == 1
        assert st["segment"]["sessions_active"] == 1
        assert st["segment"]["frames_pushed"] == 4
        assert st["collection"] == "corpus" and st["out_dim"] == 64
    # the connection dropped with its session still open -> abandoned
    # (the handler's finally runs as the socket tears down; poll briefly)
    deadline = time_mod.time() + 5
    st = None
    while time_mod.time() < deadline:
        st = request(sock, {"op": "stats"})
        if st["segment"]["sessions_abandoned"] == 1:
            break
        time_mod.sleep(0.05)
    assert st["segment"]["sessions_abandoned"] == 1
    assert st["segment"]["sessions_active"] == 0
    assert st["segment"]["sessions_finished"] == 0


def test_daemon_follow_backend_reconnects_and_replays(engine, seg_world,
                                                      tmp_path, capsys):
    """A daemon restart mid-game must not kill a --socket follower:
    session state is connection-scoped, so the backend reconnects,
    replays its push history against the fresh session, and returns
    only the clips beyond those already delivered — the final clip set
    equals an uninterrupted run's."""
    import argparse

    from vit_research_tpu import cli

    paths, coll = seg_world
    sock = str(tmp_path / "flap.sock")

    def start_server():
        srv = EmbedServer(engine, collection=coll, coalesce_ms=0)
        ready = threading.Event()
        t = threading.Thread(target=srv.serve, args=(sock,),
                             kwargs={"ready_event": ready}, daemon=True)
        t.start()
        assert ready.wait(10)
        return srv, t

    args = argparse.Namespace(
        socket=sock, k=5, confidence_threshold=0.7, min_len=20, pad=2,
        max_lag=64, write_back=False, vid=1, score_events=False)
    stream = ["left"] * 30 + ["none"] * 20
    sp = [paths[s] for s in stream]

    srv1, t1 = start_server()
    backend = cli._DaemonFollowBackend(args)
    clips = []
    c, _ = backend.push(stream[:20], sp[:20])
    clips.extend(c)
    # the daemon dies (taking the session lattice with it) and comes
    # back. stop() alone is NOT a severed connection — the established
    # handler thread would keep serving the zombie session and the
    # replay path would never run; shutdown the client socket too (what
    # a killed daemon process does to it)
    srv1.stop()
    t1.join(timeout=10)
    backend.client._sock.shutdown(__import__("socket").SHUT_RDWR)
    srv2, t2 = start_server()
    try:
        for i in range(20, 50, 10):
            c, _ = backend.push(stream[i: i + 10], sp[i: i + 10])
            clips.extend(c)
        fin_clips, _, forced = backend.finish()
        clips.extend(fin_clips)
    finally:
        srv2.stop()
        t2.join(timeout=10)
    # the replay path really ran (guards against a vacuous severing —
    # srv.stop() alone leaves the old handler thread serving)
    assert "reconnecting and replaying" in capsys.readouterr().out
    # identical to the uninterrupted session (cf. the mid-game test)
    assert [(c.side, c.start, c.end) for c in clips] == [("left", 0, 31)]


def test_reconnect_skips_already_returned_clips(engine, seg_world,
                                                tmp_path, capsys):
    """Clips delivered BEFORE the connection dropped re-emerge in the
    deterministic replay — the backend must skip them by count, or the
    follow loop would write (and score) every early possession twice."""
    import argparse

    from vit_research_tpu import cli

    paths, coll = seg_world
    sock = str(tmp_path / "flap2.sock")

    def start_server():
        srv = EmbedServer(engine, collection=coll, coalesce_ms=0)
        ready = threading.Event()
        t = threading.Thread(target=srv.serve, args=(sock,),
                             kwargs={"ready_event": ready}, daemon=True)
        t.start()
        assert ready.wait(10)
        return srv, t

    args = argparse.Namespace(
        socket=sock, k=5, confidence_threshold=0.7, min_len=20, pad=2,
        max_lag=64, write_back=False, vid=1, score_events=False)
    first = ["left"] * 30 + ["none"] * 20
    second = ["right"] * 30 + ["none"] * 20

    srv1, t1 = start_server()
    backend = cli._DaemonFollowBackend(args)
    clips = []
    c, _ = backend.push(first, [paths[s] for s in first])
    clips.extend(c)
    assert [(x.side, x.start, x.end) for x in clips] == [("left", 0, 31)]
    srv1.stop()
    t1.join(timeout=10)
    backend.client._sock.shutdown(__import__("socket").SHUT_RDWR)
    srv2, t2 = start_server()
    try:
        c, _ = backend.push(second, [paths[s] for s in second])
        clips.extend(c)
        fin, _, _ = backend.finish()
        clips.extend(fin)
    finally:
        srv2.stop()
        t2.join(timeout=10)
    assert "reconnecting and replaying" in capsys.readouterr().out
    # left: start clamped at 0; right: possession starts at frame 50,
    # padded extent 48..81 (pad=2)
    assert [(x.side, x.start, x.end) for x in clips] == [
        ("left", 0, 31), ("right", 48, 81)]


def test_replay_failure_poisons_backend(engine, seg_world, tmp_path,
                                        capsys):
    """A replay that fails mid-history must POISON the backend: pushing
    onto a session holding only a prefix of the history would silently
    misalign every later clip's frame indices."""
    import argparse
    import shutil
    import socket as socket_mod

    from vit_research_tpu import cli

    paths, coll = seg_world
    sock = str(tmp_path / "flap3.sock")

    def start_server():
        srv = EmbedServer(engine, collection=coll, coalesce_ms=0)
        ready = threading.Event()
        t = threading.Thread(target=srv.serve, args=(sock,),
                             kwargs={"ready_event": ready}, daemon=True)
        t.start()
        assert ready.wait(10)
        return srv, t

    # history frames live in a dir we can delete from
    fdir = tmp_path / "hist"
    fdir.mkdir()
    hist_paths = []
    for i in range(10):
        p = str(fdir / f"h{i}.png")
        shutil.copy(paths["left"], p)
        hist_paths.append(p)

    args = argparse.Namespace(
        socket=sock, k=5, confidence_threshold=0.7, min_len=20, pad=2,
        max_lag=64, write_back=False, vid=1, score_events=False)
    srv1, t1 = start_server()
    backend = cli._DaemonFollowBackend(args)
    backend.push([os.path.basename(p) for p in hist_paths], hist_paths)
    srv1.stop()
    t1.join(timeout=10)
    backend.client._sock.shutdown(socket_mod.SHUT_RDWR)
    os.unlink(hist_paths[3])  # the dump dir rotated a history frame away
    srv2, t2 = start_server()
    try:
        with pytest.raises(RuntimeError, match="replay failed"):
            backend.push(["x"], [paths["none"]])
        # poisoned: every further push refuses immediately
        with pytest.raises(RuntimeError, match="unrecoverable"):
            backend.push(["x"], [paths["none"]])
        with pytest.raises(RuntimeError, match="unrecoverable"):
            backend.finish()
    finally:
        srv2.stop()
        t2.join(timeout=10)


def test_write_back_session_refuses_replay(engine, seg_world, tmp_path):
    """--write-back grew the corpus mid-game, so a replayed decode is
    not deterministic — a dropped connection must fail loudly instead
    of writing shifted/duplicate possessions."""
    import argparse
    import socket as socket_mod

    from vit_research_tpu import cli

    paths, coll = seg_world
    sock = str(tmp_path / "flap4.sock")
    srv = EmbedServer(engine, collection=coll, coalesce_ms=0)
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    args = argparse.Namespace(
        socket=sock, k=5, confidence_threshold=0.7, min_len=20, pad=2,
        max_lag=64, write_back=True, vid=1, score_events=False)
    try:
        backend = cli._DaemonFollowBackend(args)
        backend.push(["a"], [paths["left"]])
        backend.client._sock.shutdown(socket_mod.SHUT_RDWR)
        with pytest.raises(RuntimeError, match="write-back"):
            backend.push(["b"], [paths["left"]])
    finally:
        srv.stop()
        t.join(timeout=10)


def test_serve_ctl_cli(server, engine, tmp_path, capsys):
    """cli serve-ctl: operator ping/stats/shutdown without hand-written
    socket code (and without importing jax or spinning an engine)."""
    import json

    from vit_research_tpu import cli

    sock, _, _, _ = server
    cli.main(["serve-ctl", "ping", "--socket", sock])
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and out["out_dim"] == 64
    cli.main(["serve-ctl", "stats", "--socket", sock])
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and "segment" in out and "uptime_s" in out
    with pytest.raises(SystemExit, match="no daemon socket"):
        cli.main(["serve-ctl", "ping", "--socket",
                  str(tmp_path / "nope.sock")])
    # shutdown: against its own throwaway daemon
    srv2 = EmbedServer(engine, coalesce_ms=0)
    sock2 = str(tmp_path / "ctl.sock")
    ready = threading.Event()
    t2 = threading.Thread(target=srv2.serve, args=(sock2,),
                          kwargs={"ready_event": ready}, daemon=True)
    t2.start()
    assert ready.wait(10)
    cli.main(["serve-ctl", "shutdown", "--socket", sock2])
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and out["stopping"]
    t2.join(timeout=10)
    assert not t2.is_alive()


def test_serve_ctl_tolerates_closed_stdout_pipe(server):
    """`cli serve-ctl stats | head -1` must exit cleanly, not dump a
    BrokenPipeError traceback (standard unix-filter behavior)."""
    import subprocess
    import sys

    sock, _, _, _ = server
    proc = subprocess.run(
        f"set -o pipefail; {sys.executable} -u -m vit_research_tpu.cli "
        f"serve-ctl stats --socket {sock} | head -c 5",
        shell=True, executable="/bin/bash", capture_output=True,
        text=True, timeout=120)
    # pipefail: we assert PYTHON's exit code, not head's; -u forces the
    # EPIPE to hit inside the handler's scope regardless of buffering
    assert proc.returncode == 0, proc.stderr
    assert "Traceback" not in proc.stderr and "BrokenPipe" not in proc.stderr


def test_daemon_mixed_concurrency_stress(engine, seg_world, score_world,
                                         tmp_path):
    """One daemon, eight concurrent clients with mixed workloads —
    scored + plain segment sessions, embed/query bursts, a stats
    poller, a bad-request client. Guards the lock ordering added by
    scoring/stats: everyone must finish (no deadlock), every session
    must match its solo result, and the gauges must reconcile."""
    import time as time_mod

    from vit_research_tpu.serve import SessionClient

    paths, coll = seg_world
    srv = EmbedServer(engine, collection=coll)
    sock = str(tmp_path / "stress.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)

    errs, results = [], {}

    def seg_client(key, side, vid, scored):
        try:
            stream = [side] * 30 + ["none"] * 20
            clips = []
            with SessionClient(sock, timeout=120) as c:
                req = {"op": "segment_start", "k": 5, "min_len": 20,
                       "pad": 2, "max_lag": 64, "vid": vid}
                if scored:
                    req["score_events"] = score_world
                assert c.request(req)["ok"]
                for i in range(0, 50, 10):
                    r = c.request({"op": "segment_push",
                                   "paths": [paths[s]
                                             for s in stream[i: i + 10]]})
                    assert r["ok"], r
                    clips.extend(r["clips"])
                fin = c.request({"op": "segment_finish"})
                assert fin["ok"]
                clips.extend(fin["clips"])
            results[key] = clips
        except Exception as e:  # pragma: no cover
            errs.append((key, e))

    def embed_client(key):
        try:
            with SessionClient(sock, timeout=120) as c:
                for _ in range(10):
                    r = c.request({"op": "embed",
                                   "paths": [paths["left"],
                                             paths["right"]]})
                    assert r["ok"] and len(r["embeddings"]) == 2
                    q = c.request({"op": "query", "paths": [paths["none"]],
                                   "n_results": 1})
                    assert q["ok"]
            results[key] = True
        except Exception as e:  # pragma: no cover
            errs.append((key, e))

    def stats_poller(key):
        try:
            with SessionClient(sock, timeout=120) as c:
                for _ in range(20):
                    assert c.request({"op": "stats"})["ok"]
                    time_mod.sleep(0.02)
            results[key] = True
        except Exception as e:  # pragma: no cover
            errs.append((key, e))

    def bad_client(key):
        try:
            with SessionClient(sock, timeout=120) as c:
                for _ in range(10):
                    assert not c.request({"op": "nope"})["ok"]
                    assert not c.request({"op": "segment_finish"})["ok"]
            results[key] = True
        except Exception as e:  # pragma: no cover
            errs.append((key, e))

    threads = [
        threading.Thread(target=seg_client, args=("s1", "left", 1, True)),
        threading.Thread(target=seg_client, args=("s2", "right", 2, True)),
        threading.Thread(target=seg_client, args=("s3", "left", 3, False)),
        threading.Thread(target=seg_client, args=("s4", "right", 4, False)),
        threading.Thread(target=embed_client, args=("e1",)),
        threading.Thread(target=embed_client, args=("e2",)),
        threading.Thread(target=stats_poller, args=("p1",)),
        threading.Thread(target=bad_client, args=("b1",)),
    ]

    def reload_client(key):
        # Concurrent weight rollouts mid-traffic: preload (always valid,
        # independent of session timing) then two bare reloads. The
        # checkpoint on disk is unchanged, so scored sessions must still
        # match their solo results below whether they bound the stack
        # before or after a swap — pinning AND the swap itself exercised
        # under full lock interleaving.
        try:
            with SessionClient(sock, timeout=120) as c:
                r = c.request({
                    "op": "reload_weights", "ckpt": score_world["ckpt"],
                    "stage1_run_id": score_world["stage1_run_id"],
                    "stage2_run_id": score_world["stage2_run_id"],
                    "chunk_size": score_world["chunk_size"],
                    "k_sim": score_world["k_sim"],
                    "k_contrast": score_world["k_contrast"],
                    "k_temporal": score_world["k_temporal"]})
                assert r["ok"], r
                for _ in range(2):
                    time_mod.sleep(0.05)
                    assert c.request({"op": "reload_weights"})["ok"]
            results[key] = True
        except Exception as e:  # pragma: no cover
            errs.append((key, e))

    threads.append(threading.Thread(target=reload_client, args=("w1",)))
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
        assert not th.is_alive(), "deadlocked client thread"
    assert not errs, errs

    for key, side in (("s1", "left"), ("s2", "right"),
                      ("s3", "left"), ("s4", "right")):
        assert results[key] == [{"side": side, "start": 0, "end": 31}], key
    try:
        st = request(sock, {"op": "stats"})
    finally:
        srv.stop()
        t.join(timeout=10)
    assert st["segment"]["sessions_started"] == 4
    assert st["segment"]["sessions_finished"] == 4
    assert st["segment"]["sessions_active"] == 0
    assert st["segment"]["frames_pushed"] == 200
    assert st["segment"]["clips_emitted"] == 4
    assert st["segment"]["events_scored"] == 2  # the two scored sessions


# ---- hot collection reload (the `reload` op) --------------------------------


def _reload_world(tmp_path, engine, name="served", n=4, seed=0):
    """A flushed on-disk collection + the server holding it (no socket —
    these tests drive EmbedServer.handle directly)."""
    from vit_research_tpu.store.vector_store import PersistentClient

    db = str(tmp_path / "reloaddb")
    client = PersistentClient(db, autoflush=False)
    coll = client.get_or_create_collection(
        name, metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, engine.out_dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    coll.upsert([f"{name}{i}" for i in range(n)], base)
    client.flush()
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(db, name))
    return db, srv, base


def test_reload_picks_up_external_writer(engine, tmp_path):
    """The production loop: `cli rebuild-db` (another process) rewrites
    the collection on disk; `reload` swaps the daemon onto the new
    generation without touching the warm engine."""
    from vit_research_tpu.store.vector_store import PersistentClient

    db, srv, base = _reload_world(tmp_path, engine)
    # an "external process": a separate client/collection object over
    # the same directory, like rebuild-db running beside the daemon
    writer = PersistentClient(db, autoflush=False).get_collection("served")
    new_row = -base[0]  # maximally far from served0
    writer.upsert(["fresh"], new_row[None])
    writer.flush()

    q = {"op": "query", "embeddings": [new_row.tolist()], "n_results": 1}
    assert srv.handle(dict(q))["ids"][0][0] != "fresh"  # stale until reload
    resp = srv.handle({"op": "reload"})
    assert resp["ok"] and resp["rows"] == 5 and resp["previous_rows"] == 4
    assert resp["db"] == db and resp["collection"] == "served"
    assert srv.handle(dict(q))["ids"][0][0] == "fresh"
    assert srv.handle({"op": "ping"})["collection"] == "served"


def test_reload_switches_collection_and_updates_default(engine, tmp_path):
    from vit_research_tpu.store.vector_store import PersistentClient

    db, srv, base = _reload_world(tmp_path, engine)
    other_client = PersistentClient(db, autoflush=False)
    other = other_client.get_or_create_collection(
        "other", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(7)
    rows = rng.normal(size=(3, engine.out_dim)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    other.upsert([f"other{i}" for i in range(3)], rows)
    other_client.flush()

    resp = srv.handle({"op": "reload", "collection": "other"})
    assert resp["ok"] and resp["rows"] == 3 and resp["previous_rows"] == 4
    got = srv.handle({"op": "query", "embeddings": [rows[1].tolist()],
                      "n_results": 1})
    assert got["ids"][0][0] == "other1"
    # the switch becomes the new default source: a bare reload refreshes
    # "other", not the original collection
    assert srv.handle({"op": "reload"})["collection"] == "other"


def test_reload_failure_keeps_current_collection(engine, tmp_path):
    db, srv, base = _reload_world(tmp_path, engine)
    with pytest.raises(ValueError, match="does not exist"):
        srv.handle({"op": "reload", "collection": "nope"})
    # old collection still serves, and stays the bare-reload default
    got = srv.handle({"op": "query", "embeddings": [base[2].tolist()],
                      "n_results": 1})
    assert got["ids"][0][0] == "served2"
    assert srv.handle({"op": "reload"})["collection"] == "served"


def test_reload_without_source_needs_explicit_target(engine, tmp_path):
    """A daemon started without --db refuses a bare reload but can be
    GIVEN a collection at runtime (retrieval added to a live daemon)."""
    from vit_research_tpu.store.vector_store import PersistentClient

    srv = EmbedServer(engine, coalesce_ms=0)
    with pytest.raises(ValueError, match="started without"):
        srv.handle({"op": "reload"})

    db = str(tmp_path / "latedb")
    client = PersistentClient(db, autoflush=False)
    coll = client.get_or_create_collection(
        "late", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(3)
    rows = rng.normal(size=(2, engine.out_dim)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    coll.upsert(["late0", "late1"], rows)
    client.flush()

    with pytest.raises(ValueError, match="without a collection"):
        srv.handle({"op": "query", "embeddings": [rows[0].tolist()]})
    resp = srv.handle({"op": "reload", "db": db, "collection": "late"})
    assert resp["ok"] and resp["rows"] == 2 and resp["previous_rows"] is None
    got = srv.handle({"op": "query", "embeddings": [rows[0].tolist()],
                      "n_results": 1})
    assert got["ids"][0][0] == "late0"


def test_reload_refused_while_write_back_session_active(engine, seg_world,
                                                        tmp_path):
    """Write-back sessions pin the collection (their upserts target the
    bound object; a swap would leave two generations appending to one
    directory). Finished sessions' write-backs must SURVIVE the reload
    (flush-before-swap)."""
    paths, coll = seg_world
    db = str(tmp_path / "segdb")
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(db, "corpus"))
    session: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5, "min_len": 3,
                       "pad": 0, "max_lag": 16, "write_back": True,
                       "vid": 9}, session)["ok"]
    with pytest.raises(ValueError, match="write-back"):
        srv.handle({"op": "reload"})
    # plain (non-write-back) sessions do NOT pin: they rank against
    # their own staged snapshot
    plain: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5}, plain)["ok"]

    # decisive left stream -> confident write-back rows on finish
    for _ in range(3):
        assert srv.handle({"op": "segment_push",
                           "paths": [paths["left"]] * 4}, session)["ok"]
    srv.handle({"op": "segment_finish"}, session)
    resp = srv.handle({"op": "reload"})  # plain session still open: fine
    assert resp["ok"]
    # the reopened generation contains the finished session's write-back
    # (left.png, one distinct id) — flushed at swap time, not lost
    assert resp["rows"] == 16 and resp["previous_rows"] == 16
    # the still-open plain session keeps working against its snapshot
    assert srv.handle({"op": "segment_push",
                       "paths": [paths["none"]] * 2}, plain)["ok"]
    assert srv.handle({"op": "segment_finish"}, plain)["ok"]


def test_abandoned_write_back_session_unpins_reload(engine, seg_world,
                                                    tmp_path):
    paths, coll = seg_world
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(str(tmp_path / "segdb"), "corpus"))
    session: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5, "write_back": True,
                       "vid": 1}, session)["ok"]
    with pytest.raises(ValueError, match="write-back"):
        srv.handle({"op": "reload"})
    srv._connection_closed(session)  # client vanished mid-game
    assert srv.handle({"op": "reload"})["ok"]
    # a failed write-back start never pins either (bad transitions)
    bad: dict = {}
    with pytest.raises(ValueError, match="transitions"):
        srv.handle({"op": "segment_start", "k": 5, "write_back": True,
                    "vid": 1, "transitions": [[1.0]]}, bad)
    assert srv.handle({"op": "reload"})["ok"]


def test_new_sessions_see_reloaded_corpus(engine, seg_world, tmp_path):
    """Active sessions keep their start-time snapshot; sessions started
    after the reload rank against the new corpus (cache invalidation
    across the swap, keyed on collection identity)."""
    from vit_research_tpu.store.vector_store import PersistentClient

    paths, coll = seg_world
    db = str(tmp_path / "segdb")
    coll.flush()  # seg_world built it in memory only
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(db, "corpus"))
    old_sess: dict = {}
    r = srv.handle({"op": "segment_start", "k": 5}, old_sess)
    assert r["corpus_size"] == 15

    from PIL import Image

    writer = PersistentClient(db, autoflush=False).get_collection("corpus")
    extra = engine.embed_batch(
        np.stack([np.asarray(Image.open(paths["left"]))] * 2))
    writer.upsert(["x0", "x1"], extra,
                  metadatas=[{"label": "left"}] * 2)
    writer.flush()

    assert srv.handle({"op": "reload"})["rows"] == 17
    new_sess: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5},
                      new_sess)["corpus_size"] == 17
    # the pre-reload session still answers from its 15-row snapshot
    assert srv.handle({"op": "segment_push",
                       "paths": [paths["left"]] * 2}, old_sess)["ok"]
    assert srv.handle({"op": "segment_finish"}, old_sess)["ok"]
    assert srv.handle({"op": "segment_finish"}, new_sess)["ok"]


def test_serve_ctl_reload_cli(server, tmp_path, capsys):
    """cli serve-ctl reload --db/--collection against a live daemon
    (the operator form of rebuild-db --notify-socket)."""
    import json

    from vit_research_tpu import cli

    sock, _, coll, base = server
    db = str(tmp_path / "db")
    cli.main(["serve-ctl", "reload", "--socket", sock,
              "--db", db, "--collection", "served"])
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and out["rows"] == 8 and out["collection"] == "served"
    with pytest.raises(SystemExit, match="only apply to reload"):
        cli.main(["serve-ctl", "ping", "--socket", sock, "--db", db])
    with pytest.raises(SystemExit, match="daemon error"):
        cli.main(["serve-ctl", "reload", "--socket", sock,
                  "--db", db, "--collection", "missing"])


def test_reload_carries_pending_write_backs_over_external_rebuild(
        engine, tmp_path):
    """THE rebuild-db --notify-socket combination: the daemon holds
    acked-but-unflushed write-backs while an external rebuild rewrites
    the directory past its generation. The old object must never flush
    (it would clobber the rebuild or be generation-fenced into silence);
    the pending rows are carried into the NEW generation and persisted
    through it."""
    from vit_research_tpu.store.vector_store import PersistentClient

    db, srv, base = _reload_world(tmp_path, engine)
    old = srv.collection
    # a finished write-back session's rows: acked, still unflushed
    old.upsert(["wb0"], (-base[1])[None], metadatas=[{"label": "left"}])

    # external rebuild-db: separate client, full rewrite (compaction
    # bumps the on-disk generation past the daemon's view)
    ext = PersistentClient(db, autoflush=False).get_collection("served")
    ext.upsert(["rebuilt"], (-base[0])[None])
    ext.compact()

    resp = srv.handle({"op": "reload"})
    assert resp["ok"] and resp["carried_pending"] == 1
    live_ids = set(srv.collection.get(include=())["ids"])
    assert {"rebuilt", "wb0"} <= live_ids and len(live_ids) == 6
    # durably: a FRESH load from disk sees both (the carry was flushed)
    fresh = PersistentClient(db, autoflush=False).get_collection("served")
    assert {"rebuilt", "wb0"} <= set(fresh.get(include=())["ids"])
    # the swapped-out generation is detached: any straggling flush
    # (e.g. a client atexit) is a no-op, and its device cache is gone
    assert old._path is None and old._device_cache is None
    old.upsert(["zombie"], base[2][None])
    old.flush()
    fresh2 = PersistentClient(db, autoflush=False).get_collection("served")
    assert "zombie" not in set(fresh2.get(include=())["ids"])


def test_failed_segment_start_leaves_no_zombie_state(engine, seg_world,
                                                     tmp_path, monkeypatch):
    """A failure AFTER the write-back pin (here: a non-numeric 'vid' with
    scoring enabled) must leave the connection state exactly as it was:
    no half-built session that double-unpins at close (pin count would go
    negative, refusing every future reload), no skewed gauges."""
    paths, coll = seg_world
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(str(tmp_path / "segdb"), "corpus"))
    monkeypatch.setattr(EmbedServer, "_make_scorer",
                        lambda self, cfg: (object(), 0))
    bad: dict = {}
    with pytest.raises(ValueError, match="must be an integer"):
        srv.handle({"op": "segment_start", "k": 5, "write_back": True,
                    "vid": "abc", "score_events": {"stub": 1}}, bad)
    assert bad == {}  # no zombie session keys behind the error reply
    srv._connection_closed(bad)  # must not double-unpin
    assert srv._write_back_sessions == 0
    st = srv.handle({"op": "stats"})["segment"]
    assert st["sessions_active"] == 0 and st["sessions_abandoned"] == 0
    assert srv.handle({"op": "reload"})["ok"]  # pin was not leaked
    # and the connection is fully usable afterwards
    good: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5, "write_back": True,
                       "vid": 7}, good)["ok"]
    assert srv.handle({"op": "segment_finish"}, good)["ok"]


def test_finished_write_back_session_persists_to_disk(engine, seg_world,
                                                      tmp_path):
    """Acked write-backs survive daemon DEATH, not just graceful exit:
    finishing (or abandoning) a write-back session flushes the collection
    — reload-opened generations have no atexit autoflush."""
    from vit_research_tpu.store.vector_store import PersistentClient

    paths, coll = seg_world
    db = str(tmp_path / "segdb")
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(db, "corpus"))
    session: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5, "min_len": 3,
                       "pad": 0, "max_lag": 16, "write_back": True,
                       "vid": 4}, session)["ok"]
    for _ in range(3):
        assert srv.handle({"op": "segment_push",
                           "paths": [paths["left"]] * 4}, session)["ok"]
    srv.handle({"op": "segment_finish"}, session)
    # no daemon shutdown, no reload: the rows are already durable
    fresh = PersistentClient(db, autoflush=False).get_collection("corpus")
    assert fresh.count() == 16  # 15 corpus rows + the written-back frame


def test_serve_ctl_per_op_default_timeout(monkeypatch):
    """reload reopens a whole collection before replying — the default
    wait must match rebuild-db --notify-socket's 300 s, not the 60 s
    that fits instant ops (a big swap would otherwise report 'did not
    answer' while the daemon completes it moments later)."""
    from vit_research_tpu import cli

    calls = {}

    def fake_request(sock, req, timeout=60.0):
        calls[req["op"]] = timeout
        return {"ok": True}

    monkeypatch.setattr("vit_research_tpu.serve.request", fake_request)
    cli.main(["serve-ctl", "reload", "--socket", "/nope.sock"])
    cli.main(["serve-ctl", "ping", "--socket", "/nope.sock"])
    cli.main(["serve-ctl", "stats", "--socket", "/nope.sock",
              "--timeout", "5"])
    assert calls == {"reload": 300.0, "ping": 60.0, "stats": 5.0}


def test_one_shot_request_missing_socket_is_friendly(tmp_path):
    """request() shares SessionClient's pre-check: a typoed socket path
    gets the 'start one with: serve' hint, not a raw ENOENT."""
    with pytest.raises(FileNotFoundError, match="no daemon socket"):
        request(str(tmp_path / "absent.sock"), {"op": "ping"})


def test_write_back_finishing_mid_reload_is_never_lost(
        engine, seg_world, tmp_path, monkeypatch):
    """A write-back session that starts AFTER reload's initial pin check
    and finishes DURING the (multi-minute in production) reopen window
    must not lose its acked rows. The hardening under test: the unpin
    flush holds the pin and serializes on _reload_lock, so the reload's
    final re-check refuses (two generations never go live around an
    unflushed session) and the rows land in the still-live old
    generation; the next reload then picks them up from disk."""
    import time

    import vit_research_tpu.store.vector_store as vs

    paths, coll = seg_world
    db = str(tmp_path / "segdb")
    coll.flush()  # seg_world built it in memory only
    srv = EmbedServer(engine, coalesce_ms=0, collection=coll,
                      collection_source=(db, "corpus"))
    n0 = coll.count()

    finish_started = threading.Event()
    reload_done = threading.Event()
    real_client = vs.PersistentClient

    class ReopenHoldsWindowOpen:
        """Stands in for PersistentClient inside _reload: keeps the
        reopen window open until the finishing session's pin has either
        dropped (the round-1 bug: unpin before flush) or provably stayed
        up because the flush is serialized behind the reload."""

        def __init__(self, *a, **k):
            self._real = real_client(*a, **k)

        def get_collection(self, name):
            assert finish_started.wait(10)
            deadline = time.monotonic() + 2.0
            while srv._write_back_sessions and time.monotonic() < deadline:
                time.sleep(0.01)
            return self._real.get_collection(name)

    reload_err: list = []

    def do_reload():
        try:
            reload_err.append(srv.handle({"op": "reload"}))
        except ValueError as e:
            reload_err.append(e)
        finally:
            reload_done.set()

    monkeypatch.setattr(vs, "PersistentClient", ReopenHoldsWindowOpen)
    rt = threading.Thread(target=do_reload, daemon=True)
    rt.start()  # passes the initial pin check (no session yet) and
    # parks inside get_collection waiting on finish_started

    # the session starts mid-reload, binds the OLD (still live)
    # collection, streams a decisive left run, and finishes mid-reopen
    session: dict = {}
    assert srv.handle({"op": "segment_start", "k": 5, "min_len": 3,
                       "pad": 0, "max_lag": 16, "write_back": True,
                       "vid": 9}, session)["ok"]
    for _ in range(3):
        assert srv.handle({"op": "segment_push",
                           "paths": [paths["left"]] * 4}, session)["ok"]

    # delay the session's unpin flush until the reload thread has fully
    # resolved — under the round-1 ordering (unpin -> swap+detach ->
    # flush) this forces the no-op flush that dropped the rows
    real_flush = coll.flush

    def delayed_flush():
        reload_done.wait(10)
        real_flush()

    monkeypatch.setattr(coll, "flush", delayed_flush)

    finish_err: list = []

    def do_finish():
        finish_started.set()
        try:
            finish_err.append(srv.handle({"op": "segment_finish"}, session))
        except Exception as e:  # pragma: no cover - diagnostic
            finish_err.append(e)

    ft = threading.Thread(target=do_finish, daemon=True)
    ft.start()
    rt.join(timeout=30)
    ft.join(timeout=30)
    assert not rt.is_alive() and not ft.is_alive()

    # the reload was refused (the pin was still up at its re-check) and
    # the finish succeeded
    assert isinstance(reload_err[0], ValueError), reload_err
    assert "write-back" in str(reload_err[0])
    assert isinstance(finish_err[0], dict) and finish_err[0]["ok"]
    assert srv._write_back_sessions == 0

    # nothing was lost: the daemon still serves the old generation with
    # the write-back row live, a fresh reload succeeds, and a fresh
    # from-disk load sees the row (it was flushed, not dropped)
    assert srv.collection is coll and coll.count() == n0 + 1
    monkeypatch.setattr(vs, "PersistentClient", real_client)
    resp = srv.handle({"op": "reload"})
    assert resp["ok"] and resp["rows"] == n0 + 1
    fresh = real_client(db, autoflush=False).get_collection("corpus")
    assert fresh.count() == n0 + 1
    assert "left.png" in set(fresh.get(include=())["ids"])


def test_stop_refuses_new_device_work(engine):
    """Once stop() has run, device ops must REFUSE rather than dispatch:
    handler threads are daemonic, so work started after the serve loop
    returns can be abandoned mid-device-call at interpreter exit — over
    the axon tunnel that wedges the chip like a mid-compile kill."""
    srv = EmbedServer(engine, coalesce_ms=0)
    srv.stop()
    with pytest.raises(RuntimeError, match="shutting down"):
        with srv._device():
            pass  # pragma: no cover - must not be reached


def test_serve_drains_inflight_device_work_before_returning(engine,
                                                            tmp_path):
    """serve() must not return from a shutdown while a device op is in
    flight (the CLI exits right after serve() returns)."""
    srv = EmbedServer(engine, coalesce_ms=0)
    sock = str(tmp_path / "quiesce.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)

    held, release = threading.Event(), threading.Event()

    def hold_device():  # stands in for a handler mid-embed
        with srv._lock:
            held.set()
            release.wait(10)

    h = threading.Thread(target=hold_device, daemon=True)
    h.start()
    assert held.wait(5)

    resp = request(sock, {"op": "shutdown"}, timeout=10)
    assert resp["ok"] and resp["stopping"]
    t.join(timeout=1.0)
    assert t.is_alive(), "serve() returned with a device op in flight"

    release.set()
    t.join(timeout=10)
    assert not t.is_alive()
    h.join(timeout=10)


# ---- hot weight reload (reload_weights) -----------------------------------


def _run_scored_stream(sock, paths, score_cfg, *, vid=7,
                       mid_stream_hook=None):
    """One full scored segment session; returns (start_reply, events).
    ``mid_stream_hook`` runs between pushes, before the clip finishes."""
    from vit_research_tpu.serve import SessionClient

    stream = ["left"] * 30 + ["none"] * 20
    stream_paths = [paths[s] for s in stream]
    events = []
    with SessionClient(sock) as c:
        start = c.request({"op": "segment_start", "k": 5, "min_len": 20,
                           "pad": 2, "max_lag": 64, "vid": vid,
                           "score_events": score_cfg})
        assert start["ok"], start
        for i in range(0, len(stream_paths), 10):
            if mid_stream_hook is not None and i == 20:
                mid_stream_hook()
            resp = c.request({"op": "segment_push",
                              "paths": stream_paths[i: i + 10]})
            assert resp["ok"], resp
            events.extend(resp.get("events", []))
        fin = c.request({"op": "segment_finish"})
        events.extend(fin.get("events", []))
    assert len(events) == 1 and events[0] is not None
    return start, events


def _rewrite_stage2_checkpoint(score_world, seed=99):
    """Write NEW stage-2 best params into the same run dir on disk, as a
    longer training run would."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.utils.configs import HeadConfig

    dim = 64
    ks, kc, kt = (score_world["k_sim"], score_world["k_contrast"],
                  score_world["k_temporal"])
    head = RATTHeadV2(HeadConfig(embed_dim=dim, k_sim=ks, k_contrast=kc,
                                 k_temporal=kt))
    p2 = head.init(jax.random.PRNGKey(seed), jnp.zeros((1, dim)),
                   jnp.zeros((1, ks, dim)), jnp.zeros((1, kc, dim)),
                   jnp.zeros((1, kt, dim)))
    m = CheckpointManager(score_world["ckpt"], score_world["stage2_run_id"])
    m.save(2, {"params": p2}, metrics={"val_acc": 2.0})
    m.maybe_update_best(2, 2.0)
    m.wait()


def test_reload_weights_rolls_new_sessions_forward(seg_server, score_world):
    """The train->serve weight loop: sessions share ONE cached stack per
    config (a checkpoint rewritten on disk does NOT leak into serving);
    reload_weights re-restores it and NEW sessions score with the new
    generation while the reply names the swap."""
    sock, paths = seg_server
    start_a, events_a = _run_scored_stream(sock, paths, score_world)
    assert start_a["weights_generation"] == 0

    # Training writes a better stage-2 checkpoint into the same run.
    _rewrite_stage2_checkpoint(score_world)

    # Without reload: the daemon still serves generation 0 — bit-equal
    # rows (deterministic same-process scoring), deliberate pinning.
    start_b, events_b = _run_scored_stream(sock, paths, score_world)
    assert start_b["weights_generation"] == 0
    assert events_b == events_a

    r = request(sock, {"op": "reload_weights"})
    assert r["ok"] and r["generation"] == 1
    assert r["reloaded"][0]["stage2_run_id"] == score_world["stage2_run_id"]

    stats = request(sock, {"op": "stats"})
    assert stats["weights_generation"] == 1 and stats["scorer_stacks"] == 1

    start_c, events_c = _run_scored_stream(sock, paths, score_world)
    assert start_c["weights_generation"] == 1
    # Different head params -> different scored row for the same clip.
    assert events_c != events_a
    # Retrieval is weight-independent here (same stage-1, same corpus).
    assert (events_c[0]["clip_key"] == events_a[0]["clip_key"]
            == "vid7_clip1")


def test_reload_weights_mid_session_pins_no_torn_reads(seg_server,
                                                       score_world):
    """A swap landing MID-SESSION must not tear the session's weights:
    the clip finishing after the reload scores exactly as a session that
    never saw a reload (its stack is pinned), while the next session
    gets the new generation."""
    sock, paths = seg_server
    _, events_ref = _run_scored_stream(sock, paths, score_world)

    def swap():
        _rewrite_stage2_checkpoint(score_world)
        r = request(sock, {"op": "reload_weights"})
        assert r["ok"] and r["active_sessions_pinned"] == 1

    _, events_pinned = _run_scored_stream(sock, paths, score_world,
                                          mid_stream_hook=swap)
    assert events_pinned == events_ref  # scored with the PINNED stack

    _, events_new = _run_scored_stream(sock, paths, score_world)
    assert events_new != events_ref  # next session rolled forward


def test_reload_weights_failure_keeps_serving_old_stack(seg_server,
                                                        score_world):
    """A reload whose restore fails (run vanished from disk) is an error
    reply with the old stack untouched — serving never goes half-swapped
    or dark."""
    import shutil

    sock, paths = seg_server
    _, events_a = _run_scored_stream(sock, paths, score_world)
    shutil.rmtree(os.path.join(score_world["ckpt"],
                               score_world["stage2_run_id"]))
    r = request(sock, {"op": "reload_weights"})
    assert not r["ok"] and "no run directory" in r["error"]
    stats = request(sock, {"op": "stats"})
    assert stats["weights_generation"] == 0
    _, events_b = _run_scored_stream(sock, paths, score_world)
    assert events_b == events_a  # old stack still serving


def test_reload_weights_preload_and_no_match(seg_server, score_world):
    """Nothing cached: a bare reload_weights is a clean error; the full
    target preloads a stack so the first session starts warm on the new
    generation."""
    sock, _ = seg_server
    r = request(sock, {"op": "reload_weights"})
    assert not r["ok"] and "matched no scorer stacks" in r["error"]
    r = request(sock, {
        "op": "reload_weights", "ckpt": score_world["ckpt"],
        "stage1_run_id": score_world["stage1_run_id"],
        "stage2_run_id": score_world["stage2_run_id"],
        "chunk_size": score_world["chunk_size"],
        "k_sim": score_world["k_sim"],
        "k_contrast": score_world["k_contrast"],
        "k_temporal": score_world["k_temporal"]})
    assert r["ok"] and r["generation"] == 1
    stats = request(sock, {"op": "stats"})
    assert stats["scorer_stacks"] == 1


def test_serve_ctl_reload_weights_cli(seg_server, score_world, capsys):
    """cli serve-ctl reload-weights: the operator form of the weight
    rollout (preload via explicit target, flag scoping, daemon errors)."""
    import json

    from vit_research_tpu import cli

    sock, _ = seg_server
    # nothing cached yet -> daemon error surfaces as SystemExit
    with pytest.raises(SystemExit, match="matched no scorer stacks"):
        cli.main(["serve-ctl", "reload-weights", "--socket", sock])
    # weight flags are scoped to reload-weights
    with pytest.raises(SystemExit, match="only apply to reload-weights"):
        cli.main(["serve-ctl", "ping", "--socket", sock,
                  "--ckpt", score_world["ckpt"]])
    capsys.readouterr()
    cli.main(["serve-ctl", "reload-weights", "--socket", sock,
              "--ckpt", score_world["ckpt"],
              "--stage1-run-id", score_world["stage1_run_id"],
              "--stage2-run-id", score_world["stage2_run_id"],
              "--chunk-size", str(score_world["chunk_size"]),
              "--k-sim", str(score_world["k_sim"]),
              "--k-contrast", str(score_world["k_contrast"]),
              "--k-temporal", str(score_world["k_temporal"])])
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and out["generation"] == 1
    assert out["reloaded"][0]["chunk_size"] == score_world["chunk_size"]


def test_reload_weights_dims_require_full_target(seg_server):
    """Dims without the full id triple would be silently discarded —
    refuse instead (review r4)."""
    sock, _ = seg_server
    r = request(sock, {"op": "reload_weights", "stage2_run_id": "x",
                       "chunk_size": 16})
    assert not r["ok"] and "preload target" in r["error"]


def test_scoring_session_bad_stride_rejected_before_restore(seg_server,
                                                            score_world):
    """A non-positive chunk_stride fails BEFORE the checkpoint restore:
    no scorer stack may be cached by the rejected request (review r4)."""
    from vit_research_tpu.serve import SessionClient

    sock, _ = seg_server
    with SessionClient(sock) as c:
        bad = dict(score_world, chunk_stride=0)
        r = c.request({"op": "segment_start", "k": 5,
                       "score_events": bad})
        assert not r["ok"] and "chunk_stride" in r["error"]
    stats = request(sock, {"op": "stats"})
    assert stats["scorer_stacks"] == 0


def test_reload_weights_pinned_counts_only_scoring_sessions(seg_server,
                                                            score_world):
    """active_sessions_pinned counts sessions holding a weight stack —
    a plain (non-scored) segment session has no weights to pin."""
    from vit_research_tpu.serve import SessionClient

    sock, _ = seg_server
    with SessionClient(sock) as c:
        assert c.request({"op": "segment_start", "k": 5, "min_len": 20,
                          "pad": 2, "max_lag": 64})["ok"]
        r = request(sock, {
            "op": "reload_weights", "ckpt": score_world["ckpt"],
            "stage1_run_id": score_world["stage1_run_id"],
            "stage2_run_id": score_world["stage2_run_id"],
            "chunk_size": score_world["chunk_size"],
            "k_sim": score_world["k_sim"],
            "k_contrast": score_world["k_contrast"],
            "k_temporal": score_world["k_temporal"]})
        assert r["ok"] and r["active_sessions_pinned"] == 0
        c.request({"op": "segment_finish"})


def test_reload_reports_profile_mismatch(engine, tmp_path, capsys):
    """reload onto a collection built under a different embedding
    profile warns and flags profile_mismatch in the reply."""
    from vit_research_tpu.store.vector_store import PersistentClient

    db, srv, base = _reload_world(tmp_path, engine)
    srv.engine_profile = "tome0|quant-none|gray0"
    r = srv.handle({"op": "reload"})
    assert r["ok"] and r["profile_mismatch"] is False  # unstamped: unknown
    ext = PersistentClient(db, autoflush=False).get_collection("served")
    ext.stamp_embedding_profile("tome16|quant-none|gray0")
    ext.flush()
    r = srv.handle({"op": "reload"})
    assert r["ok"] and r["profile_mismatch"] is True


def test_daemon_write_back_refused_cross_profile(engine, seg_world):
    """A write-back segment session against a cross-profile corpus is a
    protocol error, not a silent corpus contamination."""
    paths, coll = seg_world
    coll.stamp_embedding_profile("tome16|quant-none|gray0")
    srv = EmbedServer(engine, collection=coll, coalesce_ms=0,
                      engine_profile="tome0|quant-none|gray0")
    session: dict = {}
    # handle() raises; the socket layer converts to {"ok": false}
    with pytest.raises(ValueError, match="mixing embedding spaces"):
        srv.handle({"op": "segment_start", "k": 5, "write_back": True,
                    "vid": 1}, session)
    assert srv._write_back_sessions == 0 and session == {}
    # matching profile works
    srv2 = EmbedServer(engine, collection=coll, coalesce_ms=0,
                       engine_profile="tome16|quant-none|gray0")
    s2: dict = {}
    assert srv2.handle({"op": "segment_start", "k": 5, "write_back": True,
                        "vid": 1}, s2)["ok"]
    srv2.handle({"op": "segment_finish"}, s2)


def test_warming_server_lifecycle(engine, tmp_path):
    """The warming placeholder (serve.WarmingServer) makes daemon startup
    observable: ping/stats answer with warming/phase/elapsed, engine ops
    get a warming_up error, a shutdown is queued for the phase boundary,
    and close() releases the path for the real server's bind."""
    from vit_research_tpu.serve import SessionClient, WarmingServer

    sock = str(tmp_path / "warm.sock")
    warm = WarmingServer(sock)
    try:
        warm.phase = "engine build"
        r = request(sock, {"op": "ping"}, timeout=10.0)
        assert r["ok"] and r["warming"] and not r["ready"]
        assert r["phase"] == "engine build" and r["elapsed_s"] >= 0
        r = request(sock, {"op": "stats"}, timeout=10.0)
        assert r["ok"] and r["warming"]
        r = request(sock, {"op": "embed", "frames_b64": []}, timeout=10.0)
        assert not r["ok"] and "warming up" in r["error"]
        # binary framing has no early error channel: connection closes
        with SessionClient(sock, timeout=10.0) as c:
            frames = np.zeros((1, 32, 32, 3), np.uint8)
            with pytest.raises((OSError, ConnectionError)):
                c.request_binary({"op": "embed"}, frames=frames)
        assert not warm.shutdown_requested
        r = request(sock, {"op": "shutdown"}, timeout=10.0)
        assert r["ok"] and warm.shutdown_requested
    finally:
        warm.close()
    assert not os.path.exists(sock)
    # the real server can now bind the same path
    srv = EmbedServer(engine)
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(30)
    try:
        r = request(sock, {"op": "ping"}, timeout=30.0)
        assert r["ok"] and "warming" not in r
    finally:
        srv.stop()
        t.join(10)


def test_warming_close_severs_established_connections(tmp_path):
    """Review r5: close() must sever live handler connections — a
    persistent-connection poller would otherwise keep receiving
    'warming: true' from the placeholder forever after the real server
    takes over (the EmbedServer.stop() socketserver trap)."""
    from vit_research_tpu.serve import SessionClient, WarmingServer

    sock = str(tmp_path / "w2.sock")
    warm = WarmingServer(sock)
    c = SessionClient(sock, timeout=10.0)
    try:
        r = c.request({"op": "ping"})
        assert r["warming"]
        warm.close()
        warm.close()  # idempotent
        with pytest.raises((OSError, ConnectionError)):
            c.request({"op": "ping"})
    finally:
        c.close()
    assert not os.path.exists(sock)


def test_daemon_backend_waits_through_warming(monkeypatch):
    """A segment_start answered by the warming placeholder is patience,
    not refusal: the backend polls until the real server takes over —
    including across the severed connection at the warming->ready swap
    — then starts the session."""
    import argparse

    from vit_research_tpu import cli, serve

    events = []

    class _FakeClient:
        def __init__(self, *a, **kw):
            events.append("connect")

        def request(self, req):
            events.append("request")
            n = events.count("request")
            if n == 1:
                return {"ok": False, "warming": True,
                        "error": "daemon warming up"}
            if n == 2:  # the swap severs the connection
                raise ConnectionError("severed by warming close()")
            return {"ok": True, "scoring": False}

        def close(self):
            events.append("close")

    monkeypatch.setattr(serve, "SessionClient", _FakeClient)
    monkeypatch.setattr("time.sleep", lambda s: None)
    args = argparse.Namespace(
        socket="/tmp/x.sock", k=5, confidence_threshold=0.7, min_len=20,
        pad=2, max_lag=64, write_back=False, vid=1, score_events=False)
    backend = cli._DaemonFollowBackend(args)
    assert backend.client is not None
    # warming reply -> severed retry -> reconnect -> successful start
    assert events.count("request") == 3
    assert events.count("connect") == 2


def test_daemon_backend_initial_request_severed_by_swap(monkeypatch):
    """The warming->ready swap can sever the connection while the FIRST
    segment_start is in flight: the backend must ride through it, not
    crash __init__ with a raw ConnectionError."""
    import argparse

    from vit_research_tpu import cli, serve

    n = {"req": 0}

    class _FakeClient:
        def __init__(self, *a, **kw):
            pass

        def request(self, req):
            n["req"] += 1
            if n["req"] == 1:
                raise ConnectionError("severed mid-request")
            return {"ok": True, "scoring": False}

        def close(self):
            pass

    monkeypatch.setattr(serve, "SessionClient", _FakeClient)
    monkeypatch.setattr("time.sleep", lambda s: None)
    args = argparse.Namespace(
        socket="/tmp/x.sock", k=5, confidence_threshold=0.7, min_len=20,
        pad=2, max_lag=64, write_back=False, vid=1, score_events=False)
    backend = cli._DaemonFollowBackend(args)
    assert backend.client is not None and n["req"] == 2


def test_daemon_backend_bounds_dead_daemon_during_warming(monkeypatch):
    """A daemon that dies mid-warming must surface within the reconnect
    deadline, not consume the full 2400s warming budget: the wait
    tracks time-without-any-answer separately."""
    import argparse

    from vit_research_tpu import cli, serve

    made = {"n": 0}

    class _FakeClient:
        def __init__(self, *a, **kw):
            made["n"] += 1
            if made["n"] > 1:  # daemon gone: reconnects fail
                raise FileNotFoundError("no socket")

        def request(self, req):
            raise ConnectionError("daemon died")

        def close(self):
            pass

    fake_t = {"t": 0.0}

    def _mono():
        fake_t["t"] += 7.0
        return fake_t["t"]

    monkeypatch.setattr(serve, "SessionClient", _FakeClient)
    monkeypatch.setattr("time.sleep", lambda s: None)
    monkeypatch.setattr("time.monotonic", _mono)
    args = argparse.Namespace(
        socket="/tmp/x.sock", k=5, confidence_threshold=0.7, min_len=20,
        pad=2, max_lag=64, write_back=False, vid=1, score_events=False)
    with pytest.raises(SystemExit, match="stopped answering"):
        cli._DaemonFollowBackend(args)
