"""Store housekeeping at capacity scale — HOST-side, no TPU.

VERDICT r3 weak-point 6: the 10M-row capacity claim was proven for the
QUERY path (bench_capacity_10m.py, on-chip); the host-side costs of
keeping such a corpus durable — flush, forced compaction (full snapshot
rewrite), reload — were never measured, and nothing said where the
out-of-core IVF spill (store/ivf.py) crossover is. This harness times
them on a synthetic corpus (default 5M x 768 f32 = 15.4 GB of
embeddings + 5M metadata dicts) and prints one JSON line:

  build        in-memory upsert of the full corpus (batched)
  first_flush  initial snapshot write (embeddings + ids + json metadata)
  delta_flush  1%-of-corpus upsert + flush -> one append-log segment
  compact      forced log->snapshot merge (the rebuild-scale rewrite the
               reference paid 421 s for at 3k rows,
               /root/reference/nba_proj/db_maintainence/db_rebuild_chunk.py:53)
  reload       Collection._load of the compacted directory

Run it on the 1-core box:  python examples/bench_store_housekeeping.py
(about 5-10 min at 5M rows; needs ~2.2x corpus bytes of free disk for
the atomic tmp+final snapshot pair).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def mark(msg: str) -> None:
    print(f"[housekeeping] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=250_000)
    ap.add_argument("--root", default=None,
                    help="store directory (default: a tempdir, removed "
                         "afterwards)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from vit_research_tpu.store.vector_store import Collection

    root = args.root or tempfile.mkdtemp(prefix="vrt_housekeeping_")
    path = os.path.join(root, "corpus")
    col = Collection("corpus", space="cosine", dim=args.dim, path=path)

    rng = np.random.default_rng(0)
    timings: dict[str, float] = {}

    t0 = time.monotonic()
    for s in range(0, args.rows, args.batch):
        n = min(args.batch, args.rows - s)
        ids = [f"r{i}" for i in range(s, s + n)]
        embs = rng.normal(size=(n, args.dim)).astype(np.float32)
        metas = [{"vid": i % 64, "label": i % 2, "start_idx": i}
                 for i in range(s, s + n)]
        col.upsert(ids, embs, metadatas=metas)
        if (s // args.batch) % 4 == 0:
            mark(f"built {s + n:,}/{args.rows:,} rows "
                 f"({time.monotonic() - t0:.0f}s, rss {rss_gb():.1f} GB)")
    timings["build_s"] = round(time.monotonic() - t0, 1)

    mark("first flush (initial snapshot write)")
    t0 = time.monotonic()
    col.flush()
    timings["first_flush_s"] = round(time.monotonic() - t0, 1)
    snap_gb = os.path.getsize(os.path.join(path, "snapshot.npz")) / 1e9

    # Delta flush: touch 1% of the corpus -> append-log segment, the
    # steady-state durability cost between rebuilds.
    n_delta = max(args.rows // 100, 1)
    idx = rng.integers(0, args.rows, size=n_delta)
    mark(f"delta upsert of {n_delta:,} rows + flush (append segment)")
    col.upsert([f"r{i}" for i in idx],
               rng.normal(size=(n_delta, args.dim)).astype(np.float32),
               metadatas=[{"vid": int(i) % 64, "label": int(i) % 2,
                           "start_idx": int(i)} for i in idx])
    t0 = time.monotonic()
    col.flush()
    timings["delta_flush_s"] = round(time.monotonic() - t0, 1)

    # Query availability during compaction (VERDICT r4 #3): the snapshot
    # rewrite runs OUTSIDE the collection lock, so serving queries must
    # keep answering at ~idle latency while the multi-second write is on
    # disk. Uses the store's own serving path at this scale (IVF for
    # unfiltered cosine >= ivf_threshold); the fit is prewarmed so the
    # measurement sees steady-state query cost, not the one-time fit.
    q = rng.normal(size=(8, args.dim)).astype(np.float32)
    mark("prewarming query path (IVF fit at this scale)")
    t0 = time.monotonic()
    col.query(q, n_results=8)
    timings["query_warm_s"] = round(time.monotonic() - t0, 1)

    def _p50(lat):
        return round(float(np.percentile(lat, 50)) * 1e3, 1)

    idle_lat = []
    for _ in range(20):
        t0 = time.monotonic()
        col.query(q, n_results=8)
        idle_lat.append(time.monotonic() - t0)

    mark("forced compact (full snapshot rewrite) + concurrent queries")
    import threading

    t0 = time.monotonic()
    ct = threading.Thread(target=col.compact)
    ct.start()
    compact_lat = []
    while ct.is_alive():
        tq = time.monotonic()
        col.query(q, n_results=8)
        compact_lat.append(time.monotonic() - tq)
    ct.join()
    timings["compact_s"] = round(time.monotonic() - t0, 1)
    timings["query_p50_idle_ms"] = _p50(idle_lat)
    # A fast compact (tiny --rows smoke) can finish before any query
    # lands — report null rather than crash on an empty percentile.
    timings["query_p50_during_compact_ms"] = (
        _p50(compact_lat) if compact_lat else None)
    timings["query_max_during_compact_ms"] = (
        round(max(compact_lat) * 1e3, 1) if compact_lat else None)
    timings["queries_during_compact"] = len(compact_lat)

    mark("reload from disk")
    t0 = time.monotonic()
    col2 = Collection._load("corpus", path)
    timings["reload_s"] = round(time.monotonic() - t0, 1)
    assert col2.count() == args.rows, col2.count()

    out = {
        "metric": "store_housekeeping",
        "rows": args.rows, "dim": args.dim,
        "corpus_gb": round(args.rows * args.dim * 4 / 1e9, 1),
        "snapshot_gb": round(snap_gb, 1),
        **timings,
        "peak_rss_gb": round(rss_gb(), 1),
        "unit": "seconds",
    }
    print(json.dumps(out), flush=True)
    if not args.keep and args.root is None:
        del col, col2
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
