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

    mark("forced compact (full snapshot rewrite)")
    t0 = time.monotonic()
    col.compact()
    timings["compact_s"] = round(time.monotonic() - t0, 1)

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
