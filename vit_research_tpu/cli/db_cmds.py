"""Vector-store commands: write-ratt-db, write-rag-db, rebuild-db,
search, db-info."""

from __future__ import annotations

import os

from vit_research_tpu.cli import common


def cmd_write_ratt_db(args):
    from vit_research_tpu.db.builders import write_ratt_chunk_db
    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.store.vector_store import PersistentClient

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    encode, _ = common._stage1_encode(store, idx, args.ckpt, args.run_id)
    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    # chunk rows inherit the STORE's embedding profile (the frames were
    # embedded at store-build time, not now)
    if store.embedding_profile:
        common._stamp_profile(col, store.embedding_profile)
    n = write_ratt_chunk_db(idx, store, encode, col)
    client.flush()
    print(f"wrote {n} chunk embeddings into {args.collection}")


def cmd_write_rag_db(args):
    """Frame-level RAG DB from the memmap frame store
    (reference: nba_proj/write_clips_to_ragdb.py:296-391)."""
    from vit_research_tpu.db.builders import write_frame_ragdb
    from vit_research_tpu.db.frame_store import FrameStore
    from vit_research_tpu.store.vector_store import PersistentClient

    recs, _ = common._load_world(args)
    store = FrameStore(args.store).open()

    def embed(paths):
        return store.gather_paths([[p] for p in paths])[:, 0]

    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    if store.embedding_profile:
        common._stamp_profile(col, store.embedding_profile)
    n = write_frame_ragdb(recs, embed, col, batch_size=args.batch_size)
    client.flush()
    print(f"wrote {n} frame embeddings into {args.collection}")


def cmd_rebuild_db(args):
    """Standalone frame-level DB rebuild, optionally re-projecting with a
    trained rag run's ProjectionHead (reference:
    nba_proj/db_maintainence/db_rebuild.py:100-232 — run standalone there,
    and every REBUILD_EVERY epochs from training.py:479-480; the
    in-training equivalents are train-rag --rebuild sync and
    train/async_rebuild.py)."""
    from vit_research_tpu.db.builders import rebuild_frame_db
    from vit_research_tpu.db.frame_store import FrameStore
    from vit_research_tpu.store.vector_store import PersistentClient

    recs, _ = common._load_world(args)
    store = FrameStore(args.store).open()

    def embed(paths):
        return store.gather_paths([[p] for p in paths])[:, 0]

    project_fn = None
    if args.run_id:
        import jax.numpy as jnp
        import numpy as np

        from vit_research_tpu.models.heads import ProjectionHead
        from vit_research_tpu.train.checkpoint import CheckpointManager

        if args.ckpt is None:
            raise SystemExit("--run-id needs --ckpt (the checkpoint root)")
        if not os.path.isdir(os.path.join(args.ckpt, args.run_id)):
            raise SystemExit(f"--run-id {args.run_id}: no such run under "
                             f"{args.ckpt!r}")
        restored = CheckpointManager(args.ckpt, args.run_id).restore_best()
        if restored is None or "proj" not in restored.get("params", {}):
            raise SystemExit(f"--run-id {args.run_id}: no best checkpoint "
                             "with ProjectionHead params (expect a "
                             "train-rag run)")
        proj_params = restored["params"]["proj"]
        proj = ProjectionHead(input_dim=store.dim, proj_dim=store.dim)

        def project_fn(x):
            return np.asarray(proj.apply(proj_params, jnp.asarray(x)))

    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    if store.embedding_profile:
        # Projected rows are a DIFFERENT space than the raw store
        # embeddings (ProjectionHead output) — the profile must say so,
        # or the fence would vouch for raw-vs-projected comparability.
        profile = store.embedding_profile + (
            f"|proj:{args.run_id}" if project_fn is not None else "")
        common._stamp_profile(col, profile)
    n = rebuild_frame_db(recs, embed, project_fn, col,
                         batch_size=args.batch_size)
    client.flush()
    print(f"rebuilt {args.collection}: {n} frame embeddings"
          + (" (re-projected)" if project_fn else ""))
    if args.notify_socket:
        # Close the train->serve loop: the daemon hot-swaps to the
        # rebuilt generation without an engine restart. Flush happened
        # above, so the reopened collection sees every row.
        from vit_research_tpu.serve import request as serve_request

        try:
            resp = serve_request(
                args.notify_socket,
                {"op": "reload", "db": args.db,
                 "collection": args.collection},
                timeout=300.0)
        except (OSError, ConnectionError) as e:
            raise SystemExit(
                f"rebuild succeeded but the daemon at "
                f"{args.notify_socket!r} did not answer the reload: {e}")
        if not resp.get("ok"):
            raise SystemExit("rebuild succeeded but the daemon reload "
                             f"failed: {resp.get('error')}")
        print(f"daemon reloaded {args.collection}: {resp['rows']} rows "
              f"(was {resp['previous_rows']})")


def cmd_search(args):
    """Ad-hoc neighbor lookup: embed frames (or take rows from an .npz)
    and query a collection, printing one JSON line per query. The
    scriptable face of the store's exact device top-k."""
    import json

    import numpy as np

    from vit_research_tpu.store.vector_store import PersistentClient

    col = PersistentClient(args.db).get_collection(args.collection)
    if args.npz:
        with np.load(args.npz) as data:
            key = args.npz_key or data.files[0]
            q = np.asarray(data[key], np.float32)
        if q.ndim == 3:  # (N, 1, D): the reference's class-npz layout
            q = q[:, 0]
        elif q.ndim == 1:
            q = q[None]
        names = [f"{args.npz}[{key}][{i}]" for i in range(len(q))]
    elif args.frames:
        # the queries are embedded NOW: warn if the stored rows came
        # from different embedding settings (fast-profile guard)
        common.check_embedding_profile(col)
        eng = common._engine(batch_size=args.batch_size)
        q = np.asarray(eng.embed_paths(args.frames))
        names = list(args.frames)
    else:
        raise SystemExit("pass frame paths or --npz")
    where = json.loads(args.where) if args.where else None
    got = col.query(q, n_results=args.k, where=where,
                    include=("metadatas", "distances"))
    for name, ids, dists, metas in zip(names, got["ids"],
                                       got["distances"], got["metadatas"]):
        print(json.dumps({
            "query": name,
            "neighbors": [{"id": i, "distance": round(float(d), 6),
                           "metadata": m}
                          for i, d, m in zip(ids, dists, metas)],
        }))


def cmd_db_info(args):
    """Inspect a vector-store root: per-collection rows, space, dim,
    device quantization, and log-segment state (the ops view of
    store/vector_store.py's snapshot+append-log layout)."""
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(args.db, autoflush=False)
    names = client.list_collections()
    if not names:
        raise SystemExit(f"no collections under {args.db}")
    for name in names:
        col = client.get_collection(name)
        segs = len(col._segments)
        print(f"{name}: {col.count()} rows  space={col.space}  "
              f"dim={col._dim}  device_quant={col.device_quant or '-'}  "
              f"profile={col.embedding_profile or '-'}  "
              f"log_segments={segs}")
        if args.compact and segs:
            col.compact()
            print(f"  compacted {segs} segments into a fresh snapshot")


def register(sub):
    wr = sub.add_parser("write-ratt-db")
    wr.add_argument("--store", required=True)
    wr.add_argument("--ckpt", required=True)
    wr.add_argument("--db", required=True)
    wr.add_argument("--collection", default="ratt_db")
    wr.add_argument("--run-id", default=None)
    wr.set_defaults(fn=cmd_write_ratt_db)

    wg = sub.add_parser("write-rag-db")
    common.world_args(wg)
    wg.add_argument("--store", required=True)
    wg.add_argument("--db", required=True)
    wg.add_argument("--collection", default="ragdb")
    wg.add_argument("--batch-size", type=int, default=256)
    wg.set_defaults(fn=cmd_write_rag_db)

    rb = sub.add_parser(
        "rebuild-db", help="standalone frame-level DB rebuild")
    common.world_args(rb)
    rb.add_argument("--store", required=True)
    rb.add_argument("--db", required=True)
    rb.add_argument("--collection", default="ragdb")
    rb.add_argument("--ckpt", default=None)
    rb.add_argument("--run-id", default=None,
                    help="train-rag run whose ProjectionHead re-projects "
                         "the embeddings")
    rb.add_argument("--batch-size", type=int, default=256)
    rb.add_argument("--notify-socket", default=None,
                    help="after the rebuild, hot-reload the collection "
                         "in the serve daemon on this socket (its "
                         "followers keep their warm engine)")
    rb.set_defaults(fn=cmd_rebuild_db)

    se = sub.add_parser(
        "search", help="embed frames (or .npz rows) and print neighbors")
    se.add_argument("frames", nargs="*", help="frame image paths")
    se.add_argument("--db", required=True)
    se.add_argument("--collection", required=True)
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--where", default=None,
                    help='metadata filter as JSON, e.g. \'{"side": "left"}\'')
    se.add_argument("--npz", default=None,
                    help="query embeddings from an .npz instead of frames")
    se.add_argument("--npz-key", default=None)
    se.add_argument("--batch-size", type=int, default=256)
    se.set_defaults(fn=cmd_search)

    di = sub.add_parser("db-info",
                        help="inspect a vector-store root's collections")
    di.add_argument("db")
    di.add_argument("--compact", action="store_true",
                    help="merge each collection's append-log into a "
                         "fresh snapshot")
    di.set_defaults(fn=cmd_db_info)
