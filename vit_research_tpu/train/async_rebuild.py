"""Asynchronous vector-DB rebuild overlapped with training.

The reference rebuilds its retrieval DB synchronously every
``REBUILD_EVERY`` epochs — training stalls for the full rebuild
(421 s measured, reference: nba_proj/train/training.py:479-480,
nba_proj/db_maintainence/db_rebuild_chunk.py:53). SURVEY.md calls
orchestrating this feedback loop without stalls the main systems
challenge.

Design: double-buffered collections. The retriever reads the *active*
collection; the rebuilder writes a *shadow* collection on a host thread
(embedding batches still ride the device queue, interleaving with train
steps — XLA serializes fairly); at the next epoch boundary the trainer
calls :meth:`RebuildScheduler.maybe_swap` and retrieval atomically moves
to the fresh snapshot. Training never blocks on the rebuild, and
retrieval never sees a half-built DB (the reference's in-place wipe +
re-upsert exposed a partially-empty collection for the whole rebuild).
"""

from __future__ import annotations

import threading
import traceback


class SwappableCollection:
    """Collection handle whose backing store swaps atomically.

    Duck-types the query/get/count surface the retrievers use; swap() is
    O(1) and thread-safe."""

    def __init__(self, collection):
        self._active = collection
        self._lock = threading.Lock()
        self._swap_gen = 0  # snapshot-version component; see _mutations

    @property
    def active(self):
        with self._lock:
            return self._active

    def swap(self, new_collection) -> None:
        with self._lock:
            self._active = new_collection
            self._swap_gen += 1

    # -- retriever surface -------------------------------------------------
    def query(self, *a, **k):
        return self.active.query(*a, **k)

    def get(self, *a, **k):
        return self.active.get(*a, **k)

    def count(self):
        return self.active.count()

    def upsert(self, *a, **k):
        return self.active.upsert(*a, **k)

    def delete(self, *a, **k):
        return self.active.delete(*a, **k)

    # retrievers snapshot these internals (retrieval/retrievers._StoreView)
    @property
    def space(self):
        return self.active.space

    @property
    def _mutations(self):
        # The snapshot version must change on swap() even if the two
        # collections share a counter value. A monotone swap generation
        # (NOT id(active) — CPython reuses ids after GC) guarantees it.
        with self._lock:
            return (self._swap_gen, self._active._mutations)

    @property
    def _embeddings(self):
        return self.active._embeddings

    def _column(self, field):
        return self.active._column(field)


class RebuildScheduler:
    """Runs ``rebuild_fn(shadow_collection)`` on a background thread and
    swaps it in at the next epoch boundary."""

    def __init__(self, swappable: SwappableCollection, make_collection,
                 rebuild_fn):
        """Args:
          make_collection: callable() -> empty Collection (shadow target).
          rebuild_fn: callable(collection, *kick_args) -> None; fills the
            shadow. ``kick_args`` are whatever the training loop passes
            to :meth:`kick` — train_rag passes its live ``project_np``,
            so a scheduler built for train_rag must accept
            ``(shadow, project_fn)``.
        """
        self.swappable = swappable
        self.make_collection = make_collection
        self.rebuild_fn = rebuild_fn
        self._thread: threading.Thread | None = None
        self._ready: object | None = None
        self._error: str | None = None
        self._lock = threading.Lock()
        self.swaps = 0

    def kick(self, *args) -> bool:
        """Start a rebuild if none is in flight. Returns True if started.

        Extra ``args`` are forwarded to ``rebuild_fn(shadow, *args)`` —
        the training loop passes its CURRENT projection so the rebuild
        embeds with the live weights, not the ones from scheduler
        construction time."""
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                return False
            shadow = self.make_collection()

            def work():
                try:
                    self.rebuild_fn(shadow, *args)
                    with self._lock:
                        self._ready = shadow
                except Exception:  # surfaced at the next maybe_swap
                    with self._lock:
                        self._error = traceback.format_exc()

            self._thread = threading.Thread(target=work, daemon=True)
            self._thread.start()
            return True

    def maybe_swap(self, raise_on_error: bool = True) -> bool:
        """Swap in a completed rebuild (epoch-boundary call). Returns True
        when a swap happened. Raises if the rebuild thread failed —
        pass ``raise_on_error=False`` after training has finished, where
        a failed auxiliary DB write must not discard the trained state
        (the error is printed instead)."""
        with self._lock:
            if self._error is not None:
                err, self._error = self._error, None
                if not raise_on_error:
                    print(f"[async_rebuild] final rebuild failed "
                          f"(ignored):\n{err}")
                    return False
                raise RuntimeError(f"async rebuild failed:\n{err}")
            if self._ready is None:
                return False
            shadow, self._ready = self._ready, None
        self.swappable.swap(shadow)
        self.swaps += 1
        return True

    def wait(self, timeout: float | None = None) -> None:
        t = self._thread
        if t is not None:
            t.join(timeout)
