"""Process-level durability fault injection for the vector store.

The persistence design claims crash safety: every file lands via
tmp+os.replace, the segment manifest is written after its segment, and
snapshot/manifest pairs are generation-fenced (store/vector_store.py
``_write_snapshot``/``_append_segment``/``_load_once``). The reference
delegated durability to ChromaDB's SQLite. This test earns the claim
the hard way: SIGKILL a writer process at an arbitrary moment in an
upsert/flush/compact loop, then require (a) the collection reopens
without error and (b) every batch whose flush was ACKED before the kill
is fully present — acknowledged durability survives torn writes,
orphan segments, and mid-compaction kills.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from vit_research_tpu.store.vector_store import PersistentClient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRITER = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from vit_research_tpu.store.vector_store import PersistentClient

client = PersistentClient({path!r}, autoflush=False)
col = client.get_or_create_collection("crash", metadata={{"hnsw:space": "l2"}})
rng = np.random.default_rng(0)
for batch in range(10000):
    ids = [f"b{{batch}}_r{{i}}" for i in range(10)]
    col.upsert(ids, rng.normal(size=(10, 16)).astype(np.float32),
               [{{"batch": batch}} for _ in ids])
    if batch % 7 == 3:  # interleave deletes so segments carry both kinds
        col.delete(ids=[f"b{{batch}}_r0"])
    col.flush()
    print(f"FLUSHED {{batch}}", flush=True)
"""


@pytest.mark.slow
def test_sigkill_writer_preserves_acked_flushes(tmp_path):
    store_path = str(tmp_path / "db")
    rng = np.random.default_rng(42)
    acked = -1
    for round_no in range(3):
        script = WRITER.format(repo=REPO, path=store_path)
        proc = subprocess.Popen([sys.executable, "-c", script],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        try:
            # Read a handful of acks, then kill at an arbitrary moment —
            # deliberately NOT aligned to a flush boundary.
            target = int(rng.integers(5, 40))
            deadline = time.monotonic() + 120
            seen = -1
            while seen < target and time.monotonic() < deadline:
                line = proc.stdout.readline()
                if not line:
                    raise AssertionError(
                        f"writer died early (round {round_no}), "
                        f"last ack {seen}")
                if line.startswith("FLUSHED "):
                    seen = int(line.split()[1])
            time.sleep(float(rng.uniform(0, 0.05)))
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:  # pragma: no cover
                proc.kill()
        acked = seen

        # Reopen: must load cleanly and hold every acked batch in full.
        col = PersistentClient(store_path, autoflush=False) \
            .get_collection("crash")
        ids = set(col.get(include=())["ids"])
        for batch in range(acked + 1):
            expect_gone = {f"b{batch}_r0"} if batch % 7 == 3 else set()
            for i in range(10):
                rid = f"b{batch}_r{i}"
                if rid in expect_gone:
                    assert rid not in ids, f"deleted row resurrected: {rid}"
                else:
                    assert rid in ids, (
                        f"acked row lost after kill (round {round_no}, "
                        f"acked {acked}): {rid}")
        # Queries still work on the recovered state.
        res = col.query(np.zeros((1, 16), np.float32), n_results=3)
        assert len(res["ids"][0]) == 3
        # Next round's writer continues into the same store (get_or_create
        # on an existing collection), stacking recovery on recovery.
