"""Mesh-sharded exact top-k (ops/sharded_topk.py) vs the flat path.

Runs on the 8-virtual-device CPU mesh (conftest). Parity must be exact —
same scores AND same indices, including tie-breaking — because the
sharded path is documented as a drop-in for ops/topk.py::masked_topk.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vit_research_tpu.ops.sharded_topk import (pad_corpus, place_sharded,
                                               sharded_masked_topk,
                                               sharded_masked_topk_int8)
from vit_research_tpu.ops.topk import (l2_normalize, masked_topk,
                                       masked_topk_int8, quantize_int8)
from vit_research_tpu.parallel.mesh import make_mesh
from vit_research_tpu.store.vector_store import Collection


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # all 8 virtual CPU devices on the 'data' axis


def _flat_vs_sharded(q, c, mask, k, metric, mesh, **kw):
    s0, i0 = masked_topk(jnp.asarray(q), jnp.asarray(c),
                         None if mask is None else jnp.asarray(mask),
                         k=k, metric=metric)
    s1, i1 = sharded_masked_topk(q, c, mask, k=k, mesh=mesh, metric=metric,
                                 **kw)
    s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
    assert s0.shape == s1.shape
    valid = s0 > -1e29
    np.testing.assert_allclose(s0[valid], s1[valid], atol=1e-5)
    np.testing.assert_array_equal(i0[valid], i1[valid])
    # Invalid (NEG_INF fill) entries agree on being invalid.
    assert ((np.asarray(s1) > -1e29) == valid).all()


@pytest.mark.parametrize("n", [64, 61, 8, 5, 3])
@pytest.mark.parametrize("metric", ["cosine", "l2", "ip"])
def test_parity_shapes_and_masks(rng, mesh, n, metric):
    q = rng.normal(size=(7, 16)).astype(np.float32)
    c = rng.normal(size=(n, 16)).astype(np.float32)
    if metric == "cosine":
        q, c = np.asarray(l2_normalize(q)), np.asarray(l2_normalize(c))
    mask = rng.random((7, n)) > 0.3
    _flat_vs_sharded(q, c, mask, 6, metric, mesh)
    _flat_vs_sharded(q, c, None, 6, metric, mesh)


def test_tie_breaking_matches_flat(rng, mesh):
    # Duplicated corpus rows force exact score ties across shards; the
    # merged order must still equal the flat path's lowest-index-first.
    c = np.repeat(rng.normal(size=(8, 16)).astype(np.float32), 4, axis=0)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    s0, i0 = masked_topk(jnp.asarray(q), jnp.asarray(c), None, k=12,
                         metric="ip")
    s1, i1 = sharded_masked_topk(q, c, None, k=12, mesh=mesh, metric="ip")
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_k_larger_than_corpus(rng, mesh):
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(10, 8)).astype(np.float32)
    s, i = sharded_masked_topk(q, c, None, k=50, mesh=mesh, metric="ip")
    assert s.shape == (4, 10) and i.shape == (4, 10)
    _flat_vs_sharded(q, c, None, 50, "ip", mesh)


def test_fully_masked_rows_fill_neg_inf(rng, mesh):
    q = rng.normal(size=(2, 8)).astype(np.float32)
    c = rng.normal(size=(9, 8)).astype(np.float32)
    mask = np.zeros((2, 9), bool)
    mask[1, 3] = True
    s, i = sharded_masked_topk(q, c, mask, k=4, mesh=mesh, metric="ip")
    s = np.asarray(s)
    assert (s[0] < -1e29).all()
    assert (s[1, 0] > -1e29) and (s[1, 1:] < -1e29).all()
    assert int(np.asarray(i)[1, 0]) == 3


def test_preplaced_padded_corpus_needs_n_valid(rng, mesh):
    # Pre-padding adds zero rows that score 0.0 under 'ip'; with
    # all-negative true scores they would win top-k unless n_valid
    # masks them out.
    q = -np.abs(rng.normal(size=(3, 8))).astype(np.float32)
    c = np.abs(rng.normal(size=(10, 8))).astype(np.float32)  # scores < 0
    cp, n = pad_corpus(jnp.asarray(c), 8)
    assert cp.shape[0] == 16 and n == 10
    cp = place_sharded(cp, mesh)
    s, i = sharded_masked_topk(q, cp, None, k=5, mesh=mesh, metric="ip",
                               n_valid=n)
    _flat = masked_topk(jnp.asarray(q), jnp.asarray(c), None, k=5,
                        metric="ip")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(_flat[1]))
    assert (np.asarray(i) < n).all()


def test_broadcastable_column_mask_matches_flat(rng, mesh):
    """A (Q, 1) mask is broadcastable to (Q, N) under the flat contract;
    the sharded path must broadcast it, not pad it with False."""
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(16, 8)).astype(np.float32)
    mask = np.ones((3, 1), bool)
    mask[1, 0] = False  # query 1 sees nothing
    _flat_vs_sharded(q, c, mask, 4, "ip", mesh)
    with pytest.raises(ValueError, match="columns"):
        sharded_masked_topk(q, c, np.ones((3, 7), bool), k=4, mesh=mesh,
                            metric="ip")


def test_int8_parity(rng, mesh):
    q = rng.normal(size=(5, 32)).astype(np.float32)
    c = rng.normal(size=(50, 32)).astype(np.float32)
    qq, qs = quantize_int8(q)
    cq, cs = quantize_int8(c)
    mask = rng.random((5, 50)) > 0.2
    s0, i0 = masked_topk_int8(qq, qs, cq, cs, jnp.asarray(mask), k=9)
    s1, i1 = sharded_masked_topk_int8(qq, qs, cq, cs, mask, k=9, mesh=mesh)
    s0, s1 = np.asarray(s0), np.asarray(s1)
    valid = s0 > -1e29
    np.testing.assert_allclose(s0[valid], s1[valid], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[valid],
                                  np.asarray(i1)[valid])


def test_2d_mesh_shards_over_named_axis_only(rng):
    """On a (data x model) mesh the corpus shards over 'data' only and
    results stay exact — the dryrun_multichip topology as a unit test."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh

    devices = np_.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2d = Mesh(devices, ("data", "model"))
    q = rng.normal(size=(5, 16)).astype(np.float32)
    c = rng.normal(size=(42, 16)).astype(np.float32)
    mask = rng.random((5, 42)) > 0.3
    _flat_vs_sharded(q, c, mask, 6, "ip", mesh2d)


def test_empty_corpus_raises(mesh):
    with pytest.raises(ValueError, match="empty"):
        sharded_masked_topk(np.zeros((1, 4), np.float32),
                            np.zeros((0, 4), np.float32), None, k=3,
                            mesh=mesh)


# ---------------------------------------------------------- Collection

def _mk_collection(rng, space, n=40, d=16, **kw):
    col = Collection("t", space=space, **kw)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = [f"id{i}" for i in range(n)]
    metas = [{"vid_num": f"vid{i % 3}", "t_norm": i / n} for i in range(n)]
    col.upsert(ids, emb, metas)
    return col, emb


@pytest.mark.parametrize("space", ["cosine", "l2", "ip"])
def test_collection_sharded_query_parity(rng, mesh, space):
    col, emb = _mk_collection(rng, space)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    where = {"vid_num": {"$ne": "vid1"}}
    expected = col.query(q, n_results=5, where=where)
    col.shard_device(mesh)
    got = col.query(q, n_results=5, where=where)
    assert got["ids"] == expected["ids"]
    for a, b in zip(got["distances"], expected["distances"]):
        np.testing.assert_allclose(a, b, atol=1e-5)
    # un-shard restores the original path
    col.shard_device(None)
    again = col.query(q, n_results=5, where=where)
    assert again["ids"] == expected["ids"]


def test_collection_sharded_int8(rng, mesh):
    # Corpus big enough that the UNSHARDED query also takes the int8
    # device path (n * Q >= 1 << 14) — otherwise it answers in f32
    # numpy and near-ties order differently than the quantized scores.
    col, _ = _mk_collection(rng, "cosine", n=4101, device_quant="int8")
    q = rng.normal(size=(4, 16)).astype(np.float32)
    expected = col.query(q, n_results=6)
    col.shard_device(mesh)
    got = col.query(q, n_results=6)
    assert got["ids"] == expected["ids"]


def test_collection_sharded_after_disk_roundtrip(rng, mesh, tmp_path):
    """shard_device composes with persistence: flush, reload from disk,
    shard the reloaded collection, same answers."""
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(str(tmp_path / "db"), autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine"})
    emb = rng.normal(size=(40, 16)).astype(np.float32)
    col.upsert([f"id{i}" for i in range(40)], emb)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    expected = col.query(q, n_results=5)["ids"]
    quant = client.get_or_create_collection(
        "cq", metadata={"hnsw:space": "cosine",
                        "vrt:device_quant": "int8"})
    quant.upsert(["a"], emb[:1])
    client.flush()

    reloaded = PersistentClient(str(tmp_path / "db"))
    col2 = reloaded.get_collection("c")
    col2.shard_device(mesh)
    assert col2.query(q, n_results=5)["ids"] == expected
    # device_quant round-trips through config.json
    assert reloaded.get_collection("cq").device_quant == "int8"


def test_collection_sharded_survives_upsert(rng, mesh):
    col, _ = _mk_collection(rng, "cosine")
    col.shard_device(mesh)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    col.query(q, n_results=3)  # builds the sharded cache
    new = rng.normal(size=(3, 16)).astype(np.float32)
    col.upsert(["n0", "n1", "n2"], new)  # invalidates cache
    got = col.query(new, n_results=1)
    assert got["ids"] == [["n0"], ["n1"], ["n2"]]
