"""Multi-host layer: pod meshes, host-local batches, and a real
two-process DCN run over localhost (each worker = one virtual 4-device
host)."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vit_research_tpu.parallel import distributed as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_noop_single_process():
    assert D.initialize() is False  # no coordinator/env: single-process


def test_pod_mesh_single_host_shapes():
    mesh = D.pod_mesh(ici={"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = D.pod_mesh(ici={"data": 8})
    assert mesh.shape == {"data": 8}


def test_pod_mesh_moves_dcn_axes_outermost():
    # dcn axis must be outermost even when listed last in ici.
    mesh = D.pod_mesh(ici={"model": 8, "data": 1}, dcn={"data": 1})
    assert tuple(mesh.axis_names) == ("model", "data")
    devices = [type("Fake", (), {})] * 0  # unused on the error path
    with pytest.raises(ValueError):
        D.pod_mesh(ici={"model": 8}, dcn={"bogus": 2}, devices=devices)


def test_process_rows_and_shard_items():
    assert D.process_rows(16) == slice(0, 16)
    assert D.shard_items(list(range(6))) == [0, 1, 2, 3, 4, 5]


def test_process_rows_divisibility(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert D.process_rows(16) == slice(8, 12)
    with pytest.raises(ValueError):
        D.process_rows(15)


def test_global_batch_and_gather_single_process():
    mesh = D.pod_mesh(ici={"data": 8})
    full = np.arange(32 * 4, dtype=np.float32).reshape(32, 4)
    gb = D.global_batch(mesh, full[D.process_rows(32)])
    assert gb.shape == (32, 4)
    np.testing.assert_allclose(D.all_gather_to_hosts(gb), full)
    # non-default pspec: shard the feature dim
    gb2 = D.global_batch(mesh, full, pspec=P(None, None))
    np.testing.assert_allclose(D.all_gather_to_hosts(gb2), full)
    D.barrier("single")  # no-op, must not hang


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_over_localhost():
    """Two OS processes x 4 virtual CPU devices: distributed init, hybrid
    mesh, cross-host mean (psum over 'DCN'), gather-to-hosts, barrier."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "helpers",
                                          "dcn_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=300)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for pid, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker{pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out
