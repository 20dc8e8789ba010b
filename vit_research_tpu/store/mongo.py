"""MongoDB connectivity stub.

The reference keeps an unused Mongo stub (reference: nba_proj/mongo.py:1-7,
one insert against localhost). Kept for API parity, gated on pymongo
availability; the vector store (store/vector_store.py) is the real
persistence layer.
"""

from __future__ import annotations

_clients: dict = {}


def get_client(uri: str = "mongodb://localhost:27017/"):
    """One cached MongoClient per uri — each client owns a connection
    pool and monitor threads, so per-call construction leaks both."""
    try:
        from pymongo import MongoClient
    except ImportError:
        return None
    if uri not in _clients:
        _clients[uri] = MongoClient(uri)
    return _clients[uri]


def insert_one(collection_name: str, doc: dict, *, db_name: str = "nba",
               uri: str = "mongodb://localhost:27017/") -> bool:
    client = get_client(uri)
    if client is None:
        print("[mongo] pymongo unavailable; skipping insert")
        return False
    client[db_name][collection_name].insert_one(doc)
    return True
