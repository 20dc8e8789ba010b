"""MongoDB connectivity stub.

The reference keeps an unused Mongo stub (reference: nba_proj/mongo.py:1-7,
one insert against localhost). Kept for API parity, gated on pymongo
availability; the vector store (store/vector_store.py) is the real
persistence layer.
"""

from __future__ import annotations


def get_client(uri: str = "mongodb://localhost:27017/"):
    try:
        from pymongo import MongoClient
    except ImportError:
        return None
    return MongoClient(uri)


def insert_one(collection_name: str, doc: dict, *, db_name: str = "nba",
               uri: str = "mongodb://localhost:27017/") -> bool:
    client = get_client(uri)
    if client is None:
        print("[mongo] pymongo unavailable; skipping insert")
        return False
    client[db_name][collection_name].insert_one(doc)
    return True
