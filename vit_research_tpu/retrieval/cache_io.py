"""Shared pickle IO for the retrieval caches (cache_bins / cache_stage2).

Atomic via write-tmp + os.replace so a crash mid-save (e.g. during
build_stage2_cache's periodic checkpoints,
reference: nba_proj/train/training_stage2.py:800-804) never leaves a
truncated cache that poisons the next resume.
"""

from __future__ import annotations

import os
import pickle


def save_cache(cache: dict, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(cache, f)
    os.replace(tmp, path)


def load_cache(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
