"""A/B the attention einsum layout on the parity embed path.

The 2026-08-21 device trace (BENCH_NOTES.md) attributed 29.5 ms of the
214.8 ms B=512 batch to pure (512,12,197,64) layout copies that XLA
materializes around the transpose-form attention einsums
(models/vit.py::MultiHeadSelfAttention). ``attn_layout='bthd'`` removes
the explicit transposes and lets the einsums carry the head batch dim
from position 2; this harness measures whether XLA actually drops the
copies (prize: up to ~14% embed throughput) or re-inserts them for its
preferred dot layouts. Both variants run in ONE process (one
backend-init handshake). Numerics: identical contractions
(tests/test_attn_layout.py pins equivalence).

Usage: python examples/bench_attn_layout.py [--tiny]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _window  # noqa: E402  (window-guard clock starts here)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke")
    args = ap.parse_args()

    if args.tiny:
        os.environ.setdefault("VRT_PLATFORM", "cpu")

    import bench

    # --tiny keeps the real 224 spec (the engine's preprocess spec is
    # fixed) but shrinks batch/iters/layers so the CPU smoke is seconds.
    b = 8 if args.tiny else args.batch
    it = 2 if args.tiny else args.iters
    extra = dict(num_layers=2) if args.tiny else {}

    for layout in ("bhtd", "bthd"):
        r = bench.measure_embed_throughput(batch=b, iters=it,
                                           attn_layout=layout, **extra)
        print(json.dumps({
            "metric": "embed_throughput_attn_layout",
            "layout": layout,
            "batch": b,
            **r,
        }), flush=True)


if __name__ == "__main__":
    main()
