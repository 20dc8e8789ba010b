"""Measure the ToMe (token merging) speed/throughput trade on a real chip.

Usage: python examples/bench_tome.py [tome_r]

Delegates to bench.py's shared harness (device-resident uint8 batches,
checksum readback, steady-state wall clock) so the numbers stay directly
comparable to the parity headline; run one ``tome_r`` per process so each
TPU compile stays short. r=0 reproduces the parity bench configuration.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_embed_throughput  # noqa: E402

if __name__ == "__main__":
    tome_r = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    print(json.dumps({"tome_r": tome_r,
                      **measure_embed_throughput(tome_r)}))
