"""Measure the int8-GEMM (gemm_quant) embed-throughput trade on a real chip.

Usage: python examples/bench_quant.py [tome_r]

v5e's MXU runs int8 matmuls at 2x the bf16 peak; ops/quant.py swaps the
encoder-block contractions for dynamically-quantized s8xs8->s32. This
measures what that buys end-to-end (the dynamic-quantization VPU passes
eat into the ideal 2x). Delegates to bench.py's shared harness so the
number is directly comparable to the parity headline; an optional
``tome_r`` stacks token merging on top (the two compose). Run one config
per process so each TPU compile stays short.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_embed_throughput  # noqa: E402

if __name__ == "__main__":
    tome_r = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    print(json.dumps({"gemm_quant": "int8", "tome_r": tome_r,
                      **measure_embed_throughput(tome_r,
                                                 gemm_quant="int8")}))
