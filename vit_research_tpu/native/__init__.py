"""Native host-runtime components (C, loaded via ctypes).

The reference is pure Python (SURVEY.md: no native source anywhere); the
hot host-side loop it parallelized with fork pools — JPEG decode — is
implemented here natively: libjpeg(-turbo) DCT-scaled decode fused with
an exact-target bilinear resize (native/jpeg_fast.c), compiled on first
use and cached. ctypes releases the GIL during calls, so thread pools
genuinely overlap decode with device compute.
"""

from vit_research_tpu.native.jpeg import (  # noqa: F401
    decode_batch,
    decode_file,
    is_available,
)
