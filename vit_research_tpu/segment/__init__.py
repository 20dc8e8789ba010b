from vit_research_tpu.segment.clips import StreamingClipExtractor  # noqa: F401
from vit_research_tpu.segment.hmm import (  # noqa: F401
    DEFAULT_TRANSITIONS,
    HMM,
    STATES,
    StreamingViterbi,
)
