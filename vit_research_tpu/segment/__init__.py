from vit_research_tpu.segment.hmm import HMM, STATES, DEFAULT_TRANSITIONS  # noqa: F401
