from vit_research_tpu.evaluate import clip_sequences  # noqa: F401
