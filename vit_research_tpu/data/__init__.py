from vit_research_tpu.data import chunks, labels, naming, preprocess  # noqa: F401
