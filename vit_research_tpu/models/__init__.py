from vit_research_tpu.models.vit import VisionTransformer  # noqa: F401
