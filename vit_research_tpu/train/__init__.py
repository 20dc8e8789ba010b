from vit_research_tpu.train import losses, optim  # noqa: F401
