from kmbart_tpu.serving.engine import GenerationEngine  # noqa: F401
