from kmbart_tpu.generation.api import generate, GenerationOptions  # noqa: F401
