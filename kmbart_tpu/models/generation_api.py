"""Model-level generate() — re-exports the generation front-end so the task
models (pretraining.py / conditional.py) mirror the reference's
GenerationMixin attachment (src/model/model.py:125,317)."""

from kmbart_tpu.generation.api import generate  # noqa: F401
