from kmbart_tpu.training.adamw import adamw, AdamWState  # noqa: F401
from kmbart_tpu.training.state import TrainState  # noqa: F401
