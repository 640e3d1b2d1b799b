from kmbart_tpu.utils.task import TaskType  # noqa: F401
from kmbart_tpu.utils.logger import Logger  # noqa: F401
