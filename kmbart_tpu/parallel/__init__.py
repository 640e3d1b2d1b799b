from kmbart_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from kmbart_tpu.parallel.train_step import build_train_step, build_eval_step  # noqa: F401
