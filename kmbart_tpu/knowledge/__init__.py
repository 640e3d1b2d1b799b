from kmbart_tpu.knowledge.atomic import AtomicGenerator  # noqa: F401
