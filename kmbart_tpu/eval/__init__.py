from kmbart_tpu.eval.metrics import compute_metric_inference, use_same_id  # noqa: F401
