from cnn_tpu.utils.metrics import ClassificationEvaluator  # noqa: F401
