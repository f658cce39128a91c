from cnn_tpu.core.config import DataConfig, ModelConfig, TrainConfig  # noqa: F401
from cnn_tpu.core.rng import RngStream  # noqa: F401
