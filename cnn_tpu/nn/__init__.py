from cnn_tpu.nn.module import (  # noqa: F401
    BatchNorm2D,
    Conv2D,
    Dropout,
    Flatten,
    Layer,
    Linear,
    MaxPool2D,
    ReLU,
)
from cnn_tpu.nn.sequential import Sequential  # noqa: F401
