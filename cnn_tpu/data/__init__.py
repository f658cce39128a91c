from cnn_tpu.data.dataset import discover_dataset, split_dataset  # noqa: F401
from cnn_tpu.data.augment import ImageAugmentor  # noqa: F401
from cnn_tpu.data.loader import DataLoader  # noqa: F401
