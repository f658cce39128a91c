"""VGG-style model family.

The reference ships exactly one hard-coded topology ("胡乱写的一个能跑的 CNN",
architectures.h:196); this family demonstrates the framework pieces the
reference listed as future work: padded convolutions (TODO #8), average /
global pooling (TODO #7), and BN throughout — all running on the same
functional layer set, train step, checkpointing, and sharding machinery.
"""

from __future__ import annotations

from cnn_tpu.models.registry import register_model
from cnn_tpu.nn import (BatchNorm2D, Conv2D, GlobalAvgPool, Linear, MaxPool2D,
                        ReLU, Sequential)

# channels per stage; 'M' = 2x2 maxpool
CONFIGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg8": (32, "M", 64, "M", 128, 128, "M", 256, 256, "M"),
}


class VGG:
    def __init__(self, depth: str = "vgg8", num_classes: int = 3,
                 batch_norm: bool = True, image_size: int = 224):
        self.num_classes = num_classes
        self.image_size = image_size
        layers = []
        cin = 3
        conv_i = 0
        for item in CONFIGS[depth]:
            if item == "M":
                layers.append(MaxPool2D(f"pool_{conv_i}", kernel_size=2, stride=2))
                continue
            conv_i += 1
            layers.append(Conv2D(f"conv_{conv_i}", in_channels=cin,
                                 out_channels=item, kernel_size=3, stride=1,
                                 padding=1))
            if batch_norm:
                layers.append(BatchNorm2D(f"bn_{conv_i}", num_channels=item))
            layers.append(ReLU(f"relu_{conv_i}"))
            cin = item
        layers.append(GlobalAvgPool("gap"))
        layers.append(Linear("linear_1", in_features=cin,
                             out_features=num_classes))
        self.net = Sequential(layers)

    def init(self, key, dtype=None):
        import jax.numpy as jnp
        return self.net.init(key, dtype or jnp.float32)

    def apply(self, params, state, x, *, train=False, rng=None,
              compute_dtype=None, capture=()):
        return self.net.apply(params, state, x, train=train, rng=rng,
                              compute_dtype=compute_dtype, capture=capture)

    @property
    def layers(self):
        return self.net.layers


@register_model("vgg8")
def _vgg8(**kwargs):
    kwargs.pop("dropout", None)
    return VGG("vgg8", **kwargs)


@register_model("vgg11")
def _vgg11(**kwargs):
    kwargs.pop("dropout", None)
    return VGG("vgg11", **kwargs)
