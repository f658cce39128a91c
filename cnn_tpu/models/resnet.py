"""ResNet-style model family (residual blocks + padded convs + BN).

Third model family, past the reference's single hard-coded topology: the
reference lists "better architectures" (cnn.cpp:21 TODO #5) and "conv
padding" (TODO #8) as future work; residual networks are the canonical
answer and exercise composite layers (``nn.module.ResidualBlock``) that a
flat layer list cannot express. Everything else — train step, sharding,
checkpointing, Grad-CAM capture — is the same machinery AlexNet/VGG use.
"""

from __future__ import annotations

from cnn_tpu.models.registry import register_model
from cnn_tpu.nn import (BatchNorm2D, Conv2D, GlobalAvgPool, Linear, ReLU,
                        ResidualBlock, Sequential)

# (channels, stride) per block; stride-2 blocks halve the spatial extent
CONFIGS = {
    "resnet10": ((16, 1), (32, 2), (64, 2), (128, 2)),
    "resnet18": ((32, 1), (32, 1), (64, 2), (64, 1),
                 (128, 2), (128, 1), (256, 2), (256, 1)),
}


def _block(name: str, cin: int, cout: int, stride: int) -> ResidualBlock:
    body = Sequential([
        Conv2D(f"{name}_conv1", in_channels=cin, out_channels=cout,
               kernel_size=3, stride=stride, padding=1),
        BatchNorm2D(f"{name}_bn1", num_channels=cout),
        ReLU(f"{name}_relu"),
        Conv2D(f"{name}_conv2", in_channels=cout, out_channels=cout,
               kernel_size=3, stride=1, padding=1),
        BatchNorm2D(f"{name}_bn2", num_channels=cout),
    ])
    proj = None
    if stride != 1 or cin != cout:
        proj = Conv2D(f"{name}_proj", in_channels=cin, out_channels=cout,
                      kernel_size=1, stride=stride, padding=0)
    return ResidualBlock(name, body=body, proj=proj)


class ResNet:
    def __init__(self, depth: str = "resnet10", num_classes: int = 3,
                 batch_norm: bool = True, image_size: int = 224):
        del batch_norm  # BN is intrinsic to the family
        self.num_classes = num_classes
        self.image_size = image_size
        cfg = CONFIGS[depth]
        cin = cfg[0][0]
        layers = [
            Conv2D("stem_conv", in_channels=3, out_channels=cin,
                   kernel_size=3, stride=2, padding=1),
            BatchNorm2D("stem_bn", num_channels=cin),
            ReLU("stem_relu"),
        ]
        for i, (cout, stride) in enumerate(cfg, 1):
            layers.append(_block(f"block_{i}", cin, cout, stride))
            cin = cout
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


@register_model("resnet10")
def _resnet10(**kwargs) -> ResNet:
    kwargs.pop("dropout", None)
    return ResNet("resnet10", **kwargs)


@register_model("resnet18")
def _resnet18(**kwargs) -> ResNet:
    kwargs.pop("dropout", None)
    return ResNet("resnet18", **kwargs)
