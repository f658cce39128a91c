"""MobileNet-style family: depthwise-separable convolutions.

Seventh model family. Each 3x3 dense conv of the VGG/AlexNet style is
replaced by a depthwise 3x3 (per-channel, ``feature_group_count=C``) plus a
pointwise 1x1 — the MobileNet-v1 factorization. The reference has no grouped
convolutions at all (its Conv2D is dense over input channels,
``cpu/src/conv2d.cpp:69-92``), so this family is a pure framework superset;
it exists to exercise the depthwise op end-to-end (train step, BN, sharding,
checkpointing, CLIs) and because its TPU cost profile is the instructive
opposite of the deep residual trunk: the depthwise half is VPU/bandwidth
bound (no MXU reuse), the pointwise half is pure MXU.
"""

from __future__ import annotations

from cnn_tpu.models.registry import register_model
from cnn_tpu.nn import (BatchNorm2D, Conv2D, DepthwiseConv2D, GlobalAvgPool,
                        Linear, ReLU, Sequential)

# (out_channels, stride of the depthwise conv) per separable block
CONFIGS = {
    # scaled for the 3k-image animal dataset; ~0.2 M params at width 1.0
    "mobilenet": ((64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2)),
}


class MobileNet:
    def __init__(self, depth: str = "mobilenet", num_classes: int = 3,
                 batch_norm: bool = True, image_size: int = 224,
                 width: float = 1.0):
        self.num_classes = num_classes
        self.image_size = image_size

        def c(ch: int) -> int:
            return max(8, int(ch * width))

        stem = c(32)
        layers = [Conv2D("conv_stem", in_channels=3, out_channels=stem,
                         kernel_size=3, stride=2, padding=1)]
        if batch_norm:
            layers.append(BatchNorm2D("bn_stem", num_channels=stem))
        layers.append(ReLU("relu_stem"))

        cin = stem
        for i, (cout, stride) in enumerate(CONFIGS[depth], start=1):
            cout = c(cout)
            layers.append(DepthwiseConv2D(f"dw_{i}", channels=cin,
                                          kernel_size=3, stride=stride,
                                          padding=1))
            if batch_norm:
                layers.append(BatchNorm2D(f"bn_dw_{i}", num_channels=cin))
            layers.append(ReLU(f"relu_dw_{i}"))
            layers.append(Conv2D(f"pw_{i}", in_channels=cin,
                                 out_channels=cout, kernel_size=1, stride=1))
            if batch_norm:
                layers.append(BatchNorm2D(f"bn_pw_{i}", num_channels=cout))
            layers.append(ReLU(f"relu_pw_{i}"))
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


@register_model("mobilenet")
def _mobilenet(**kwargs) -> MobileNet:
    kwargs.pop("dropout", None)
    return MobileNet("mobilenet", **kwargs)
