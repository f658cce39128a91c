"""The reference's AlexNet-ish 4-conv classifier, TPU-native.

Topology (reference ctor ``alexnet.cpp:10-33``; shape comments there):
    input  B x 224 x 224 x 3        (we run NHWC; reference is CHW)
    conv1  3->16  k3 s2   -> 111    [+ BN] + ReLU
    maxpool k2 s2         -> 55
    conv2  16->32 k3 s2   -> 27     [+ BN] + ReLU
    conv3  32->64 k3 s2   -> 13     [+ BN] + ReLU
    conv4  64->128 k3 s2  -> 6      [+ BN] [+ Dropout] + ReLU
    linear 6*6*128=4608 -> num_classes

Dropout sits where the reference's commented-out layer was (alexnet.cpp:28).
Grad-CAM (reference ``AlexNet::grad_cam``, alexnet.cpp:95-142) is in
``cnn_tpu/tools/gradcam.py`` via ``jax.vjp`` + activation capture.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cnn_tpu.nn import (BatchNorm2D, Conv2D, Dropout, Linear, MaxPool2D,
                        ReLU, Sequential)
from cnn_tpu.models.registry import register_model

# feature extent after the conv stack at 224x224 input (224->111->55->27->13->6)
FINAL_SPATIAL = 6
FINAL_CHANNELS = 128


def build_alexnet(num_classes: int = 3, batch_norm: bool = False,
                  dropout: float = 0.0, image_size: int = 224,
                  compat_bn: bool = False,
                  dropout_compat: str = "inverted",
                  space_to_depth: bool = False) -> Sequential:
    layers = []
    convs = [(3, 16), (16, 32), (32, 64), (64, 128)]
    spatial = image_size
    channels = 3
    for i, (cin, cout) in enumerate(convs, start=1):
        # s2d execution lifts cin -> 4*cin MXU input lanes; past 32 real
        # channels (128 lanes) the systolic array is already full, so only
        # the lane-starved convs repack
        layers.append(Conv2D(f"conv_layer_{i}", in_channels=cin, out_channels=cout,
                             kernel_size=3, stride=2,
                             s2d=space_to_depth and cin < 32))
        spatial = (spatial - 3) // 2 + 1
        assert spatial >= 1, (
            f"image_size={image_size} collapses to zero spatial extent at "
            f"conv_layer_{i} (the 4-conv stride-2 stack needs >= 61 px; the "
            "reference uses 224)")
        channels = cout
        if batch_norm:
            layers.append(BatchNorm2D(f"bn_layer_{i}", num_channels=cout,
                                      compat_zero_var_init=compat_bn))
        if i == 4 and dropout > 0.0:
            layers.append(Dropout("dropout_layer_1", p=dropout, compat=dropout_compat))
        layers.append(ReLU(f"relu_layer_{i}"))
        if i == 1:
            layers.append(MaxPool2D("max_pool_1", kernel_size=2, stride=2))
            spatial = (spatial - 2) // 2 + 1
    layers.append(Linear("linear_1", in_features=spatial * spatial * channels,
                         out_features=num_classes))
    return Sequential(layers)


class AlexNet:
    """Convenience wrapper bundling the Sequential with init/apply.

    Mirrors the reference's public surface (``architectures.h:196-215``):
    forward == ``apply``; save/load live in ``cnn_tpu/utils/checkpoint.py``;
    backward/update_gradients are replaced by ``jax.grad`` + the optimizer.
    """

    def __init__(self, num_classes: int = 3, batch_norm: bool = False,
                 dropout: float = 0.0, image_size: int = 224,
                 compat_bn: bool = False, dropout_compat: str = "inverted",
                 space_to_depth: bool = False):
        self.num_classes = num_classes
        self.batch_norm = batch_norm
        self.image_size = image_size
        self.net = build_alexnet(num_classes, batch_norm, dropout, image_size,
                                 compat_bn, dropout_compat, space_to_depth)

    def init(self, key: jax.Array, dtype=jnp.float32):
        return self.net.init(key, dtype)

    def apply(self, params, state, x, *, train: bool = False,
              rng: Optional[jax.Array] = None, compute_dtype=None, capture=()):
        return self.net.apply(params, state, x, train=train, rng=rng,
                              compute_dtype=compute_dtype, capture=capture)

    @property
    def layers(self):
        return self.net.layers


@register_model("alexnet")
def _alexnet(**kwargs) -> AlexNet:
    return AlexNet(**kwargs)
