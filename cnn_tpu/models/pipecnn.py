"""PipeCNN — a deep residual trunk of identical blocks, built to scale.

Fourth model family. The reference's model is a fixed 6-layer chain
(alexnet.cpp:10-33) whose depth is a hard-coded list; its TODO #5
("better architectures", cnn.cpp:21) is the scaling direction. PipeCNN is
the TPU answer to depth: a stem that downsamples once, then ``n_blocks``
structurally identical residual blocks expressed as ONE
``nn.StackedBlocks`` (scan-over-layers — compile time and HLO size stay
constant as depth grows), then a GAP+Linear head.

The stacked trunk's leading ``[L]`` axis is the pipeline-parallel axis:
``parallel/pipeline.py`` shards it over a 'stage' mesh and runs a GPipe
microbatch schedule, so the same model definition trains single-chip
(scan) or across a pod slice (pipeline) with no code change.
"""

from __future__ import annotations

import jax.numpy as jnp

from cnn_tpu.models.registry import register_model
from cnn_tpu.nn import (BatchNorm2D, Conv2D, GlobalAvgPool, Linear, ReLU,
                        Sequential)
from cnn_tpu.nn.module import ResidualBlock, StackedBlocks


def _trunk_block(width: int, batch_norm: bool,
                 dropout: float = 0.0) -> ResidualBlock:
    # Without BN, a residual trunk at the reference's N(0,1)/10 init has a
    # per-block gain of sqrt(1 + body_var) > 1 that compounds exponentially
    # in depth (overflows bf16 within the first steps at width 64 — seen in
    # practice). Fixup-style fix: ZERO-init the body's last conv, making
    # the trunk the identity at init — stable at any depth; gradients reach
    # the zero conv through the residual path, so it trains normally.
    last_scale = 0.1 if batch_norm else 0.0
    layers = [Conv2D("b_conv1", in_channels=width, out_channels=width,
                     kernel_size=3, stride=1, padding=1)]
    if batch_norm:
        layers.append(BatchNorm2D("b_bn1", num_channels=width))
    layers.append(ReLU("b_relu"))
    if dropout > 0.0:
        # channel dropout inside the pipelined trunk: per-block keys come
        # from the StackedBlocks split (or the pipeline's per-stage slice
        # of it — parallel/pipeline.py), so scan and GPipe schedules draw
        # identical masks
        from cnn_tpu.nn import Dropout
        layers.append(Dropout("b_dropout", p=dropout))
    layers.append(Conv2D("b_conv2", in_channels=width, out_channels=width,
                         kernel_size=3, stride=1, padding=1,
                         init_scale=last_scale))
    if batch_norm:
        layers.append(BatchNorm2D("b_bn2", num_channels=width))
    return ResidualBlock("block", body=Sequential(layers))


class PipeCNN:
    def __init__(self, num_classes: int = 3, width: int = 64,
                 n_blocks: int = 8, image_size: int = 224,
                 batch_norm: bool = True, remat="conv",
                 dropout: float = 0.0):
        self.num_classes = num_classes
        self.image_size = image_size
        self.width = width
        self.n_blocks = n_blocks
        stem = [
            Conv2D("stem_conv1", in_channels=3, out_channels=width,
                   kernel_size=3, stride=2, padding=1),
        ]
        if batch_norm:
            stem.append(BatchNorm2D("stem_bn1", num_channels=width))
        stem += [
            ReLU("stem_relu1"),
            Conv2D("stem_conv2", in_channels=width, out_channels=width,
                   kernel_size=3, stride=2, padding=1),
        ]
        if batch_norm:
            stem.append(BatchNorm2D("stem_bn2", num_channels=width))
        stem.append(ReLU("stem_relu2"))
        trunk = StackedBlocks("trunk",
                              block=_trunk_block(width, batch_norm, dropout),
                              n_blocks=n_blocks, remat=remat)
        head = [GlobalAvgPool("gap"),
                Linear("linear_1", in_features=width,
                       out_features=num_classes)]
        self.net = Sequential(stem + [trunk] + head)

    def init(self, key, dtype=None):
        return self.net.init(key, dtype or jnp.float32)

    def apply(self, params, state, x, *, train=False, rng=None,
              compute_dtype=None, capture=()):
        return self.net.apply(params, state, x, train=train, rng=rng,
                              compute_dtype=compute_dtype, capture=capture)

    @property
    def layers(self):
        return self.net.layers


@register_model("pipecnn")
def _pipecnn(**kwargs) -> PipeCNN:
    return PipeCNN(**kwargs)
