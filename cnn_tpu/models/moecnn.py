"""MoECNN — conv stem + GAP + Switch-style MoE FFN + linear head.

Fifth model family: demonstrates expert parallelism (the 'ep' axis of the
standard TPU parallelism toolbox) on top of the same machinery every other
family uses. The conv stem downsamples to a [B, D] feature vector; the
``nn.moe.MoEBlock`` grows parameter count E-fold at constant per-image
FLOPs; experts shard over a mesh's 'expert' axis (see
``MoEBlock.param_pspecs_ep`` and ``parallel.train_step.model_pspecs``).
"""

from __future__ import annotations

import jax.numpy as jnp

from cnn_tpu.models.registry import register_model
from cnn_tpu.nn import (BatchNorm2D, Conv2D, GlobalAvgPool, Linear, ReLU,
                        Sequential)
from cnn_tpu.nn.moe import MoEBlock


class MoECNN:
    def __init__(self, num_classes: int = 3, width: int = 64,
                 n_experts: int = 8, expert_hidden: int = 256,
                 image_size: int = 224, batch_norm: bool = True,
                 capacity_factor: float = 2.0, balance_coeff: float = 0.0):
        self.num_classes = num_classes
        self.image_size = image_size
        layers = []
        cin = 3
        for i, stride in enumerate((2, 2, 2, 2), 1):
            layers.append(Conv2D(f"stem_conv{i}", in_channels=cin,
                                 out_channels=width, kernel_size=3,
                                 stride=stride, padding=1))
            if batch_norm:
                layers.append(BatchNorm2D(f"stem_bn{i}", num_channels=width))
            layers.append(ReLU(f"stem_relu{i}"))
            cin = width
        layers += [
            GlobalAvgPool("gap"),
            MoEBlock("moe", dim=width, hidden=expert_hidden,
                     n_experts=n_experts, capacity_factor=capacity_factor,
                     balance_coeff=balance_coeff),
            Linear("linear_1", in_features=width, out_features=num_classes),
        ]
        self.net = Sequential(layers)

    def init(self, key, dtype=None):
        return self.net.init(key, dtype or jnp.float32)

    def apply(self, params, state, x, *, train=False, rng=None,
              compute_dtype=None, capture=()):
        return self.net.apply(params, state, x, train=train, rng=rng,
                              compute_dtype=compute_dtype, capture=capture)

    @property
    def layers(self):
        return self.net.layers


@register_model("moecnn")
def _moecnn(**kwargs) -> MoECNN:
    kwargs.pop("dropout", None)
    return MoECNN(**kwargs)
