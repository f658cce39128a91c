"""Analytic MXU FLOP counts from layer shapes (for MFU reporting).

Per conv: forward = 2*Ho*Wo*k^2*Cin*Cout MACs-as-FLOPs; the backward pass
adds dW (same count) and dx (same count, skipped for the model's first
parameterized layer, whose input gradient is never needed). Dense layers
analogous. Elementwise ops (ReLU/BN/pool/loss) are excluded: they are
>100x smaller and run on the VPU, not the MXU.

Recurses through composite layers (ResidualBlock) and scanned stacks
(StackedBlocks), which bench.py's original flat walk could not count.
"""

from __future__ import annotations

from cnn_tpu.nn.module import (Conv2D, DepthwiseConv2D, Linear,
                               ResidualBlock, StackedBlocks)


def _walk(layers, shape, total_fwd, total_train, first):
    for layer in layers:
        if isinstance(layer, DepthwiseConv2D):
            # grouped-conv MACs (each output channel reads ONE input
            # channel): these are conv MACs, not excluded VPU elementwise —
            # omitting them under-reports mobilenet FLOPs/MFU (r3 advisor)
            ho, wo, _ = layer.out_shape(shape)
            f = 2.0 * ho * wo * layer.kernel_size ** 2 * layer.out_channels
            total_fwd += f
            total_train += f * (2.0 if first else 3.0)
            first = False
        elif isinstance(layer, Conv2D):
            ho, wo, _ = layer.out_shape(shape)
            f = 2.0 * ho * wo * layer.kernel_size ** 2 \
                * layer.in_channels * layer.out_channels
            total_fwd += f
            total_train += f * (2.0 if first else 3.0)
            first = False
        elif isinstance(layer, Linear):
            f = 2.0 * layer.in_features * layer.out_features
            total_fwd += f
            total_train += f * (2.0 if first else 3.0)
            first = False
        elif isinstance(layer, ResidualBlock):
            total_fwd, total_train, first, _ = _walk(
                layer.body.layers, shape, total_fwd, total_train, first)
            if layer.proj is not None:  # proj consumes the block INPUT shape
                total_fwd, total_train, first, _ = _walk(
                    [layer.proj], shape, total_fwd, total_train, first)
        elif isinstance(layer, StackedBlocks):
            for _ in range(layer.n_blocks):
                total_fwd, total_train, first, _ = _walk(
                    [layer.block], shape, total_fwd, total_train, first)
        shape = layer.out_shape(shape)
    return total_fwd, total_train, first, shape


def forward_flops_per_image(model) -> float:
    s = model.image_size
    fwd, _, _, _ = _walk(model.net.layers, (s, s, 3), 0.0, 0.0, True)
    return fwd


def train_flops_per_image(model) -> float:
    s = model.image_size
    _, train, _, _ = _walk(model.net.layers, (s, s, 3), 0.0, 0.0, True)
    return train
