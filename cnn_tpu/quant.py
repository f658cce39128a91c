"""Post-training quantization for serving: BN folding + int8 on the MXU.

Two TPU-native serving transforms the reference has no equivalent of
(its inference binary replays the full f32 training graph per image,
inference.cpp:53-72):

1. **BatchNorm folding** — at inference BN is an affine map with frozen
   moving stats, so it folds into the preceding conv's weights/bias:
   ``w' = w * g/sqrt(v+eps)``, ``b' = (b - m) * g/sqrt(v+eps) + beta``.
   The served graph loses every BN op with bit-level-explainable (float
   re-association only) logits.

2. **Int8 quantization** — the MXU multiplies s8 x s8 -> s32 natively at
   2x the bf16 rate. Weights quantize per-output-channel symmetric
   (absmax / 127); activations per-layer symmetric with scales calibrated
   from a batch of real images (absmax over the calibration set). Convs
   and the dense head run as integer ops with f32 rescale + bias epilogues
   (XLA fuses those into the conv); ReLU/pool stay in f32 on the VPU where
   they are free.

Scope: every committed model family — flat Sequential (AlexNet/VGG),
residual blocks with projection shortcuts (ResNet), scanned trunks
(pipecnn), and depthwise-separable stacks (MobileNet: dw->BN folds like
conv->BN since the bank's last axis is its out channels, and dw banks
quantize per-output-channel with grouped s8 x s8 -> s32); MoE heads keep
their f32 expert bank. The quality bar is
task-level: on the reference's own headline checkpoint the int8 path must
keep classification agreement on the oracle images (tested) — per-logit
deviation is bounded by calibration, not by epsilon.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cnn_tpu.nn.module import (BatchNorm2D, Conv2D, DepthwiseConv2D, Linear,
                               ResidualBlock, StackedBlocks)
from cnn_tpu.nn.sequential import Sequential


class FoldedModel(NamedTuple):
    """A model-shaped (net/image_size/num_classes) view over folded layers."""
    net: Sequential
    image_size: int
    num_classes: int

    def apply(self, params, state, x, *, train=False, rng=None,
              compute_dtype=None, capture=()):
        return self.net.apply(params, state, x, train=train, rng=rng,
                              compute_dtype=compute_dtype, capture=capture)

    def init(self, key, dtype=None):
        return self.net.init(key, dtype or jnp.float32)


def _fold_conv_bn(conv_p, bn_p, bn_s, eps):
    """The folding algebra. Broadcasting handles stacked ``[L, ...]``
    leaves (scanned trunks) and plain leaves alike."""
    inv = bn_p["gamma"] / jnp.sqrt(bn_s["var"] + eps)
    return {"w": conv_p["w"] * inv[..., None, None, None, :],
            "b": (conv_p["b"] - bn_s["mean"]) * inv + bn_p["beta"]}


def _fold_layer_list(layers, params, state):
    """Fold (Depthwise)Conv2D->BatchNorm2D pairs in a flat layer list.

    The folding algebra is out-channel-wise, and a depthwise bank's last
    axis IS its out channels (``[k, k, 1, C*mult]``, ops/conv.py), so the
    same ``_fold_conv_bn`` broadcast covers both conv kinds — MobileNet's
    dw->BN->ReLU->pw->BN->ReLU chain folds to dw->ReLU->pw->ReLU
    (VERDICT r4 item 2)."""
    new_layers, new_params = [], {}
    i = 0
    while i < len(layers):
        layer = layers[i]
        nxt = layers[i + 1] if i + 1 < len(layers) else None
        if (isinstance(layer, (Conv2D, DepthwiseConv2D))
                and isinstance(nxt, BatchNorm2D)):
            new_params[layer.name] = _fold_conv_bn(
                params[layer.name], params[nxt.name], state[nxt.name],
                nxt.eps)
            new_layers.append(layer)
            i += 2
            continue
        if isinstance(layer, ResidualBlock):
            # fold Conv->BN pairs inside the body; the projection shortcut
            # is a bare conv (resnet.py:_block — no BN follows it) and
            # passes through unchanged
            bp, bs = params[layer.name], (state or {}).get(layer.name) or {}
            body_layers, body_params = _fold_layer_list(
                list(layer.body.layers), bp["body"], bs.get("body") or {})
            folded = ResidualBlock(layer.name, body=Sequential(body_layers),
                                   proj=layer.proj)
            new_params[layer.name] = {"body": body_params}
            if layer.proj is not None:
                new_params[layer.name]["proj"] = bp["proj"]
            new_layers.append(folded)
            i += 1
            continue
        if isinstance(layer, StackedBlocks):
            if layer.block.proj is not None:
                raise ValueError("projection shortcuts not supported")
            bp = params[layer.name]["body"]
            bs = (state.get(layer.name) or {}).get("body", {})
            body_layers, body_params = _fold_layer_list(
                list(layer.block.body.layers), bp, bs)
            # the quantized trunk paths apply body layers with params=None
            # except convs — anything parameterized-but-not-conv would
            # silently lose its params there
            bad = [l.name for l in body_layers
                   if l.has_params and not isinstance(l, Conv2D)]
            if bad:
                raise ValueError(f"unsupported parameterized body layers "
                                 f"in quantized trunk: {bad}")
            folded_block = ResidualBlock(layer.block.name,
                                         body=Sequential(body_layers))
            new_layers.append(StackedBlocks(layer.name, block=folded_block,
                                            n_blocks=layer.n_blocks,
                                            remat=layer.remat))
            new_params[layer.name] = {"body": body_params}
            i += 1
            continue
        if layer.has_state and getattr(layer, "state_eval_inert", False):
            # monitoring-only state (e.g. MoEBlock's expert-load fractions)
            # is never read by the forward pass — keep the layer, drop the
            # state; its params (the f32 expert bank) pass through below
            new_params[layer.name] = params[layer.name]
            new_layers.append(layer)
            i += 1
            continue
        if layer.has_state:
            raise ValueError(
                f"cannot fold stateful layer {layer.name} "
                f"({type(layer).__name__}) — only Conv2D->BatchNorm2D pairs")
        if layer.has_params:
            new_params[layer.name] = params[layer.name]
        new_layers.append(layer)
        i += 1
    return new_layers, new_params


def fold_batchnorm(model, params, state):
    """Fold every Conv2D -> BatchNorm2D pair (including inside scanned
    residual trunks); drop the BN layers.

    Returns ``(folded_model, folded_params)``; the folded model has empty
    state (eval-only). Layers other than folded-away BNs keep their names,
    so checkpoint tooling and Grad-CAM capture still address them.
    """
    new_layers, new_params = _fold_layer_list(
        list(model.net.layers), params, state or {})
    return (FoldedModel(Sequential(new_layers), model.image_size,
                        model.num_classes), new_params)


def _quantize_weight(w: jnp.ndarray, axis: int):
    """Symmetric per-output-channel int8: returns (q_w, scale[out])."""
    reduce_axes = tuple(a for a in range(w.ndim) if a != axis)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    shape = [1] * w.ndim
    shape[axis] = -1
    q = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127)
    return q.astype(jnp.int8), scale


def _scale_of(x):
    """absmax/127 as a DEVICE scalar: calibration never blocks on a host
    fetch (each would be a ~30 ms tunnel RPC, one per conv/linear — the
    cost _trunk_calibrate's batching already avoids); the scalars ride
    inside qparams as in_scale leaves."""
    return jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0,
                       1e-12)


def _trunk_calibrate(trunk: StackedBlocks, tparams, h):
    """Unroll the (folded, BN-free) trunk over a calibration batch to get a
    per-block input scale for every conv: ``{conv_name: [L]}``. Scales stay
    device scalars until the final stack — no per-block host fetch (each
    blocking fetch costs a ~30 ms tunnel RPC on the real chip)."""
    body = trunk.block.body.layers
    scales = {l.name: [] for l in body if isinstance(l, Conv2D)}
    for i in range(trunk.n_blocks):
        p_i = jax.tree.map(lambda a: a[i], tparams["body"])
        x = h
        for l in body:
            if isinstance(l, Conv2D):
                scales[l.name].append(jnp.max(jnp.abs(x)) / 127.0)
            x, _ = l.apply(p_i.get(l.name), None, x, train=False)
        h = ResidualBlock.combine(x, h)
    return {k: jnp.maximum(jnp.stack(v).astype(jnp.float32), 1e-12)
            for k, v in scales.items()}


def _block_calibrate(block: ResidualBlock, bparams, x):
    """Per-conv input scales inside a (folded, BN-free) residual block:
    walk the body on the calibration activations; the projection shortcut
    sees the block input."""
    scales, h = {}, x
    for l in block.body.layers:
        if isinstance(l, Conv2D):
            scales[l.name] = _scale_of(h)
        h, _ = l.apply(bparams["body"][l.name] if l.has_params else None,
                       None, h, train=False)
    if block.proj is not None:
        scales[block.proj.name] = _scale_of(x)
    return scales


def calibrate_activation_scales(model, params, state, images_u8) -> dict:
    """Per-layer input absmax/127 over a calibration batch.

    The input of layer i is the output of layer i-1 (layer 0 sees the
    /255-normalized image), so one captured forward provides every scale;
    scanned trunks are unrolled to give each block its own scales.
    """
    net = model.net
    names = [l.name for l in net.layers]
    x = jnp.asarray(images_u8).astype(jnp.float32) / 255.0
    _, _, acts = net.apply(params, state, x, train=False, capture=names)
    scales, prev = {}, x
    for layer in net.layers:
        if isinstance(layer, (Conv2D, DepthwiseConv2D, Linear)):
            scales[layer.name] = _scale_of(prev)
        elif isinstance(layer, StackedBlocks):
            scales[layer.name] = _trunk_calibrate(layer, params[layer.name],
                                                  prev)
        elif isinstance(layer, ResidualBlock):
            scales[layer.name] = _block_calibrate(layer, params[layer.name],
                                                  prev)
        prev = acts[layer.name]
    return scales


def _quantize_weight_stacked(w: jnp.ndarray):
    """Per-(block, output-channel) symmetric int8 for ``[L, ..., out]``."""
    axes = tuple(range(1, w.ndim - 1))
    absmax = jnp.max(jnp.abs(w), axis=axes)              # [L, out]
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    shape = (w.shape[0],) + (1,) * (w.ndim - 2) + (w.shape[-1],)
    q = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_int8(model, params, state, calib_images_u8):
    """-> (folded_model, qparams): int8 weights + scales for every matmul
    layer (including scanned-trunk convs, per block); non-matmul layers
    keep their f32 params."""
    folded, fparams = fold_batchnorm(model, params, state)
    act_scales = calibrate_activation_scales(
        folded, fparams, {}, calib_images_u8)
    qparams = {}
    for layer in folded.net.layers:
        if isinstance(layer, (Conv2D, DepthwiseConv2D)):
            # per-output-channel scales cover depthwise banks for free:
            # their groups ARE the output channels (w [k, k, 1, C*mult])
            q, s = _quantize_weight(fparams[layer.name]["w"], axis=3)
            qparams[layer.name] = {"w_q": q, "w_scale": s,
                                   "b": fparams[layer.name]["b"],
                                   "in_scale": jnp.float32(
                                       act_scales[layer.name])}
        elif isinstance(layer, Linear):
            q, s = _quantize_weight(fparams[layer.name]["w"], axis=1)
            qparams[layer.name] = {"w_q": q, "w_scale": s,
                                   "b": fparams[layer.name]["b"],
                                   "in_scale": jnp.float32(
                                       act_scales[layer.name])}
        elif isinstance(layer, ResidualBlock):
            bp = fparams[layer.name]
            blk_scales = act_scales[layer.name]
            blk_q = {"body": {}}
            for l in layer.body.layers:
                if isinstance(l, Conv2D):
                    q, s = _quantize_weight(bp["body"][l.name]["w"], axis=3)
                    blk_q["body"][l.name] = {
                        "w_q": q, "w_scale": s, "b": bp["body"][l.name]["b"],
                        "in_scale": jnp.float32(blk_scales[l.name])}
                elif l.has_params:
                    blk_q["body"][l.name] = bp["body"][l.name]
            if layer.proj is not None:
                q, s = _quantize_weight(bp["proj"]["w"], axis=3)
                blk_q["proj"] = {
                    "w_q": q, "w_scale": s, "b": bp["proj"]["b"],
                    "in_scale": jnp.float32(blk_scales[layer.proj.name])}
            qparams[layer.name] = blk_q
        elif isinstance(layer, StackedBlocks):
            body_p = fparams[layer.name]["body"]
            trunk_q = {}
            for blk_layer in layer.block.body.layers:
                if not isinstance(blk_layer, Conv2D):
                    continue
                q, s = _quantize_weight_stacked(body_p[blk_layer.name]["w"])
                trunk_q[blk_layer.name] = {
                    "w_q": q, "w_scale": s,
                    "b": body_p[blk_layer.name]["b"],
                    "in_scale": act_scales[layer.name][blk_layer.name]}
            qparams[layer.name] = trunk_q
        elif layer.has_params:
            qparams[layer.name] = fparams[layer.name]
    return folded, qparams


def _q_act(x, in_scale):
    return jnp.clip(jnp.round(x / in_scale), -127, 127).astype(jnp.int8)


def _q_conv(layer, p: dict, x: jnp.ndarray):
    """Int8 conv, dense or depthwise: ``feature_group_count=C`` routes a
    DepthwiseConv2D's bank exactly as its f32 op does (ops/conv.py) —
    s8 x s8 -> s32 accumulation either way."""
    from jax import lax
    qx = _q_act(x, p["in_scale"])
    pad = [(layer.padding, layer.padding)] * 2
    groups = x.shape[-1] if isinstance(layer, DepthwiseConv2D) else 1
    acc = lax.conv_general_dilated(
        qx, p["w_q"], (layer.stride, layer.stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (p["in_scale"] * p["w_scale"]) + p["b"]


def quantized_apply(folded: FoldedModel, qparams: dict, x: jnp.ndarray):
    """Int8 forward: every conv/dense is s8 x s8 -> s32 on the MXU with an
    f32 dequant+bias epilogue; everything else runs f32 on the VPU.
    Scanned trunks stay scanned — per-block int8 weights/scales ride the
    scan as xs."""
    from jax import lax

    for layer in folded.net.layers:
        if isinstance(layer, (Conv2D, DepthwiseConv2D)):
            x = _q_conv(layer, qparams[layer.name], x)
        elif isinstance(layer, ResidualBlock):
            p = qparams[layer.name]
            h = x
            for l in layer.body.layers:
                if isinstance(l, Conv2D):
                    h = _q_conv(l, p["body"][l.name], h)
                else:
                    h, _ = l.apply(p["body"].get(l.name), None, h,
                                   train=False)
            sc = (_q_conv(layer.proj, p["proj"], x)
                  if layer.proj is not None else x)
            x = ResidualBlock.combine(h, sc)
        elif isinstance(layer, StackedBlocks):
            body = layer.block.body.layers

            def blk(h, inp):
                y = h
                for l in body:
                    if isinstance(l, Conv2D):
                        y = _q_conv(l, inp[l.name], y)
                    else:
                        y, _ = l.apply(None, None, y, train=False)
                return ResidualBlock.combine(y, h), None

            x, _ = lax.scan(blk, x, qparams[layer.name])
        elif isinstance(layer, Linear):
            p = qparams[layer.name]
            if x.ndim > 2:          # ops.linear flattens trailing dims
                x = x.reshape(x.shape[0], -1)
            qx = _q_act(x, p["in_scale"])
            acc = lax.dot_general(
                qx, p["w_q"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = acc.astype(jnp.float32) * (p["in_scale"] * p["w_scale"]) \
                + p["b"]
        else:
            x, _ = layer.apply(qparams.get(layer.name), None, x, train=False)
    return x


def make_int8_forward(model, params, state, calib_images_u8):
    """Jitted uint8 -> softmax probs through the folded int8 graph."""
    folded, qparams = quantize_int8(model, params, state, calib_images_u8)

    # weights enter as jit ARGUMENTS, never closure captures — captured
    # arrays constant-fold into the HLO (CLAUDE.md hazard)
    @jax.jit
    def forward(qp, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        logits = quantized_apply(folded, qp, x)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    qparams = jax.device_put(qparams)
    return lambda images_u8: forward(qparams, images_u8)
