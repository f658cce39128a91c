from cnn_tpu.ops.activations import relu  # noqa: F401
from cnn_tpu.ops.conv import (conv2d, conv2d_init, conv2d_s2d,  # noqa: F401
                              conv_out_size, depthwise_conv2d,
                              depthwise_conv2d_init, s2d_repack_weights,
                              space_to_depth)
from cnn_tpu.ops.linear import linear, linear_init  # noqa: F401
from cnn_tpu.ops.losses import one_hot, softmax, softmax_cross_entropy  # noqa: F401
from cnn_tpu.ops.pool import avg_pool2d, global_avg_pool, max_pool2d  # noqa: F401
from cnn_tpu.ops.batchnorm import batch_norm2d, batch_norm2d_init  # noqa: F401
from cnn_tpu.ops.dropout import channel_dropout  # noqa: F401
