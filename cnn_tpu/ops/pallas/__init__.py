"""Pallas TPU kernels for the hot ops, with XLA fallbacks.

Each kernel has an XLA twin in ``cnn_tpu/ops``; ``bench_kernels.py`` (repo
tools) compares them on real hardware and the defaults follow the results.
"""

from cnn_tpu.ops.pallas.normalize import uint8_normalize_pallas  # noqa: F401
from cnn_tpu.ops.pallas.pool import max_pool2d_pallas  # noqa: F401
from cnn_tpu.ops.pallas.conv import conv2d_bias_relu_pallas  # noqa: F401
