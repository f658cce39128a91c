"""cnn_tpu — a TPU-native (JAX/XLA/Pallas) CNN framework.

Re-implements, TPU-first, every capability of the reference C++ framework
(hermosayhl/CNN, mounted at /root/reference): tensor core, Conv2D/MaxPool2D/
ReLU/Linear/BatchNorm2D/Dropout layers with hand-verified gradient semantics,
softmax cross-entropy, SGD, dataset split/augment/loading, train/valid/test
loops with best-checkpoint tracking, binary checkpointing (including an
importer/exporter for the reference's flat ``.model`` format), a single-image
inference CLI, and Grad-CAM visualization.

Design stance (vs. reference ``cpu/include/architectures.h``): the reference's
OO mutable-layer design — cached buffers, global ``no_grad`` flag, in-layer SGD
— is replaced by idiomatic JAX: pure functions over param pytrees, explicit RNG
keys, a ``train: bool`` argument instead of global state, the optimizer as a
separate transform, and one jitted train step. Parallelism (absent in the
single-threaded reference) is introduced natively via ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # This environment's sitecustomize registers the TPU backend at
    # interpreter startup and force-sets jax_platforms="axon,cpu", silently
    # overriding the JAX_PLATFORMS env var for every child process. Re-assert
    # a CPU-forcing env var here so spawned CLIs (the test suite launches
    # `python -m cnn_tpu.tools.train` with JAX_PLATFORMS=cpu) actually run on
    # CPU — otherwise the first backend touch still initializes the TPU
    # client and can block indefinitely inside make_c_api_client when the
    # device is busy or the tunnel is down.
    import jax as _jax

    if _jax.config.jax_platforms != "cpu":
        _jax.config.update("jax_platforms", "cpu")

from cnn_tpu.core.config import DataConfig, ModelConfig, TrainConfig  # noqa: F401
