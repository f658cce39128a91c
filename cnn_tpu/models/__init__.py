from cnn_tpu.models.alexnet import AlexNet, build_alexnet  # noqa: F401
from cnn_tpu.models.registry import get_model, register_model  # noqa: F401
from cnn_tpu.models.vgg import VGG  # noqa: F401
from cnn_tpu.models.resnet import ResNet  # noqa: F401
from cnn_tpu.models.pipecnn import PipeCNN  # noqa: F401
from cnn_tpu.models.moecnn import MoECNN  # noqa: F401
from cnn_tpu.models.mobilenet import MobileNet  # noqa: F401
