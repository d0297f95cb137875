from rovr_tpu.models.local_net import LocalNetUNet  # noqa: F401
from rovr_tpu.models.policy_net_1 import PolicyNet1  # noqa: F401
from rovr_tpu.models.policy_net_2 import PolicyNet2  # noqa: F401
from rovr_tpu.models.resnet import ResNet50  # noqa: F401
from rovr_tpu.models.video_processor import VideoProcessor  # noqa: F401
from rovr_tpu.models.action_lstm import ActionLSTM  # noqa: F401
