from rovr_tpu.ops import metrics, ppo, rewards  # noqa: F401
