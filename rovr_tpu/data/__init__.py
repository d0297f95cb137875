from rovr_tpu.data import corruption, teacher, synthetic  # noqa: F401
