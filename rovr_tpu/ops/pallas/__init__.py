from rovr_tpu.ops.pallas import attention, conv  # noqa: F401
