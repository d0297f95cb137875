from rovr_tpu.parallel import collectives, mesh  # noqa: F401
