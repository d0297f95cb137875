from rovr_tpu.parallel import collectives, mesh, ring_attention, tp  # noqa: F401
