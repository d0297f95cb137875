from rovr_tpu.utils import (  # noqa: F401
    checkpoint,
    compilation_cache,
    debug,
    logging,
    profiling,
    transfer,
)
