"""Numeric guardrails — the TPU-native analog of the reference's
always-on autograd anomaly detection (reference: rovr/rovr.py:82,
`torch.autograd.set_detect_anomaly(True)` inside the rollout; SURVEY.md §5
maps it to jax debug_nans / checkify).

`enable_anomaly_detection()` flips the global nan/inf checks (expensive —
debug runs only, like the reference's flag); `checked(fn)` wraps a jittable
function with checkify so NaN/OOB errors surface as readable exceptions
without desyncing the device.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def enable_anomaly_detection(nans: bool = True, infs: bool = True) -> None:
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def disable_anomaly_detection() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap `fn` with checkify float/index/div checks. The wrapper raises on
    the first NaN / out-of-bounds / div-by-zero with a traceback into the
    jitted graph."""
    errs = checkify.float_checks | checkify.index_checks | checkify.div_checks
    cfn = checkify.checkify(fn, errors=errs)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
