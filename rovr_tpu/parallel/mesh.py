"""Device-mesh construction + sharding rules.

The reference has NO distributed layer at all (SURVEY.md §2.14: BATCH_SIZE=1,
no torch.distributed import anywhere; device placement is ad-hoc .to(device)
with hardcoded .cuda(), rovr/rovr.py:342). Here scale-out is first-class:
a named `jax.sharding.Mesh` over the v5e slice, clip-batch sharding on the
`data` axis, replicated parameters, and XLA collectives over ICI.

All helpers are host-count agnostic — tests run them on a forced 8-device
CPU mesh (tests/conftest.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rovr_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis.

    Single-process only: multi-host (multi-process) mesh construction needs
    jax.distributed.initialize + a device grid laid out so each host's
    addressable devices are contiguous, which this helper does not do.
    Scope matches BASELINE.json config 5 (one v5e-8 slice, one process).
    """
    cfg = cfg or MeshConfig()
    if devices is None and jax.process_count() > 1:
        raise NotImplementedError(
            "make_mesh is single-process; for multi-host pass an explicitly "
            "laid-out `devices` grid (e.g. from jax.experimental.mesh_utils)"
        )
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n
    mp = cfg.model_parallel if cfg.model_parallel > 0 else 1
    if dp * mp != n:
        # fall back: everything data-parallel
        dp, mp = n, 1
    grid = np.asarray(devices).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard an array's `axis` across the data axis, replicate the rest."""
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree of host arrays batch-sharded on axis 0."""
    sh = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by data axis {n}"
    )
    return global_batch // n
