"""Thin collectives layer over jax.lax primitives on named mesh axes.

TPU-native replacement for the communication backend the reference lacks
(SURVEY.md §2.14): inside `shard_map`-ped functions these ride the ICI links
of a v5e slice; XLA chooses ring/tree schedules. DCN multi-slice is out of
scope for parity (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rovr_tpu.parallel.mesh import DATA_AXIS


def pmean(x, axis_name: str = DATA_AXIS):
    """Cross-replica mean — gradient/metric averaging for data parallel."""
    return jax.lax.pmean(x, axis_name)


def psum(x, axis_name: str = DATA_AXIS):
    return jax.lax.psum(x, axis_name)


def all_gather(x, axis_name: str = DATA_AXIS, axis: int = 0, tiled: bool = True):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute_ring(x, axis_name: str, shift: int = 1):
    """Ring shift along a mesh axis (ring attention building block)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def reduce_scatter(x, axis_name: str = DATA_AXIS, axis: int = 0):
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def axis_index(axis_name: str = DATA_AXIS):
    return jax.lax.axis_index(axis_name)
