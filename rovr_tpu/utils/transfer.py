"""Host<->device transfer helpers tuned for the axon TPU tunnel.

Measured on this tunnel:
  * a single device->host transfer collapses above a few MB (~0.6 MB/s at
    16+ MB), while PARALLEL <=4 MB fetches sustain ~45 MB/s;
  * the transfer granularity is the underlying device ALLOCATION — the
    outputs of one jit call share an allocation, so "chunks" returned
    together fetch as slowly as one big array (222 s vs 3.5 s for the same
    128 MB);
  * each dispatch pays ~70 ms tunnel latency, and compiling wide concat
    graphs over hundreds of leaves takes minutes — so both per-leaf fetch
    plans AND monolithic repacking lose;
  * host->device is unaffected (>400 MB/s single-stream), no helper needed.

`chunked_device_get` therefore leaves small leaves untouched (they are
already separate allocations — zero extra dispatches) and splits only the
few large leaves into uniform <=4 MB slices with ONE compiled slicer per
(dtype, length) — `lax.dynamic_slice` clamps the final start, so every
slice shares the same static shape and the overlap is dropped on the host.
163 MB imitation state: 416 s via naive Orbax streaming, ~8 s here.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np

DEFAULT_CHUNK_BYTES = 4 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(2,))
def _slice(buf, start, size: int):
    # dynamic_slice clamps start to buf.size - size: uniform static shape
    return jax.lax.dynamic_slice(buf, (start,), (size,))


@jax.jit
def _ravel(x):
    return x.reshape(-1)


def chunked_device_get(tree: Any, chunk_bytes: int = DEFAULT_CHUNK_BYTES) -> Any:
    """jax.device_get with large leaves split into parallel small fetches.

    Returns the same pytree with every array leaf as host numpy. Non-array
    leaves pass through untouched.
    """
    leaves, treedef = jax.tree.flatten(tree)

    fetch = []   # device arrays to pull, flat
    plans = []   # per-leaf: ("raw",) | ("small",) | ("big", n, per, starts)
    for leaf in leaves:
        if not isinstance(leaf, jax.Array) or leaf.size == 0:
            plans.append(("raw",))
            continue
        dt = np.dtype(leaf.dtype)
        nbytes = leaf.size * dt.itemsize
        if nbytes <= chunk_bytes:
            plans.append(("small",))
            fetch.append(leaf)
            continue
        per = max(1, chunk_bytes // dt.itemsize)
        n = leaf.size
        flat = _ravel(leaf)
        starts = [min(i * per, n - per) for i in range(-(-n // per))]
        plans.append(("big", n, per, starts))
        for s in starts:
            fetch.append(_slice(flat, s, per))

    fetched = jax.device_get(fetch)

    out = []
    it = iter(fetched)
    for leaf, plan in zip(leaves, plans):
        if plan[0] == "raw":
            out.append(np.asarray(leaf) if hasattr(leaf, "__array__") else leaf)
        elif plan[0] == "small":
            out.append(np.asarray(next(it)).reshape(leaf.shape))
        else:
            _, n, per, starts = plan
            flat = np.empty((n,), np.dtype(leaf.dtype))
            for s in starts:
                flat[s : s + per] = np.asarray(next(it))
            out.append(flat.reshape(leaf.shape))
    return jax.tree.unflatten(treedef, out)


def tunnel_sync(tree: Any) -> None:
    """Truly wait for `tree`'s computation to finish.

    Over the axon tunnel `jax.block_until_ready` (and `device_put`) return
    once the work is ENQUEUED, not once it has executed — per-step
    block_until_ready timing reads ~3x too fast (docs/performance.md,
    tunnel findings). A `device_get` round-trip is the only sync the
    tunnel honors. One tiny reduction per leaf is fetched in a single
    device_get: a reduction of a SHARDED leaf needs every shard (GSPMD
    inserts the collective), so this drains every participating device,
    not just the first leaf's — and the device serializes queued programs,
    so everything dispatched before is drained too. Shared by bench.py,
    the benchmarks/ scripts, and StepTimer.

    Cost: one op enqueue per leaf + one round-trip — meant for syncing
    step OUTPUTS (metrics dicts, a few arrays), not giant param trees.
    """
    import jax.numpy as jnp

    def numeric(l) -> bool:
        try:  # skips typed PRNG-key arrays and other extended dtypes
            return jnp.issubdtype(l.dtype, jnp.number) or jnp.issubdtype(
                l.dtype, jnp.bool_
            )
        except Exception:
            return False

    leaves = [
        l for l in jax.tree.leaves(tree) if hasattr(l, "dtype") and numeric(l)
    ]
    if not leaves:  # nothing fetchable: best-effort drain
        jax.block_until_ready(tree)
        return
    # sum in float32 (the convert fuses into the reduction): bool/uint8
    # leaves must not overflow, and zero-size leaves reduce to 0.0 instead
    # of indexing out of bounds
    jax.device_get([jnp.sum(l.astype(jnp.float32)) for l in leaves])
