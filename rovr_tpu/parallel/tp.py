"""Tensor parallelism for the attention context policy (Megatron-style).

Fills the TP row of SURVEY.md §2.14 (absent in the reference; `model` mesh
axis reserved in parallel/mesh.py). The approach is the idiomatic JAX one —
annotate parameter shardings and let GSPMD insert the collectives — rather
than hand-written collective calls:

  * q/k/v projection kernels (hidden, H, D): heads sharded on `model` —
    each device computes attention for its head shard (heads are
    independent, so no communication inside attention);
  * out projection kernel (H, D, hidden): head axis sharded — its
    contraction produces partial sums that GSPMD all-reduces (the Megatron
    row-parallel linear);
  * MLP: first Dense column-sharded (hidden -> hidden/4 shard), second
    row-sharded (shard -> hidden, all-reduce) — the Megatron MLP pair;
  * everything else (LayerNorms, embeddings, heads, the conv stacks of the
    canvas policy, frozen metric nets) replicated.

`state_shardings` builds the NamedSharding pytree for a full ROVRState by
path-suffix rules, so the SAME rules cover the Adam mu/nu mirrors inside
optimizer state. `make_tp_train_step` is the data+tensor-parallel twin of
rl.make_sharded_train_step.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rovr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path-suffix, rank) -> PartitionSpec rules for the attention policy.
# Paths are matched on their last two segments (module name, param name).
_RULES = {
    ("q", "kernel"): P(None, MODEL_AXIS, None),      # (hidden, H, D)
    ("k", "kernel"): P(None, MODEL_AXIS, None),
    ("v", "kernel"): P(None, MODEL_AXIS, None),
    ("q", "bias"): P(MODEL_AXIS, None),              # (H, D)
    ("k", "bias"): P(MODEL_AXIS, None),
    ("v", "bias"): P(MODEL_AXIS, None),
    ("out", "kernel"): P(MODEL_AXIS, None, None),    # (H, D, hidden)
    ("Dense_0", "kernel"): P(None, MODEL_AXIS),      # (hidden, hidden/4)
    ("Dense_0", "bias"): P(MODEL_AXIS),
    ("Dense_1", "kernel"): P(MODEL_AXIS, None),      # (hidden/4, hidden)
}


def _spec_for_path(path) -> P:
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    keys = [k for k in keys if isinstance(k, str)]
    if len(keys) >= 2 and (keys[-2], keys[-1]) in _RULES:
        return _RULES[(keys[-2], keys[-1])]
    return P()


def param_specs(tree: Any) -> Any:
    """PartitionSpec pytree for any params/opt-state tree by suffix rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(path), tree
    )


def state_shardings(mesh: Mesh, state: Any) -> Any:
    """NamedSharding pytree for a full ROVRState (params + optimizer
    mirrors + frozen nets). Only attention-policy tensors get a `model`
    placement; everything else replicates."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path)), state
    )


def make_tp_train_step(mesh: Mesh, mods, cfg):
    """Data-parallel clips x tensor-parallel attention policy.

    Batch sharded on `data`, attention-policy params sharded on `model` per
    the Megatron rules above; GSPMD inserts the head-shard all-reduces and
    the gradient reductions over ICI.
    """
    from rovr_tpu.train import rl

    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def _step(state, video, org_video, rng):
        video = jax.lax.with_sharding_constraint(video, batch_sh)
        org_video = jax.lax.with_sharding_constraint(org_video, batch_sh)
        return rl._train_step(state, mods, cfg, video, org_video, rng)

    # Build the jit wrapper ONCE, lazily on the first call: the state pytree
    # structure is fixed after init_state, and a fresh jax.jit per call would
    # carry a fresh trace cache — retracing/recompiling the full RL graph
    # every step.
    _cached = []

    def wrap(state, video, org_video, rng):
        if not _cached:
            st_sh = state_shardings(mesh, state)
            _cached.append(jax.jit(
                _step,
                in_shardings=(st_sh, batch_sh, batch_sh, rep),
                out_shardings=(st_sh, rep, batch_sh),
            ))
        return _cached[0](state, video, org_video, rng)

    return wrap
