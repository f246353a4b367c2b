"""Sharded / multi-host checkpointing (orbax-backed).

The msgpack path (train/checkpoint.py) is single-host: it gathers every array
to host memory, which is fine at MISA scale but wrong for multi-host meshes
(each host only addresses its shard) and wasteful for TP-sharded params.
This module is the idiomatic TPU equivalent of a distributed checkpoint
(SURVEY.md §5 checkpoint/resume row):

  * `save_sharded` writes a TrainState with orbax; on a multi-host mesh each
    process writes only its addressable shards (orbax coordinates the commit);
  * `restore_sharded` restores INTO a target sharding - which may be a
    DIFFERENT mesh shape than the save-time one (elastic restore: save under
    dp=8, resume under dp=4 x tp=2), orbax reshards on read;
  * async variants return immediately and expose `wait_until_finished`.

The reference has no analog (its checkpointing is torch.save of state_dicts,
src/solver.py:218-223, never restored mid-run).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mmda_tpu.train.state import TrainState


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _checkpointer(use_async: bool) -> ocp.Checkpointer:
    global _async_ckptr
    if use_async:
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        return _async_ckptr
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


def save_sharded(path: str, state: Any, use_async: bool = False,
                 overwrite: bool = True):
    """Write `state` (any pytree of jax.Arrays, e.g. a TrainState) to `path`.

    On a multi-host mesh every process must call this collectively; each
    writes only its addressable shards.  With use_async=True the device->host
    copy happens now and the write completes in the background (call
    `wait_for_saves` before exiting)."""
    ckptr = _checkpointer(use_async)
    path = os.path.abspath(path)
    ckptr.save(path, state, force=overwrite)
    return ckptr


def wait_for_saves() -> None:
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_sharded(path: str, template: Any) -> Any:
    """Restore into the structure AND sharding of `template`.

    `template` supplies shapes/dtypes/shardings (its values are ignored) -
    build it with jax.eval_shape + NamedSharding for the target mesh.  The
    target mesh may differ from the save-time mesh; orbax reshards on read."""
    path = os.path.abspath(path)

    def spec_of(x):
        if isinstance(x, jax.Array):
            return ocp.utils.to_shape_dtype_struct(x)
        return x

    abstract = jax.tree_util.tree_map(spec_of, template)
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    return ckptr.restore(path, args=ocp.args.StandardRestore(abstract))


def state_template(state: TrainState, mesh, param_specs) -> TrainState:
    """Build a restore template for `state` placed on `mesh` with
    `param_specs` (a PartitionSpec pytree for params; everything else is
    replicated).  Use after constructing a fresh TrainState on the TARGET
    mesh topology."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def placed(x, spec):
        if not isinstance(x, jax.Array):
            return x
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map(placed, state.params, param_specs)
    rep = jax.tree_util.tree_map(
        lambda x: placed(x, P()) if isinstance(x, jax.Array) else x,
        (state.step, state.opt_state, state.rng))
    return TrainState(step=rep[0], params=params, opt_state=rep[1], rng=rep[2])
