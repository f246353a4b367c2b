"""Expert parallelism (EP) for the Switch-MoE BERT FFN, the XLA way.

The reference is dense everywhere (SURVEY.md §2.3: no parallelism); MoE and
EP are net-new scale-out capability.  GShard/Switch implement EP with an
explicit all-to-all that ships each token's hidden vector to the device
holding its chosen expert.  On TPU the idiomatic expression is sharding
annotations and letting XLA SPMD derive the collective:

- the stacked expert weights (E, H, F)/(E, F, H) shard over the TP 'model'
  axis on their leading E dim (mesh.py::_bert_layer_spec 'moe' case), so
  each device holds E/tp experts;
- ops/moe.py dispatches tokens into a dense (E, C, H) block via an einsum
  (static shapes, no scatter), and this module installs a
  `with_sharding_constraint(x, P('model', None, None))` hook on those
  blocks.  XLA propagates: the dispatch einsum's output is E-sharded while
  its token input is 'data'-sharded -> SPMD inserts exactly the
  all-to-all(+allreduce over the data axis) of the GShard recipe, the
  per-expert GEMMs run fully local on the MXU, and the combine einsum
  routes results back.

Install/uninstall mirrors parallel/sequence.py: a module-level hook in
ops/moe.py (set_expert_constraint) so the model forward stays
mesh-oblivious.  Equivalence vs the unsharded forward is exact
(tests/test_moe.py).
"""

from __future__ import annotations

import contextlib

from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmda_tpu.ops import moe as jmoe
from mmda_tpu.parallel.mesh import MODEL_AXIS


def expert_spec(mesh: Mesh) -> P:
    """(E, C, H) dispatched-block spec: experts over 'model', rest intact."""
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(
            f"expert parallelism shards E over the TP '{MODEL_AXIS}' axis; "
            f"mesh {mesh.axis_names} has none")
    return P(MODEL_AXIS, None, None)


def install_expert_sharding(mesh: Mesh) -> None:
    """Constrain the (E, C, *) dispatched expert blocks to expert_spec(mesh).
    Requires the stacked expert weights to be E-sharded on the same mesh
    (mesh.py::shard_params with tp=True) — the constraint is what turns the
    dispatch/combine einsums into the EP all-to-all instead of a gather of
    replicated weights."""
    sharding = NamedSharding(mesh, expert_spec(mesh))

    def _constrain(x):
        return lax.with_sharding_constraint(x, sharding)

    jmoe.set_expert_constraint(_constrain)


def uninstall_expert_sharding() -> None:
    jmoe.set_expert_constraint(None)


@contextlib.contextmanager
def expert_sharded_moe(mesh: Mesh):
    """`with expert_sharded_moe(mesh): step(...)` — scoped install."""
    install_expert_sharding(mesh)
    try:
        yield
    finally:
        uninstall_expert_sharding()
