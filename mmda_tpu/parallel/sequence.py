"""Sequence parallelism (Megatron-SP) for the BERT tower, the XLA way.

The reference has no parallelism (SURVEY.md §2.3).  parallel/mesh.py gives
DP + Megatron-TP; parallel/pipeline.py gives PP; this module adds SP, which
rides ON TOP of TP: in the regions between the attention/FFN matmul blocks
(layernorm, dropout, residual adds) the (B, S, H) activations are sharded
along the SEQUENCE axis over the same 'model' devices that hold the TP
weight shards.  Megatron-LM implements this with hand-placed
all-gather / reduce-scatter pairs; on TPU the idiomatic implementation is a
single `lax.with_sharding_constraint(x, P('data', 'model', None))` on the
residual stream after every encoder layer — XLA SPMD propagates the
constraint against the TP weight shardings (q/k/v kernels P(None,'model'),
ffn_out P('model', None), mesh.py::param_partition_specs) and derives
exactly the Megatron-SP communication pattern: all-gather S entering each
matmul block, reduce-scatter S leaving it, elementwise/LN work 1/tp-sharded.

Why it matters: with plain TP the LN/dropout/residual FLOPs and — more
importantly on TPU — their HBM traffic are replicated on every TP device;
SP cuts both by 1/tp and shrinks per-device activation memory, at zero cost
in collective volume (an all-gather + reduce-scatter pair moves the same
bytes as TP's all-reduce, scaling-book §5).

Install/uninstall mirrors parallel/pipeline.py: a module-level hook in
models/bert.py (set_activation_constraint) so model forwards stay
mesh-oblivious.  Equivalence vs the unsharded forward is exact
(tests/test_sequence_parallel.py).
"""

from __future__ import annotations

import contextlib

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmda_tpu.models import bert as jbert
from mmda_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def activation_spec(mesh: Mesh) -> P:
    """(B, S, H) spec: batch over 'data', sequence over 'model', H intact."""
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(
            f"sequence parallelism shards S over the TP '{MODEL_AXIS}' axis; "
            f"mesh {mesh.axis_names} has none")
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return P(data, MODEL_AXIS, None)


def install_sequence_sharding(mesh: Mesh) -> None:
    """Constrain the BERT residual stream to activation_spec(mesh) between
    encoder layers.  Requires the tower's weights to be TP-sharded on the
    same mesh (mesh.py::shard_params with tp=True) — the constraint is what
    turns TP's replicated LN/dropout regions into 1/tp-sharded SP regions."""
    sharding = NamedSharding(mesh, activation_spec(mesh))

    def _constrain(x):
        return lax.with_sharding_constraint(x, sharding)

    jbert.set_activation_constraint(_constrain)


def uninstall_sequence_sharding() -> None:
    jbert.set_activation_constraint(None)


@contextlib.contextmanager
def sequence_sharded_bert(mesh: Mesh):
    """`with sequence_sharded_bert(mesh): step(...)` — scoped install."""
    install_sequence_sharding(mesh)
    try:
        yield
    finally:
        uninstall_sequence_sharding()
