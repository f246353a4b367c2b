"""GPipe-style pipeline parallelism for the BERT tower.

The reference has no parallelism of any kind (SURVEY.md §2.3 — its only
gesture is a commented-out nn.DataParallel, src/solver.py:88-91).  DP and
Megatron-TP live in parallel/mesh.py; this module adds the third classic
axis: **pipeline parallelism** over a 'pipe' mesh axis, TPU-native:

- the encoder's L layers are split into `pp` contiguous stages whose params
  are STACKED on a leading axis and sharded over 'pipe' — each device holds
  only L/pp layers (the memory win that motivates PP);
- the batch is split into M microbatches that flow through the stages in a
  `lax.scan` over M+pp-1 ticks; after each tick every stage hands its
  activation to the next stage with a single `lax.ppermute` hop over ICI
  (the neighbour-only collective PP exists for — no all-to-all, no
  all-gather of weights);
- the schedule is expressed INSIDE `jax.shard_map`, so XLA sees one fused
  per-tick program per device and the backward pipeline falls out of
  autodiff: `jax.grad` through the scan + ppermute transposes to the exact
  reverse schedule (ppermute's transpose is the inverse permute).

Per-stage math is `models/bert.py::bert_layer` — the same function the
dense encoder calls — so pipeline-vs-dense equivalence is exact, not
approximate (tests/test_pipeline.py).

Composes with DP: build the mesh as ('data', 'pipe') and the microbatch
batch axis is additionally sharded over 'data' (tested on the faked
8-device CPU mesh as 2x4).

MOSEI-scale models don't NEED PP (110M params fit one chip); this is the
framework's scale-out path for deeper towers, kept honest by running the
real schedule on faked multi-device meshes.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mmda_tpu.models import bert as jbert
from mmda_tpu.models.bert import (
    BertConfig,
    attention_bias,
    bert_embed,
    bert_layer,
)

PIPE_AXIS = "pipe"
DATA_AXIS = "data"


def make_pipe_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """('data', 'pipe') mesh.  Neighbouring pipeline stages land on
    consecutive devices so ppermute hops ride single ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp * pp != n:
        raise ValueError(
            f"dp*pp={dp * pp} != device count {n}; slice devices explicitly "
            "to build a sub-mesh")
    arr = np.empty((dp, pp), dtype=object)
    for i, d in enumerate(devices):
        arr[i // pp, i % pp] = d
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def stack_stage_params(layers, pp: int):
    """[L layer pytrees] -> one pytree with leaves (pp, L//pp, ...).

    The leading axis is sharded over 'pipe'; the second is scanned inside a
    stage.  Contiguous split (stage s owns layers [s*L/pp, (s+1)*L/pp)) —
    the standard PP layout, matching the freeze-rule layer indexing."""
    L = len(layers)
    if pp < 1 or L % pp:
        raise ValueError(f"pp={pp} must divide num_layers={L}")
    per = L // pp
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape((pp, per) + xs[0].shape), *layers)


def pipeline_bert_encode(
    params: Dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,          # (B, S) int32
    attention_mask: jnp.ndarray,     # (B, S) 1 for real tokens
    mesh: Mesh,
    num_microbatches: int,
    token_type_ids: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Drop-in for bert_encode's (B, S, H) output, with the encoder layers
    pipelined over the mesh's 'pipe' axis.

    Embeddings/pooler stay replicated (tiny next to the layer stack); the
    per-layer dropout PRNG is folded per (microbatch, layer) so training
    under PP draws independent masks per microbatch — statistically
    equivalent to the dense path, bit-identical only when deterministic."""
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' axis")
    pp = mesh.shape[PIPE_AXIS]
    L = cfg.num_layers
    if L % pp:
        raise ValueError(f"num_layers={L} not divisible by pp={pp}")
    per = L // pp
    B, S = input_ids.shape
    M = num_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M
    has_dp = DATA_AXIS in mesh.axis_names and mesh.shape[DATA_AXIS] > 1
    if has_dp and mb % mesh.shape[DATA_AXIS]:
        raise ValueError(
            f"microbatch size {mb} not divisible by data axis "
            f"{mesh.shape[DATA_AXIS]}")

    if not deterministic and dropout_rng is None:
        raise ValueError("dropout_rng required when not deterministic")

    embed_rng = (None if deterministic
                 else jax.random.fold_in(dropout_rng, 0))
    x, dropout = bert_embed(params, cfg, input_ids, token_type_ids,
                            deterministic=deterministic,
                            embed_dropout_rng=embed_rng,
                            compute_dtype=compute_dtype)
    bias = attention_bias(attention_mask)               # (B, 1, 1, S)

    x_mb = x.reshape(M, mb, S, x.shape[-1])
    bias_mb = bias.reshape(M, mb, 1, 1, S)

    if deterministic:
        # dummy (never read) so the shard_map signature is static; sized to
        # the ACTIVE PRNG impl's key width — rbg keys are (4,) uint32 while
        # threefry are (2,), and Trainer defaults to rbg on TPU
        # (cfg.fast_rng), so hardcoding 2 crashed pp_size>1 at trace time
        key_w = (dropout_rng.shape[-1] if dropout_rng is not None
                 else jax.random.PRNGKey(0).shape[-1])
        rngs_mb = jnp.zeros((M, pp, per, 3, key_w), jnp.uint32)
    else:
        # one key per (microbatch, layer, dropout site); layer order matches
        # the dense encoder's rngs[3i+1 : 3i+4] convention
        flat = jnp.asarray(
            jax.random.split(jax.random.fold_in(dropout_rng, 1), M * L * 3),
            jnp.uint32)
        rngs_mb = flat.reshape(M, pp, per, 3, *flat.shape[1:])

    batch_spec = P(None, DATA_AXIS) if has_dp else P(None)
    stage_spec = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS),
                                        stack_stage_params(params["layers"], pp))

    def shifted(body_x):
        return lax.ppermute(body_x, PIPE_AXIS,
                            [(i, (i + 1) % pp) for i in range(pp)])

    def body(stages, x_all, bias_all, rngs_all):
        idx = lax.axis_index(PIPE_AXIS)
        stages = jax.tree_util.tree_map(lambda a: a[0], stages)  # (per, ...)
        state = jnp.zeros_like(x_all[0])                         # (mb', S, H)
        out = jnp.zeros_like(x_all)                              # (M, mb', S, H)

        def tick(carry, t):
            state, out = carry
            mb_idx = t - idx               # microbatch at this stage this tick
            mb_c = jnp.clip(mb_idx, 0, M - 1)
            # stage 0 ingests microbatch t (clipped ticks past M feed stale
            # data whose outputs never reach the last stage in-scan)
            state = jnp.where(idx == 0, x_all[jnp.clip(t, 0, M - 1)], state)
            b = bias_all[mb_c]
            r_stage = rngs_all[mb_c, idx] if not deterministic else None

            def layer_step(h, xs):
                if deterministic:
                    lp = xs
                    lr = (None, None, None)
                else:
                    lp, r = xs
                    lr = (r[0], r[1], r[2])
                h = bert_layer(h, lp, lr, cfg=cfg, attn_bias=b,
                               dropout=dropout, deterministic=deterministic,
                               compute_dtype=compute_dtype, attn_impl="xla")
                return h, None

            xs = stages if deterministic else (stages, r_stage)
            state, _ = lax.scan(layer_step, state, xs)

            write = (mb_idx >= 0) & (mb_idx < M) & (idx == pp - 1)
            out = out.at[mb_c].set(jnp.where(write, state, out[mb_c]))
            return (shifted(state), out), None

        (_, out), _ = lax.scan(tick, (state, out), jnp.arange(M + pp - 1))
        # only the last stage's buffer is ever written; psum broadcasts it
        return lax.psum(out, PIPE_AXIS)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stage_spec, batch_spec, batch_spec, P()),
        out_specs=batch_spec,
        check_vma=False,
    )(stack_stage_params(params["layers"], pp), x_mb, bias_mb, rngs_mb)
    return out.reshape(B, S, x.shape[-1])


def install_pipeline_encoder(mesh: Mesh, num_microbatches: int) -> None:
    """Route every subsequent `bert_encode` call (MISA and the other
    BERT-towered families) through the pipelined encoder on `mesh`.

    Model forwards stay mesh-oblivious: the override adapter matches the
    dense encoder's hook signature (models/bert.py::set_encode_override),
    so the FULL train step — objective, grads, Adam — pipelines the tower
    with zero changes to model or trainer code (tested end-to-end in
    tests/test_pipeline.py; driver proof in __graft_entry__.dryrun_multichip)."""

    def _enc(params, cfg, input_ids, attention_mask, token_type_ids,
             deterministic, dropout_rng, compute_dtype):
        return pipeline_bert_encode(
            params, cfg, input_ids, attention_mask, mesh, num_microbatches,
            token_type_ids=token_type_ids, deterministic=deterministic,
            dropout_rng=dropout_rng, compute_dtype=compute_dtype)

    jbert.set_encode_override(_enc)


def uninstall_pipeline_encoder() -> None:
    jbert.set_encode_override(None)


@contextlib.contextmanager
def pipelined_bert(mesh: Mesh, num_microbatches: int):
    """Context manager form: `with pipelined_bert(mesh, 4): step(...)`."""
    install_pipeline_encoder(mesh, num_microbatches)
    try:
        yield
    finally:
        uninstall_pipeline_encoder()
