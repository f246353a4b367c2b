"""Switch-MoE step cost on TPU at the headline bench shape.

Measures the flagship MISA train step (B=64, T=48, bert-base tower, mosei
freeze rule, bf16) with the BERT FFNs replaced by Switch-style top-1 MoEs
(ops/moe.py) at E in BENCH_MOE_EXPERTS (default "4,8"), against the dense
tower in the same process.  Methodology identical to bench.py: one
lax.scan'd multi-step dispatch, host readback of the final loss per rep,
median of reps (the axon relay fakes sub-ms steps otherwise — CLAUDE.md).

This is a capability/scale measurement, not a headline claim: at MOSEI
sizes a dense tower is the right choice; MoE pays a dispatch-einsum tax at
N=3072 tokens and wins only when parameter scale, not FLOPs, is the
constraint.  Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/bench_moe.py  (one TPU process at a time).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig, frozen_mask
    from mmda_tpu.ops import pallas as pallas_flags
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_epoch

    B, T = 64, 48
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    experts = [int(e) for e in
               os.environ.get("BENCH_MOE_EXPERTS", "4,8").split(",")]

    def make_batch(seed):
        split = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=seed))
        split["lengths"][:] = T
        split["bert_mask"][:] = 1
        return split

    splits = [make_batch(seed) for seed in range(n_steps)]

    def stacked():
        return Batch(**{
            k: jax.device_put(jnp.stack([jnp.asarray(s[k]) for s in splits]))
            for k in splits[0]
        })

    top_k = int(os.environ.get("BENCH_MOE_TOPK", "1"))

    def measure(tag, moe_experts, grouped=True):
        if moe_experts and top_k != 1:
            tag = f"{tag}_top{top_k}"
        cfg = Config(use_bert=True, batch_size=B, max_seq_len=T,
                     compute_dtype="bfloat16", data="mosei", name="bench_moe",
                     moe_experts=moe_experts, moe_top_k=top_k)
        bert_cfg = BertConfig.base()
        if cfg.fast_dropout and jax.default_backend() == "tpu":
            bert_cfg = dataclasses.replace(bert_cfg, dropout_bits=8,
                                           dropout_recompute=True)
        if moe_experts:
            bert_cfg = dataclasses.replace(bert_cfg, moe_experts=moe_experts,
                                           moe_group_by_example=grouped,
                                           moe_top_k=top_k)
        pallas_flags.set_enabled(
            cfg.use_pallas and jax.default_backend() == "tpu")

        init_fn, fwd_fn = get_model(cfg.model)
        params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        frozen = jax.tree_util.tree_map(lambda _: False, params)
        frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
        tx = make_optimizer(cfg, frozen)
        state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
        epoch_fn = make_train_epoch(cfg, tx, fwd_fn, bert_cfg, frozen=frozen)
        batches = stacked()

        t0 = time.perf_counter()
        state, losses = epoch_fn(state, batches)          # compile + warmup
        first = float(losses["total"][-1])
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, losses = epoch_fn(state, batches)
            last = float(losses["total"][-1])             # forces completion
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        ms = dt / n_steps * 1e3
        print(json.dumps({
            "variant": tag, "params_m": round(n_params / 1e6, 1),
            "ms_per_step": round(ms, 2),
            "utt_per_s": round(B / (dt / n_steps), 1),
            "loss_first_warmup": round(first, 4), "loss_last": round(last, 4),
            "moe_loss": round(float(losses["moe"][-1]), 5),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    measure("dense", 0)
    for e in experts:
        measure(f"moe_e{e}_grouped", e, grouped=True)
        if os.environ.get("BENCH_MOE_UNGROUPED", "1") == "1":
            measure(f"moe_e{e}_ungrouped", e, grouped=False)


if __name__ == "__main__":
    main()
