"""Headline benchmark: MOSEI train-step throughput on TPU.

Prints ONE JSON line:
  {"metric": "mosei_train_utterances_per_sec", "value": N,
   "unit": "utterances/s", "vs_baseline": N,
   "ms_per_step": N, "flops_per_step": N, "mfu": N}

The last three make the artifact self-describing (VERDICT r3 weak #6):
ms_per_step is the measured wall per optimizer step, flops_per_step comes
from XLA cost_analysis() of the compiled single step (same accounting as
benchmarks/hlo_cost.py), and mfu = flops/(time*peak) at the v5e bf16 peak
(197 TFLOP/s) — null off-TPU where the peak doesn't apply.

The workload is the full flagship configuration - MISA with a bert-base text
tower (random-init weights; FLOPs identical to pretrained), batch 64, seq 48
words (+2 BERT specials), the exact training objective, Adam + clip - i.e. the
reference hot loop (src/solver.py:139-193) as one jit'd step.

vs_baseline compares against the measured PyTorch-CPU reference-equivalent step
(benchmarks/baseline_torch_cpu.json, produced by benchmarks/torch_baseline.py
on this host).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def jnp_stack(xs):
    import jax.numpy as jnp

    return jnp.stack([jnp.asarray(x) for x in xs], axis=0)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")   # cfg.fast_rng

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig, frozen_mask
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_epoch, make_train_step

    # BENCH_B/BENCH_T: shape overrides for long-seq A/Bs (defaults are the
    # headline MOSEI shape; the driver always runs the default).
    B = int(os.environ.get("BENCH_B", "64"))
    T = int(os.environ.get("BENCH_T", "48"))
    cfg = Config(
        use_bert=True, batch_size=B, max_seq_len=T,
        compute_dtype="bfloat16", data="mosei", name="bench",
        attn_impl=os.environ.get("BENCH_ATTN", "xla"),
        adam_mu_dtype=os.environ.get("BENCH_MU_DTYPE", "float32"),
        # BENCH_RNNCELL=gru: full-step A/B of the GRU towers (Pallas GRU
        # kernel vs XLA fused scan via BENCH_PALLAS=1/0)
        rnncell=os.environ.get("BENCH_RNNCELL", "lstm"),
    )
    if os.environ.get("BENCH_DROPOUT0", "0") == "1":
        # gap-accounting ablation: all dropout off (BERT + model heads) —
        # the delta vs base is the TOTAL dropout cost in this regime
        import dataclasses

        cfg = dataclasses.replace(cfg, dropout=0.0)
    bert_cfg = BertConfig.base()
    if os.environ.get("BENCH_FUSED_LN", "0") == "1":
        # A/B hook: fused Pallas LN(x + dropout(h)) sites (round 4)
        import dataclasses

        bert_cfg = dataclasses.replace(bert_cfg, fused_ln_dropout=True)
    if os.environ.get("BENCH_DROPOUT0", "0") == "1":
        import dataclasses

        bert_cfg = dataclasses.replace(bert_cfg, hidden_dropout=0.0,
                                       attention_dropout=0.0)
    if os.environ.get("BENCH_REMAT", "0") == "1":
        # gap-accounting ablation: jax.checkpoint each encoder layer
        # (measured-rejected at S=50 where compute-bound; HBM-bound long-S
        # economics can differ — VERDICT r4 item 3)
        import dataclasses

        bert_cfg = dataclasses.replace(bert_cfg, remat=True)
    if (cfg.fast_dropout and jax.default_backend() == "tpu"
            and os.environ.get("BENCH_FASTDROP", "1") == "1"):
        # cfg.fast_dropout production default (mirrors Trainer):
        # uint8 dropout draws + masks regenerated in the backward
        # (BENCH_FASTDROP=0 restores float-draw torch-style dropout)
        import dataclasses

        bert_cfg = dataclasses.replace(bert_cfg, dropout_bits=8,
                                       dropout_recompute=True)

    # production kernel routing, mirroring Trainer (train/loop.py);
    # BENCH_PALLAS=0/1 overrides cfg.use_pallas for kernel A/Bs
    from mmda_tpu.ops import pallas as pallas_flags
    _pallas_env = os.environ.get("BENCH_PALLAS")
    _use_pallas = cfg.use_pallas if _pallas_env is None else _pallas_env == "1"
    pallas_flags.set_enabled(_use_pallas and jax.default_backend() == "tpu")

    def make_batch(seed):
        split = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=seed))
        # full-length rows: steady-state shape (worst-case padding)
        split["lengths"][:] = T
        split["bert_mask"][:] = 1
        return split

    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)

    # compiled multi-step epoch: lax.scan over stacked batches -> ONE dispatch
    # for n_steps optimizer steps (device-resident loop; the host/tunnel round
    # trip is excluded, as in real epochs driven by the prefetching loader).
    # Timing methodology: median of reps, each terminated by a HOST READBACK
    # of the final loss value (block_until_ready alone can return early
    # through the axon relay and fake sub-ms step times).
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    epoch_fn = make_train_epoch(cfg, tx, fwd_fn, bert_cfg, frozen=frozen)
    # n_steps DISTINCT batches: the scanned-epoch loss trajectory is realistic
    # (one broadcast batch would overfit within the scan)
    splits = [make_batch(seed) for seed in range(n_steps)]
    batches = Batch(**{
        k: jax.device_put(jnp_stack([s[k] for s in splits]))
        for k in splits[0]
    })

    state, losses = epoch_fn(state, batches)        # warmup/compile
    _ = float(losses["total"][-1])

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, batches)
        _ = float(losses["total"][-1])              # forces completion
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        # device-trace capture (the relay exposes xplane as of round 5 —
        # benchmarks/profile_probe.py); summarize with trace_summary.py.
        # Free-running per-step dispatch (not the scanned epoch) so the
        # trace shows per-op events for the SINGLE train step.
        step = jax.jit(make_train_step(cfg, tx, fwd_fn, bert_cfg,
                                       donate=False, frozen=frozen))
        one = Batch(**{k: (v[0] if v is not None else None)
                       for k, v in batches._asdict().items()})
        state2, losses2 = step(state, one)          # compile outside trace
        _ = float(losses2["total"])
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                state2, losses2 = step(state2, one)
                _ = float(losses2["total"])
        print(f"# profile written to {profile_dir}", file=sys.stderr)

    per_step = dt / n_steps
    utt_per_sec = B / per_step

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_torch_cpu.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            vs = utt_per_sec / json.load(f)["value"]

    # FLOPs from XLA cost_analysis of ONE step (the scanned epoch's while
    # body would be counted once, not x n_steps) — persistent cache makes the
    # extra compile cheap; never let accounting kill the measurement.
    flops = mfu = None
    try:
        step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False,
                               frozen=frozen)
        one = Batch(**{k: (v[0] if v is not None else None)
                       for k, v in batches._asdict().items()})
        ca = jax.jit(step).lower(state, one).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
        if flops and jax.default_backend() == "tpu":
            V5E_BF16_PEAK = 197e12
            mfu = flops / per_step / V5E_BF16_PEAK
    except Exception as e:                                    # noqa: BLE001
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "mosei_train_utterances_per_sec",
        "value": round(utt_per_sec, 2),
        "unit": "utterances/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "ms_per_step": round(per_step * 1e3, 2),
        "flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    main()
