"""HLO cost analysis of the flagship train step — the accounting tool.

Compiles the full MISA train step (donated jit, same construction as
bench.py) for the current backend and prints:

  1. XLA's `cost_analysis()` — total FLOPs, bytes accessed, and the derived
     MXU-floor ms at the chip's peak (v5e bf16 ~197 TFLOP/s, HBM 819 GB/s),
  2. an HLO op histogram (fusion/convolution/dot/collective counts) from
     the compiled module text,

which is how the RESULTS.md "accounting" tables bound what the step could
cost vs what it does (rounds 2-3 produced these numbers ad hoc; this makes
the methodology reproducible in one command).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hlo_cost.py
Run (CPU sanity): add --device cpu (FLOP counts identical; peaks differ).
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12       # per-chip peak (public spec)
V5E_HBM_BYTES = 819e9


def main():
    import jax

    if "--device" in sys.argv:
        jax.config.update("jax_platforms",
                          sys.argv[sys.argv.index("--device") + 1])

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig, frozen_mask
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_step

    B, T = 64, 48
    cfg = Config(use_bert=True, batch_size=B, max_seq_len=T,
                 compute_dtype="bfloat16", data="mosei", name="hlo_cost")
    bert_cfg = BertConfig.base()
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
    split = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=0))
    batch = Batch(**split)

    step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False,
                           frozen=frozen)
    compiled = jax.jit(step._fun if hasattr(step, "_fun") else step
                       ).lower(state, batch).compile()

    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    report = {
        "backend": jax.default_backend(),
        "gflops_per_step": round(flops / 1e9, 2),
        "gbytes_per_step": round(bytes_ / 1e9, 3),
        "mxu_floor_ms_v5e_bf16": round(flops / V5E_BF16_FLOPS * 1e3, 2),
        "hbm_floor_ms_v5e": round(bytes_ / V5E_HBM_BYTES * 1e3, 2),
        "arithmetic_intensity": round(flops / max(bytes_, 1.0), 1),
    }

    hlo = compiled.as_text()
    hist = collections.Counter()
    for op in re.findall(r"^\s*(?:ROOT )?%?[\w.\-]+ = [\w\[\]{},/ ]* (\w+)\(",
                         hlo, re.M):
        hist[op] += 1
    top = dict(sorted(hist.items(), key=lambda kv: -kv[1])[:12])
    report["hlo_op_histogram_top"] = top
    collectives = {k: v for k, v in hist.items()
                   if "all-" in k or "collective" in k or "reduce-scatter" in k}
    report["collectives"] = collectives
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
