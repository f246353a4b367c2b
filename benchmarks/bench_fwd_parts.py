"""Deterministic-forward component attribution on TPU.

Variants (all deterministic, B=64, T=48, bf16):
  base        production bert_encode path
  skip_attn   attention core ablated (ctx := x) - bounds the attention cost
  flash       Pallas flash attention routing
  gelu_tanh   tanh-approx GELU instead of erf
  ln_bf16     LayerNorm statistics in bf16
  fast        gelu_tanh + ln_bf16 combined

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_fwd_parts.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig
    from mmda_tpu.train.objective import compute_losses

    B, T, n_steps = 64, 48, 20
    cfg = Config(use_bert=True, batch_size=B, max_seq_len=T,
                 compute_dtype="bfloat16", data="mosei")
    split = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=0))
    split["lengths"][:] = T
    split["bert_mask"][:] = 1
    batch = Batch(**{k: jax.device_put(jnp.asarray(v))
                     for k, v in split.items()})
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_steps,) + x.shape), batch)

    init_fn, fwd_fn = get_model(cfg.model)
    base_bert = BertConfig.base()
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=base_bert)

    def timed(label, bert_cfg, run_cfg, attn_impl=None):
        import functools

        from mmda_tpu.models import bert as jbert

        if attn_impl is not None:
            orig = jbert.bert_encode
            jbert.bert_encode = functools.partial(orig, attn_impl=attn_impl)

        @jax.jit
        def fwd_epoch(params, batches):
            def body(carry, b):
                out = fwd_fn(params, run_cfg, b, bert_cfg=bert_cfg,
                             deterministic=True)
                return carry, compute_losses(run_cfg, out, b)["total"]
            _, losses = jax.lax.scan(body, 0, batches)
            return losses

        try:
            losses = fwd_epoch(params, batches)
            _ = float(losses[-1])
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                losses = fwd_epoch(params, batches)
                _ = float(losses[-1])
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[1] / n_steps * 1e3
            print(f"{label:12s} {dt:7.2f} ms/fwd")
        finally:
            if attn_impl is not None:
                jbert.bert_encode = orig

    import dataclasses

    variants = os.environ.get(
        "FWD_VARIANTS", "base,skip_attn,flash,gelu_tanh,ln_bf16,fast").split(",")
    if "base" in variants:
        timed("base", base_bert, cfg)
    if "skip_attn" in variants:
        timed("skip_attn", base_bert, cfg, attn_impl="skip")
    if "transpose_only" in variants:
        timed("transpose_only", base_bert, cfg, attn_impl="transpose_only")
    if "xla_pad64" in variants:
        timed("xla_pad64", base_bert, cfg, attn_impl="xla_pad64")
    if "flash" in variants:
        timed("flash", base_bert, cfg.replace(use_flash_attention=True))
    if "fused" in variants:
        timed("fused", base_bert, cfg.replace(attn_impl="fused"))
    if "gelu_tanh" in variants:
        timed("gelu_tanh", dataclasses.replace(base_bert, gelu_exact=False), cfg)
    if "ln_bf16" in variants:
        timed("ln_bf16", dataclasses.replace(base_bert, ln_fp32=False), cfg)
    if "fast" in variants:
        timed("fast", dataclasses.replace(base_bert, gelu_exact=False,
                                          ln_fp32=False), cfg)


if __name__ == "__main__":
    main()
