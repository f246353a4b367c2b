"""Forward-pass RNG attribution: dropout mask generation cost on TPU.

Variants: fwd with dropout (threefry default), fwd deterministic (no RNG),
fwd with dropout under the rbg (hardware) PRNG.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_rng.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(label, impl=None, deterministic=False):
    """Each variant runs in its own process-like config scope."""
    import jax
    import jax.numpy as jnp

    if impl:
        jax.config.update("jax_default_prng_impl", impl)

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig
    from mmda_tpu.train.objective import compute_losses

    B, T, n_steps = 64, 48, 20
    cfg = Config(use_bert=True, batch_size=B, max_seq_len=T,
                 compute_dtype="bfloat16", data="mosei")
    bert_cfg = BertConfig.base()
    split = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=0))
    split["lengths"][:] = T
    split["bert_mask"][:] = 1
    batch = Batch(**{k: jax.device_put(jnp.asarray(v))
                     for k, v in split.items()})
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_steps,) + x.shape), batch)

    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)

    @jax.jit
    def fwd_epoch(params, rng, batches):
        def body(carry, b):
            rng, r = jax.random.split(carry)
            out = fwd_fn(params, cfg, b, bert_cfg=bert_cfg,
                         deterministic=deterministic, rng=r)
            return rng, compute_losses(cfg, out, b)["total"]
        _, losses = jax.lax.scan(body, rng, batches)
        return losses

    rng = jax.random.PRNGKey(1)
    losses = fwd_epoch(params, rng, batches)
    _ = float(losses[-1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        losses = fwd_epoch(params, rng, batches)
        _ = float(losses[-1])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1] / n_steps * 1e3
    print(f"{label:24s} {dt:7.2f} ms/fwd")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = os.environ.get("RNG_VARIANT", "all")
    if which in ("all", "dropout"):
        run("fwd dropout (threefry)")
    if which in ("all", "det"):
        run("fwd deterministic", deterministic=True)
    if which in ("all", "rbg"):
        run("fwd dropout (rbg)", impl="rbg")


if __name__ == "__main__":
    main()
