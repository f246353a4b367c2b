"""Long-sequence attention: substantiate (or reject) the 'flash wins at
long S' design claim with TPU measurements.

RESULTS.md only ever measured the Pallas blockwise flash kernel at the MOSEI
shape (S=50, rejected: +3.73 ms).  This bench measures the bert-base forward
at growing sequence lengths, XLA attention vs flash; with BENCH_GRAD=1 it
adds train-mode variants (fwd+bwd, dropout ON) that exercise the round-4
blockwise backward + in-kernel dropout against XLA's materialized probs
mask.

Methodology: one lax.scan over n_steps distinct batches per variant, host
readback of a scalar reduction per rep, median of reps (CLAUDE.md relay
rules).  Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/bench_long_seq.py

Each (S, impl) variant runs in its OWN subprocess with a timeout
(benchmarks/subproc.py): the round-3 S=512 compile crashed the axon relay
and killed the rest of the round's hardware queue — a bad compile must cost
one variant, not the run.  BENCH_ISOLATE=0 restores single-process mode.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subproc import current_variant, run_variants_isolated  # noqa: E402


def main():
    B = int(os.environ.get("BENCH_B", "8"))
    n_steps = int(os.environ.get("BENCH_STEPS", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    lengths = [int(s) for s in
               os.environ.get("BENCH_S", "64,256,512").split(",")]

    # isolation check BEFORE importing jax: the parent must never initialize
    # the backend (only one process can hold the axon TPU tunnel)
    modes = ["fwd"]
    if os.environ.get("BENCH_GRAD", "0") == "1":
        # train mode: fwd+bwd with dropout ON — exercises the round-4
        # blockwise backward and in-kernel dropout vs XLA's materialized
        # (B*nh, S, S) probs mask at long S
        modes.append("train")
    variants = [f"{S}:{impl}:{mode}" for S in lengths
                for impl in ("xla", "flash") for mode in modes]
    if run_variants_isolated(variants):
        return
    if current_variant():
        variants = [current_variant()]

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mmda_tpu.models import bert as jbert

    cfg = jbert.BertConfig.base()
    rng = np.random.default_rng(0)
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    def measure(S, impl, mode):
        ids = jnp.asarray(
            rng.integers(0, cfg.vocab_size, size=(n_steps, B, S)), jnp.int32)
        mask = jnp.ones((n_steps, B, S), jnp.int32)

        def fwd_sum(params, i, m, key):
            h = jbert.bert_encode(params, cfg, i, m,
                                  deterministic=(mode == "fwd"),
                                  dropout_rng=key,
                                  attn_impl=impl,
                                  compute_dtype=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))

        @jax.jit
        def run(params, ids, mask):
            def body(key, xs):
                i, m = xs
                if mode == "train":
                    key, sub = jax.random.split(key)
                    s, grads = jax.value_and_grad(fwd_sum)(params, i, m, sub)
                    s = s + sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                for g in jax.tree_util.tree_leaves(grads))
                else:
                    s = fwd_sum(params, i, m, None)
                return key, s
            _, sums = jax.lax.scan(body, jax.random.PRNGKey(0), (ids, mask))
            return sums

        t0 = time.perf_counter()
        _ = float(run(params, ids, mask)[-1])          # compile + warmup
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(params, ids, mask)[-1])      # forces completion
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        print(json.dumps({
            "S": S, "impl": impl, "mode": mode, "B": B,
            ("ms_per_fwd" if mode == "fwd" else "ms_per_fwd_bwd"):
                round(dt / n_steps * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    for v in variants:
        parts = v.split(":")
        S, impl = parts[0], parts[1]
        mode = parts[2] if len(parts) > 2 else "fwd"
        measure(int(S), impl, mode)


if __name__ == "__main__":
    main()
