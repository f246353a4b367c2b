"""Kernel microbenchmarks on the real TPU: Pallas fused LSTM vs XLA scan.

Run: python benchmarks/bench_kernels.py
Prints per-variant step times; used to decide the use_pallas default
(SURVEY.md §7 step 11: benchmark each kernel vs the XLA fallback before
keeping it).
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.models import bilstm


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_case(B, T, F, H, tag):
    rng = np.random.default_rng(0)
    params = bilstm.rnn_params(jax.random.PRNGKey(0), F, H, "lstm")
    x = jnp.array(rng.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.array(rng.integers(T // 2, T + 1, size=B))
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)

    results = {}
    for use_pallas in (False, True):
        fwd = jax.jit(functools.partial(
            bilstm._scan_direction, cell="lstm", reverse=False,
            use_pallas=use_pallas))

        def loss_fn(p, x):
            ys, h = bilstm._scan_direction(
                p, x, mask, "lstm", False, use_pallas=use_pallas)
            return jnp.sum(ys ** 2) + jnp.sum(h ** 2)

        grad = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        tf = timeit(fwd, params["fwd"], x, mask)
        tg = timeit(grad, params["fwd"], x)
        results["pallas" if use_pallas else "xla"] = {
            "fwd_ms": tf * 1e3, "fwd+bwd_ms": tg * 1e3}

    speedup_f = results["xla"]["fwd_ms"] / results["pallas"]["fwd_ms"]
    speedup_g = results["xla"]["fwd+bwd_ms"] / results["pallas"]["fwd+bwd_ms"]
    print(json.dumps({
        "case": tag, "B": B, "T": T, "F": F, "H": H,
        "xla_fwd_ms": round(results["xla"]["fwd_ms"], 3),
        "pallas_fwd_ms": round(results["pallas"]["fwd_ms"], 3),
        "xla_fwdbwd_ms": round(results["xla"]["fwd+bwd_ms"], 3),
        "pallas_fwdbwd_ms": round(results["pallas"]["fwd+bwd_ms"], 3),
        "fwd_speedup": round(speedup_f, 2),
        "fwdbwd_speedup": round(speedup_g, 2),
    }))


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    bench_case(64, 48, 35, 35, "mosei-visual")
    bench_case(64, 48, 74, 74, "mosei-acoustic")
    bench_case(64, 48, 300, 300, "glove-text")
    bench_case(64, 48, 256, 128, "h128-aligned")
