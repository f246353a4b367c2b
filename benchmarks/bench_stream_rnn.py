"""Long-T recurrence tower A/B on the real TPU: XLA fused-direction scan vs
the STREAMING (time-chunked) Pallas kernel (ops/pallas/{lstm,gru}.py).

Round-4 verdict item 1: T>=256 towers fell back to the XLA scan because the
whole-T kernel holds full (T, BB, .) tensors in scoped VMEM.  The streaming
variant grids over (B//BB, T//TC) with time sequential-minor and h/c carried
in revisited VMEM scratch.  This bench decides adopt-vs-reject at the
production long-seq geometries (visual 35 + acoustic 74 tower pair, the
shapes behind the T=512 end-to-end rows in benchmarks/RESULTS.md).

Methodology = bench_gru.py / bench_towers.py: N iterations inside one
lax.scan dispatch, forced host readback, median of >=5 reps.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
  BENCH_CELL=lstm [BENCH_B=32] [BENCH_TS=256,512] python benchmarks/bench_stream_rnn.py

BENCH_CELL=gru additionally runs the inference-routing confirmation at
B=128/T=48 (VERDICT r4 item 5): the routed deterministic forward must match
the XLA scan, not the 2x-slower gridded kernel.
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

    from mmda_tpu.models import bilstm
    from mmda_tpu.ops import pallas as pallas_flags

    cell = os.environ.get("BENCH_CELL", "lstm")
    B = int(os.environ.get("BENCH_B", "32"))
    Ts = [int(t) for t in os.environ.get("BENCH_TS", "256,512").split(",")]
    FV, FA = 35, 74
    n_iters = int(os.environ.get("BENCH_STEPS", "20"))
    ngates = 4 if cell == "lstm" else 3

    if cell == "lstm":
        from mmda_tpu.ops.pallas import lstm as kmod
    else:
        from mmda_tpu.ops.pallas import gru as kmod

    rng = np.random.default_rng(0)
    kv, ka = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "v": bilstm.extractor_params(kv, FV, FV, cell),
        "a": bilstm.extractor_params(ka, FA, FA, cell),
    }

    def extract(p, x, lengths, fused, training):
        ys1, h1 = bilstm.birnn(p["rnn1"], x, lengths, cell, fused=fused,
                               training=training)
        ys1 = bilstm.layer_norm(p["ln"], ys1)
        _, h2 = bilstm.birnn(p["rnn2"], ys1, lengths, cell, fused=fused,
                             training=training)
        H = h1.shape[-1] // 2
        return jnp.concatenate(
            [h1[:, :H], h2[:, :H], h1[:, H:], h2[:, H:]], axis=-1)

    def timed(fn, p, tag):
        @jax.jit
        def many(p):
            def body(c, seed):
                return c + fn(p, seed * 1e-3), None
            out, _ = jax.lax.scan(
                body, 0.0, jnp.arange(n_iters, dtype=jnp.float32))
            return out

        v = float(many(p))  # compile + warmup
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            v = float(many(p))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2] / n_iters * 1e3
        print(f"{tag:36s} {med:8.3f} ms/iter   (check {v:.3e})", flush=True)
        return med

    results = {}
    for T in Ts:
        print(f"--- {cell} tower pair  B={B} T={T} "
              f"(stream geom 35: {kmod.stream_geometry(T, B, ngates * FV)}, "
              f"74: {kmod.stream_geometry(T, B, ngates * FA)}) ---",
              flush=True)
        xv = jnp.asarray(rng.normal(size=(B, T, FV)).astype(np.float32))
        xa = jnp.asarray(rng.normal(size=(B, T, FA)).astype(np.float32))
        lv = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)))

        def make_loss(mode, xv=xv, xa=xa, lv=lv):
            def loss(p, seed):
                if mode == "pallas":
                    pallas_flags.set_enabled(True)
                    try:
                        v = extract(p["v"], xv + seed, lv, fused=False,
                                    training=True)
                        a = extract(p["a"], xa + seed, lv, fused=False,
                                    training=True)
                    finally:
                        pallas_flags.set_enabled(False)
                else:
                    v = extract(p["v"], xv + seed, lv, fused=True,
                                training=True)
                    a = extract(p["a"], xa + seed, lv, fused=True,
                                training=True)
                return jnp.sum(v**2) + jnp.sum(a**2)
            return loss

        modes = ("xla_fused", "stream_pallas")
        if os.environ.get("BENCH_ORDER", "") == "rev":
            # drift check: any surprising A/B needs the reversed variant
            # order re-run before acting on it (round-4 wdtype lesson)
            modes = modes[::-1]
        for mode in modes:
            loss = make_loss("pallas" if mode == "stream_pallas" else "xla")
            results[f"T{T}_{mode}_fwd"] = timed(
                loss, params, f"{cell} T={T} {mode} fwd")

            def loss_and_grads(p, s, _loss=loss):
                g = jax.grad(_loss)(p, s)
                return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
            results[f"T{T}_{mode}_fwdbwd"] = timed(
                loss_and_grads, params, f"{cell} T={T} {mode} fwd+bwd")

    if cell == "gru":
        # VERDICT r4 item 5 hardware confirmation: at B=128/T=48 the gridded
        # whole-T kernel measured 2x slower fwd-only; the routed
        # deterministic forward (training=False) must take the XLA scan.
        Bi, Ti = 128, 48
        print(f"--- inference routing confirm  B={Bi} T={Ti} ---", flush=True)
        xv = jnp.asarray(rng.normal(size=(Bi, Ti, FV)).astype(np.float32))
        xa = jnp.asarray(rng.normal(size=(Bi, Ti, FA)).astype(np.float32))
        lv = jnp.asarray(rng.integers(Ti // 2, Ti + 1, size=(Bi,)))

        def make_infer(training):
            def fwd(p, seed):
                pallas_flags.set_enabled(True)
                try:
                    v = extract(p["v"], xv + seed, lv, fused=None,
                                training=training)
                    a = extract(p["a"], xa + seed, lv, fused=None,
                                training=training)
                finally:
                    pallas_flags.set_enabled(False)
                return jnp.sum(v**2) + jnp.sum(a**2)
            return fwd

        results["infer_routed_xla"] = timed(
            make_infer(False), params, "gru B=128 routed infer (xla)")
        results["infer_forced_kernel"] = timed(
            make_infer(True), params, "gru B=128 forced kernel fwd")

    print()
    for k, v in results.items():
        print(f"{k:36s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
