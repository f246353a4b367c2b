"""GRU-tower A/B on the real TPU: XLA fused-direction scan vs the fused
Pallas GRU kernel (ops/pallas/gru.py).

Same geometry and methodology as bench_towers.py (the LSTM A/B that adopted
the per-direction Pallas kernel in round 2): the visual+acoustic tower pair
at MOSEI sizes (H=F=35 and H=F=74, B=64, T=48), fwd and fwd+bwd, N
iterations inside one lax.scan dispatch, forced host readback, median of
>=5 reps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_gru.py
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

    B = int(os.environ.get("BENCH_B", "64"))   # B=128 -> gridded kernel
    T = int(os.environ.get("BENCH_T", "48"))
    FV, FA = 35, 74
    n_iters = int(os.environ.get("BENCH_STEPS", "50"))
    rng = np.random.default_rng(0)

    kv, ka = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "v": bilstm.extractor_params(kv, FV, FV, "gru"),
        "a": bilstm.extractor_params(ka, FA, FA, "gru"),
    }
    xv = jnp.asarray(rng.normal(size=(B, T, FV)).astype(np.float32))
    xa = jnp.asarray(rng.normal(size=(B, T, FA)).astype(np.float32))
    lv = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)))
    la = lv

    def extract(p, x, lengths, fused):
        ys1, h1 = bilstm.birnn(p["rnn1"], x, lengths, "gru", fused=fused)
        ys1 = bilstm.layer_norm(p["ln"], ys1)
        _, h2 = bilstm.birnn(p["rnn2"], ys1, lengths, "gru", fused=fused)
        H = h1.shape[-1] // 2
        return jnp.concatenate(
            [h1[:, :H], h2[:, :H], h1[:, H:], h2[:, H:]], axis=-1)

    def make_loss(mode):
        def loss(p, seed):
            if mode == "pallas":
                pallas_flags.set_enabled(True)
                try:
                    v = extract(p["v"], xv + seed, lv, fused=False)
                    a = extract(p["a"], xa + seed, la, fused=False)
                finally:
                    pallas_flags.set_enabled(False)
            else:
                v = extract(p["v"], xv + seed, lv, fused=True)
                a = extract(p["a"], xa + seed, la, fused=True)
            return jnp.sum(v**2) + jnp.sum(a**2)
        return loss

    def timed(fn, tag):
        @jax.jit
        def many(p):
            def body(c, seed):
                return c + fn(p, seed * 1e-3), None
            out, _ = jax.lax.scan(
                body, 0.0, jnp.arange(n_iters, dtype=jnp.float32))
            return out

        v = float(many(params))  # compile + warmup
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            v = float(many(params))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2] / n_iters * 1e3
        print(f"{tag:28s} {med:8.3f} ms/iter   (check {v:.3e})", flush=True)
        return med

    results = {}
    for mode in ("xla_fused", "pallas"):
        loss = make_loss(mode)
        results[f"{mode}_fwd"] = timed(loss, f"gru {mode} fwd")

        def loss_and_grads(p, s, _loss=loss):
            g = jax.grad(_loss)(p, s)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
        results[f"{mode}_fwdbwd"] = timed(loss_and_grads, f"gru {mode} fwd+bwd")

    print()
    for k, v in results.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
