"""LSTM-tower variants on the real TPU (VERDICT round-2 items #4 and #7).

Measures the visual+acoustic tower pair (MOSEI sizes: H=F=35 and H=F=74,
B=64, T=48) in isolation, fwd and fwd+bwd, across four implementations:

  twoscan      round-1 default: one lax.scan per direction (4 scans per
               tower-pair per layer, 8 sequential scans total)
  fused        round-2 XLA path: both directions in one scan via a leading
               batch dim of 2 (models/bilstm.py::_birnn_fused) — 4 scans
  pallas_r1    round-1 per-direction Pallas kernel at raw H (known loser)
  pallas_multi round-2 lane-padded multi-direction kernel: all 4 directions
               of a layer in ONE launch (ops/pallas/lstm_multi.py) — 2 launches

Same trusted methodology as bench.py: N iterations inside one lax.scan
dispatch, forced host readback, median of >=5 reps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_towers.py
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

    B, T = 64, 48
    FV, FA = 35, 74
    n_iters = int(os.environ.get("BENCH_STEPS", "50"))
    rng = np.random.default_rng(0)

    kv, ka = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "v": bilstm.extractor_params(kv, FV, FV, "lstm"),
        "a": bilstm.extractor_params(ka, FA, FA, "lstm"),
    }
    xv = jnp.asarray(rng.normal(size=(B, T, FV)).astype(np.float32))
    xa = jnp.asarray(rng.normal(size=(B, T, FA)).astype(np.float32))
    lv = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)))
    la = lv

    def extract_xla(p, x, lengths, fused):
        ys1, h1 = bilstm.birnn(p["rnn1"], x, lengths, "lstm", fused=fused)
        ys1 = bilstm.layer_norm(p["ln"], ys1)
        _, h2 = bilstm.birnn(p["rnn2"], ys1, lengths, "lstm", fused=fused)
        H = h1.shape[-1] // 2
        return jnp.concatenate(
            [h1[:, :H], h2[:, :H], h1[:, H:], h2[:, H:]], axis=-1)

    def make_loss(mode):
        def loss(p, seed):
            if mode in ("fused", "fused_remat"):
                prev_remat = bilstm._SCAN_REMAT
                bilstm.set_scan_remat(mode == "fused_remat")
                try:
                    v = extract_xla(p["v"], xv + seed, lv, fused=True)
                    a = extract_xla(p["a"], xa + seed, la, fused=True)
                finally:
                    # restore the PRIOR value (ADVICE r2: hardcoding True left
                    # the process-global flag on after the 'fused' mode)
                    bilstm.set_scan_remat(prev_remat)
            elif mode == "pallas_multi":
                v, a = bilstm.extract_features_pair(
                    p["v"], p["a"], xv + seed, xa + seed, lv, la,
                    use_pallas_multi=True)
            elif mode == "pallas_r1":
                # round-1 kernel routes through _scan_direction's use_pallas
                # flag; enable it only around tracing
                pallas_flags.set_enabled(True)
                try:
                    v = bilstm.extract_features(p["v"], xv + seed, lv)
                    a = bilstm.extract_features(p["a"], xa + seed, la)
                finally:
                    pallas_flags.set_enabled(False)
            else:
                v = extract_xla(p["v"], xv + seed, lv, fused=False)
                a = extract_xla(p["a"], xa + seed, la, fused=False)
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
    for mode in ("twoscan", "fused", "fused_remat", "pallas_r1", "pallas_multi"):
        loss = make_loss(mode)
        results[f"{mode}_fwd"] = timed(loss, f"{mode} fwd")

        def loss_and_grads(p, s, _loss=loss):
            g = jax.grad(_loss)(p, s)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
        results[f"{mode}_fwdbwd"] = timed(loss_and_grads, f"{mode} fwd+bwd")

    print()
    for k, v in results.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
