"""One bounded attempt at a device profile through the axon relay.

VERDICT r4 item 7: round 2 recorded "the relay doesn't expose xprof"
(RESULTS.md:393-400); this retries once with current jax before that stands
permanently.  Traces (a) a jit'd matmul loop and (b) one real MISA train
step under jax.profiler.trace, then inventories what landed on disk — if an
.xplane.pb appears with non-trivial size, device-level attribution (VERDICT
item 3) gets ground truth; otherwise this prints a dated failure note for
RESULTS.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_probe.py
"""

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/xprof_probe"


def inventory(root):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def main():
    import jax
    import jax.numpy as jnp

    print(f"date: {datetime.date.today().isoformat()}  jax {jax.__version__}  "
          f"devices: {jax.devices()}")

    os.makedirs(TRACE_DIR, exist_ok=True)

    # (a) trivial program: is the trace machinery alive at all?
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((2048, 2048), jnp.bfloat16)
    f(x).block_until_ready()          # compile outside the trace
    try:
        with jax.profiler.trace(os.path.join(TRACE_DIR, "matmul")):
            for _ in range(5):
                f(x).block_until_ready()
        print("matmul trace: no exception")
    except Exception as e:  # noqa: BLE001 — report, don't crash the queue
        print(f"matmul trace FAILED: {type(e).__name__}: {e}")

    # (b) one real train step (the thing item 3 wants attributed) — same
    # setup as bench.py's cost_analysis block, compiled OUTSIDE the trace
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        from mmda_tpu.config import Config
        from mmda_tpu.data.synthetic import SyntheticSpec, make_split
        from mmda_tpu.models import Batch, get_model
        from mmda_tpu.models.bert import BertConfig, frozen_mask
        from mmda_tpu.ops import pallas as pallas_flags
        from mmda_tpu.train.state import create_train_state, make_optimizer
        from mmda_tpu.train.step import make_train_step

        cfg = Config(use_bert=True, batch_size=64, max_seq_len=48,
                     compute_dtype="bfloat16", data="mosei", name="probe")
        bert_cfg = BertConfig.base()
        pallas_flags.set_enabled(jax.default_backend() == "tpu")
        init_fn, fwd_fn = get_model(cfg.model)
        params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
        frozen = jax.tree_util.tree_map(lambda _: False, params)
        frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
        tx = make_optimizer(cfg, frozen)
        state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
        split = make_split(SyntheticSpec(num_examples=64, max_len=48, seed=0))
        split["lengths"][:] = 48
        split["bert_mask"][:] = 1
        batch = Batch(**{k: jax.device_put(jnp.asarray(v))
                         for k, v in split.items()})
        step = jax.jit(make_train_step(cfg, tx, fwd_fn, bert_cfg,
                                       donate=False, frozen=frozen))
        state, losses = step(state, batch)      # compile outside the trace
        _ = float(losses["total"])
        with jax.profiler.trace(os.path.join(TRACE_DIR, "train_step")):
            for _ in range(3):
                state, losses = step(state, batch)
                _ = float(losses["total"])
        print("train-step trace: no exception")
    except Exception as e:  # noqa: BLE001
        print(f"train-step trace FAILED: {type(e).__name__}: {e}")

    files = inventory(TRACE_DIR)
    print(f"\ntrace dir inventory ({len(files)} files):")
    device_bytes = 0
    for rel, size in files:
        print(f"  {size:>12,}  {rel}")
        if rel.endswith(".xplane.pb"):
            device_bytes += size
    if device_bytes > 50_000:
        print(f"\nVERDICT: xplane data present ({device_bytes:,} B) — the "
              f"relay DOES expose profiling now; copy {TRACE_DIR} into "
              f"benchmarks/ and use it for item-3 attribution")
    elif files:
        print("\nVERDICT: trace files exist but no substantial .xplane.pb — "
              "host-side trace only; device attribution still unavailable "
              "through the relay")
    else:
        print("\nVERDICT: no trace output at all — profiler unavailable "
              "through the relay (matches the round-2 finding)")


if __name__ == "__main__":
    main()
