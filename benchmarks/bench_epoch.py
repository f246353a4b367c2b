"""Full-epoch wall-clock on the real TPU — the north-star metric.

Runs the PRODUCTION path end-to-end: Trainer with the bucketed loader,
threaded device prefetch, compiled-epoch scan, per-epoch dev eval, and
checkpointing, on a MOSEI-sized synthetic dataset (16,326 train / 1,871 dev
/ 1,871 test utterances — the reference's split sizes — with a realistic
length distribution so every bucket is exercised).

Reports the steady-state (2nd) epoch time.  The reference's torch-CPU
trainer does ~2.8 utt/s on this host => a ~97-minute epoch; this path
measures the same work in seconds.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_epoch.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import make_dataset
    from mmda_tpu.train.loop import Trainer

    n_epoch = int(os.environ.get("BENCH_EPOCHS", "3"))
    # BENCH_COMPILED=1: chunked-scan train epochs (host-side stacking,
    # Trainer._run_compiled_epoch).  The round-2 rejection of compiled
    # epochs (11.1-12.5 s vs 8.9 free-running) measured the OLD device-side
    # stacking; the ROADMAP #11 host-stack rewrite was never re-timed on
    # hardware.  bench.py's fully pre-stacked scan reaches 18.25 ms/step vs
    # the 27.0 ms/step effective of free-running dispatch here — this hook
    # measures whether chunked scans close that gap in the real Trainer.
    compiled = os.environ.get("BENCH_COMPILED", "0") == "1"
    cfg = Config(
        use_bert=True, batch_size=64, compute_dtype="bfloat16",
        data="mosei", name="bench_epoch", n_epoch=n_epoch,
        bucket_sizes=(16, 32, 48), max_seq_len=48,
        # production defaults: per-step train (pipelines through the relay)
        # + compiled eval epoch
        compiled_epoch=compiled,
        scan_chunk=int(os.environ.get("BENCH_SCAN_CHUNK", "16")),
        ckpt_interval=1000,             # resume-ckpt serialization measured
                                        # separately below (it is host-CPU
                                        # bound: ~minutes/GB on this 1-core
                                        # host, fully overlappable on a
                                        # normal multi-core TPU host)
        ckpt_dir="/tmp/bench_epoch_ckpt", log_sinks=("stdout",),
    )
    # reference MOSEI split sizes (SURVEY.md §6: test 1,871)
    data = make_dataset(num_train=16326, num_dev=1871, num_test=1871,
                        max_len=48, seed=0)
    # realistic utterance-length spread so all buckets fire
    rng = np.random.default_rng(0)
    for split in data.values():
        n = len(split["lengths"])
        split["lengths"][:] = np.clip(
            rng.gamma(4.0, 5.0, size=n).astype(np.int32), 2, 48)

    tr = Trainer(cfg, data, use_mesh=False)
    summary = tr.train()
    hist = summary["history"]
    for h in hist:
        # eval_time_s / post_eval_time_s: round-5 phase attribution timers
        # (train/loop.py) — eval = dev epoch; post = ckpt dispatch + test
        # metrics + bookkeeping; the remainder vs total is train + collate
        phases = ""
        if "eval_time_s" in h:
            phases = (f"  [eval {h['eval_time_s']:7.2f} s, post-eval "
                      f"{h['post_eval_time_s']:7.2f} s]")
        print(f"epoch {int(h['epoch'])}: train {h['epoch_time_s']:8.2f} s  "
              f"total {h['epoch_total_time_s']:8.2f} s (incl. dev eval + "
              f"ckpt dispatch)  train_loss {h['train_loss']:.4f}{phases}")
    # the FINAL epoch always saves the resume checkpoint (loop exit), so use
    # the second-to-last epoch as the checkpoint-free steady state
    steady = hist[-2] if len(hist) > 1 else hist[-1]
    torch_cpu_epoch_s = 16326 / 2.82   # train-only torch-CPU baseline
    tt = steady["epoch_total_time_s"]
    print(f"\nsteady-state: train {steady['epoch_time_s']:.2f} s "
          f"({16326 / steady['epoch_time_s']:.0f} utt/s), full epoch "
          f"{tt:.2f} s incl. dev eval; torch-CPU train-only epoch "
          f"~{torch_cpu_epoch_s / 60:.0f} min => "
          f"{torch_cpu_epoch_s / steady['epoch_time_s']:.0f}x train-only, "
          f"{torch_cpu_epoch_s / tt:.0f}x even charging our eval against "
          f"their train")

    # the full-TrainState resume checkpoint, measured on its own (synchronous)
    import time

    from mmda_tpu.train import checkpoint as ckpt
    t0 = time.perf_counter()
    ckpt.save_checkpoint(cfg.ckpt_dir, "bench_ckpt_probe", tr.state,
                         {}, async_write=False)
    print(f"full-TrainState checkpoint (msgpack, 1-core host): "
          f"{time.perf_counter() - t0:.1f} s — amortize with --ckpt_interval "
          f"or overlap on multi-core hosts")


if __name__ == "__main__":
    main()
