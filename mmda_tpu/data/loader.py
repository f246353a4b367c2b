"""Host input pipeline: length-bucketed, fixed-shape batching with
double-buffered device prefetch.

Replaces the reference's torch DataLoader + per-batch collate
(reference src/data_loader.py:50-131), which re-tokenizes with BERT every
batch of every epoch in the training process (:86-88) and pads each batch to
its own max length (dynamic shapes -> would recompile under XLA).  Here:

  * features are pre-tokenized, fixed-shape arrays (ETL output or synthetic);
  * batches are cut per length-bucket so XLA compiles once per bucket size
    (SURVEY.md §5 long-context row: fixed length-bucketed padding);
  * short batches are padded with `sample_weight=0` rows so shapes never vary;
  * an async double-buffer `device_put`s the next batch (onto the DP-sharded
    layout when a mesh is given) while the current step runs - the
    "prefetching TPU-host feature pipeline" of the north star.
"""

from __future__ import annotations

import threading
from typing import Dict, Iterator, Optional, Sequence

import jax
import numpy as np

from mmda_tpu.models.misa import Batch
from mmda_tpu.parallel import mesh as pmesh

REQUIRED_KEYS = tuple(f for f in Batch._fields
                      if f not in ("sample_weight", "visual_lengths",
                                   "acoustic_lengths"))
OPTIONAL_KEYS = ("visual_lengths", "acoustic_lengths")
ARRAY_KEYS = tuple(Batch._fields)


def _trim(arrays: Dict[str, np.ndarray], idx: np.ndarray, t: int) -> Dict[str, np.ndarray]:
    """Select rows `idx` and trim time axes to bucket length `t`.  For
    UNALIGNED data (per-modality lengths present) visual/acoustic keep their
    own full time axes - buckets apply to the text stream only."""
    unaligned = "visual_lengths" in arrays
    out = {}
    for k, v in arrays.items():
        v = v[idx]
        if k == "text" or (k in ("visual", "acoustic") and not unaligned):
            v = v[:, :t]
        elif k in ("bert_ids", "bert_type", "bert_mask"):
            v = v[:, : t + 2]
        out[k] = v
    return out


def _pad_rows(arrays: Dict[str, np.ndarray], n: int) -> Dict[str, np.ndarray]:
    """Pad to n rows with zero rows; sample_weight marks them invalid.
    Padding rows get length 1 (not 0) so masked scans stay well-defined."""
    out = {}
    k0 = len(next(iter(arrays.values())))
    pad = n - k0
    for k, v in arrays.items():
        p = np.zeros((pad,) + v.shape[1:], v.dtype)
        if k in ("lengths", "visual_lengths", "acoustic_lengths"):
            p[:] = 1
        if k == "bert_mask":
            p[:, :1] = 1  # masked-mean denominator must stay nonzero
        out[k] = np.concatenate([v, p], axis=0)
    out["sample_weight"] = np.concatenate(
        [arrays.get("sample_weight", np.ones(k0, np.float32)), np.zeros(pad, np.float32)]
    )
    return out


def auto_bucket_sizes(lengths, n_buckets: int = 3) -> tuple:
    """Padding-OPTIMAL bucket boundaries for a length distribution
    (`--bucket_sizes auto[,K]`, round 4).

    Exact DP over the length histogram: a bucket with boundary u_j pads
    every row it covers to u_j, so its token cost is u_j * count(rows in
    bucket); minimize the total over K buckets.  U unique lengths ->
    O(U^2 K), trivial at utterance scale.  The top boundary is always the
    max length (nothing may overflow).  Returns a sorted tuple of K (or
    fewer, if U < K) boundaries.

    Static-shape discipline is preserved: K is fixed, so the compiled
    program count is unchanged — only the boundaries move to where the
    data actually is (the reference pads per-batch to the batch max,
    src/data_loader.py:70-72, which would recompile under XLA every batch)."""
    lengths = np.asarray(lengths)
    uniq, counts = np.unique(lengths[lengths > 0], return_counts=True)
    U = len(uniq)
    k = min(int(n_buckets), U)
    if U == 0:
        raise ValueError("auto_bucket_sizes: no positive lengths")
    csum = np.concatenate([[0], np.cumsum(counts)])
    # cost[i][j]: one bucket covering uniq[i..j] inclusive, padded to uniq[j]
    INF = float("inf")
    dp = np.full((k + 1, U + 1), INF)
    arg = np.zeros((k + 1, U + 1), np.int64)
    dp[0][0] = 0.0
    for kk in range(1, k + 1):
        for j in range(1, U + 1):
            best, besti = INF, 0
            for i in range(kk - 1, j):
                c = dp[kk - 1][i] + float(uniq[j - 1]) * (csum[j] - csum[i])
                if c < best:
                    best, besti = c, i
            dp[kk][j], arg[kk][j] = best, besti
    bounds = []
    j = U
    for kk in range(k, 0, -1):
        bounds.append(int(uniq[j - 1]))
        j = arg[kk][j]
    return tuple(sorted(set(bounds)))


def padded_token_fraction(lengths, bucket_sizes) -> float:
    """Fraction of padded (wasted) tokens under the given buckets — the
    measurable the auto policy optimizes."""
    lengths = np.asarray(lengths, np.int64)
    b = np.sort(np.asarray(bucket_sizes, np.int64))
    padded_to = b[np.minimum(np.searchsorted(b, lengths, side="left"),
                             len(b) - 1)]
    padded_to = np.maximum(padded_to, lengths)
    return float(1.0 - lengths.sum() / padded_to.sum())


class ArrayLoader:
    """Iterate fixed-shape `Batch`es over a dict-of-arrays split."""

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        bucket_sizes: Optional[Sequence[int]] = None,
        seed: int = 0,
        mesh=None,
        prefetch: int = 2,
    ):
        missing = set(REQUIRED_KEYS) - set(data)
        if missing:
            raise ValueError(f"split missing arrays: {sorted(missing)}")
        self.data = dict(data)
        if "sample_weight" not in self.data:
            self.data["sample_weight"] = np.ones(
                len(self.data["lengths"]), np.float32)
        self.n = len(self.data["lengths"])
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.mesh = mesh
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

        t_max = self.data["text"].shape[1]
        buckets = sorted(b for b in (bucket_sizes or [t_max]) if b <= t_max)
        if not buckets or buckets[-1] < t_max:
            buckets = list(buckets) + [t_max]
        self.bucket_sizes = buckets
        lengths = self.data["lengths"]
        self._bucket_of = np.searchsorted(np.asarray(buckets), lengths, side="left")

    def __len__(self) -> int:
        if self.drop_last:
            return sum(
                int(np.sum(self._bucket_of == b)) // self.batch_size
                for b in range(len(self.bucket_sizes))
            )
        return sum(
            -(-int(np.sum(self._bucket_of == b)) // self.batch_size)
            for b in range(len(self.bucket_sizes))
            if np.sum(self._bucket_of == b)
        )

    def host_batches_grouped(self) -> Dict[tuple, list]:
        """One epoch of host-side batches, grouped by text shape (= bucket),
        each batch filtered to the Batch fields.  Public API for compiled
        (scanned) epoch paths that stack same-shape batches into one dispatch
        (Trainer.evaluate, train/step.py::make_eval_epoch consumers)."""
        groups: Dict[tuple, list] = {}
        for arrays in self._host_batches():
            arrays = {k: arrays.get(k) for k in ARRAY_KEYS}
            groups.setdefault(arrays["text"].shape, []).append(arrays)
        return groups

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(self.n)
        if self.shuffle:
            order = self._rng.permutation(self.n)
        self._epoch += 1
        plan = []  # (bucket_idx, row_indices)
        for b, t in enumerate(self.bucket_sizes):
            rows = order[self._bucket_of[order] == b]
            for i in range(0, len(rows), self.batch_size):
                chunk = rows[i : i + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    continue
                plan.append((t, chunk))
        if self.shuffle and len(self.bucket_sizes) > 1:
            self._rng.shuffle(plan)
        for t, chunk in plan:
            arrays = _trim(self.data, chunk, t)
            if len(chunk) < self.batch_size:
                arrays = _pad_rows(arrays, self.batch_size)
            yield arrays

    def __iter__(self) -> Iterator[Batch]:
        def to_device(arrays):
            b = Batch(**{k: arrays.get(k) for k in ARRAY_KEYS})
            if self.mesh is not None:
                return pmesh.shard_batch(b, self.mesh)
            return jax.tree_util.tree_map(jax.device_put, b)

        if self.prefetch <= 0:
            for arrays in self._host_batches():
                yield to_device(arrays)
            return
        yield from _prefetch_iter(self._host_batches(), to_device, self.prefetch)


def _prefetch_iter(host_iter, to_device, depth: int):
    """Background-thread prefetch: `device_put` of upcoming batches overlaps
    with the current step's device compute (H2D rides its own stream).  The
    queue is bounded at `depth` so host memory stays flat."""
    import queue as _queue

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    done = object()

    def producer():
        # an exception mid-epoch must surface in the consumer, not silently
        # truncate the epoch (training would continue on partial data)
        try:
            for arrays in host_iter:
                q.put(to_device(arrays))
            q.put(done)
        except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
            q.put(exc)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
