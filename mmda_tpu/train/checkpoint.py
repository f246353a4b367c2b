"""Checkpointing: full train-state save/restore + best-on-dev export.

The reference saves model/optimizer state_dicts on every dev improvement
(reference src/solver.py:218-223) and only ever reloads the model for the final
test (:323-325) - optimizer state is written but never restored, and there is
no mid-run resume (SURVEY.md §5).  Here the WHOLE TrainState pytree (params,
optimizer state, step counter, PRNG key) round-trips atomically, giving real
preemption-safe resume; writes happen on a background thread (async
checkpointing) with an atomic rename so a preempted write never corrupts the
previous checkpoint.

Serialization: the raw-tensor fastser codec by default (train/fastser.py —
flax msgpack measured 41 MB/s on the 1-core host, 43 s per bert-base
TrainState save; fastser is ~memcpy speed).  Loads SNIFF the payload magic,
so legacy flax-msgpack checkpoints keep loading; MMDA_CKPT_CODEC=flax
forces the legacy writer.  No pickle of arbitrary code either way.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from mmda_tpu.train import fastser


def _ser(tree: Any):
    """Payload for _atomic_write: a chunk list (fastser, streamed to the
    file without a join pass — the 1-core host moves memory at ~170 MB/s)
    or a single bytes (legacy flax codec, MMDA_CKPT_CODEC=flax)."""
    if os.environ.get("MMDA_CKPT_CODEC", "fast") == "flax":
        return serialization.to_bytes(tree)
    return fastser.to_chunks(tree)


def _deser(template: Any, data: bytes) -> Any:
    if fastser.is_fastser(data):
        return fastser.from_bytes(template, data)
    return serialization.from_bytes(template, data)


def _to_host(tree: Any) -> Any:
    # ONE batched device->host transfer for the whole pytree: per-leaf
    # np.asarray costs a ~32 ms relay round trip EACH through the axon
    # tunnel (benchmarks/RESULTS.md), i.e. seconds for a TrainState with
    # hundreds of leaves.  jax.device_get batches them.
    return jax.device_get(tree)


# One lock per checkpoint path: two async saves of the same name (e.g. a slow
# ~GB `last_*` write outlasting an epoch) must not interleave; distinct names
# still write concurrently.  A per-path sequence number additionally drops a
# stale write that only wins the lock AFTER a newer snapshot already landed.
_write_locks: Dict[str, threading.Lock] = {}
_issued_seq: Dict[str, int] = {}
_committed_seq: Dict[str, int] = {}
_write_locks_guard = threading.Lock()


def _lock_for(path: str) -> threading.Lock:
    with _write_locks_guard:
        return _write_locks.setdefault(path, threading.Lock())


def _next_seq(path: str) -> int:
    with _write_locks_guard:
        seq = _issued_seq.get(path, 0) + 1
        _issued_seq[path] = seq
        return seq


def _atomic_write(path: str, data) -> None:
    """Write via a UNIQUE temp file in the target dir, then rename.  A fixed
    '<path>.tmp' would let two concurrent writers interleave into one file and
    rename a corrupt checkpoint into place.  `data`: bytes, or a list of
    buffer-like chunks written sequentially (fastser.to_chunks)."""
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               prefix=os.path.basename(path) + ".tmp.")
    try:
        with os.fdopen(fd, "wb") as f:
            if isinstance(data, (bytes, bytearray, memoryview)):
                f.write(data)
            else:
                for chunk in data:
                    f.write(chunk)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_checkpoint(
    ckpt_dir: str,
    name: str,
    state: Any,
    metadata: Optional[Dict] = None,
    async_write: bool = False,
) -> threading.Thread | None:
    """Serialize `state` to {ckpt_dir}/{name}.msgpack (+ .json metadata).

    Atomic: writes to a temp file then renames.  With async_write=True the
    device->host transfer happens synchronously (cheap) and the disk write on a
    daemon thread; returns the thread so callers can join before exit.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = _to_host(state)
    payload = _ser(host_state)
    meta = dict(metadata or {})

    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    seq = _next_seq(path)

    def write():
        with _lock_for(path):
            if _committed_seq.get(path, 0) > seq:
                return  # a newer snapshot already landed; don't regress
            _committed_seq[path] = seq
            _atomic_write(path, payload)
            _atomic_write(
                os.path.join(ckpt_dir, f"{name}.json"),
                json.dumps(meta, indent=2, default=str).encode())

    if async_write:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        return t
    write()
    return None


# ---------------------------------------------------------------------------
# Incremental checkpointing: frozen base written once, trainable deltas per
# interval (VERDICT r2 weak #5: full-TrainState saves burned 24-62 s/save
# re-serializing frozen BERT weights that never change)
# ---------------------------------------------------------------------------

_FROZEN_BASE_FMT = "frozen_base_{digest}.msgpack"
# Cache the base digest per (ckpt_dir, name): frozen leaves are immutable for
# the life of a run (the optimizer applies set_to_zero updates), so the
# expensive read-back + hash of the base happens ONCE per process.
_base_digest_cache: Dict[str, str] = {}


def _path_leaves(tree: Any):
    """[(keystr(path), leaf), ...] in flatten order."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def _split_params(params: Any, frozen: Any) -> Tuple[Dict, Dict]:
    """Split params into ({path: trainable_leaf}, {path: frozen_leaf}) using
    the bool pytree `frozen` (same structure, True == frozen)."""
    p = _path_leaves(params)
    f = jax.tree_util.tree_leaves(frozen)
    assert len(p) == len(f), "frozen mask must mirror the param structure"
    trainable = {k: v for (k, v), fz in zip(p, f) if not fz}
    frozen_leaves = {k: v for (k, v), fz in zip(p, f) if fz}
    return trainable, frozen_leaves


def save_checkpoint_incremental(
    ckpt_dir: str,
    name: str,
    state: Any,
    frozen: Any,
    metadata: Optional[Dict] = None,
    async_write: bool = False,
) -> threading.Thread | None:
    """Save a TrainState as (one-time content-addressed frozen base) +
    (per-interval delta of trainable leaves, opt state, step, rng).

    The delta lands at {name}.inc.msgpack (+ .json metadata recording the
    base digest); the base at frozen_base_{digest}.msgpack, written only if
    absent.  Load with load_checkpoint_incremental and the same frozen mask.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    trainable, frozen_leaves = _split_params(state.params, frozen)

    cache_key = os.path.join(ckpt_dir, name)
    base_digest = _base_digest_cache.get(cache_key)
    base_payload = None
    if base_digest is None and frozen_leaves:
        base_bytes = _ser(_to_host(frozen_leaves))
        h = hashlib.sha256()
        for chunk in ([base_bytes] if isinstance(base_bytes, bytes)
                      else base_bytes):
            h.update(chunk)
        base_digest = h.hexdigest()[:16]
        base_path = os.path.join(
            ckpt_dir, _FROZEN_BASE_FMT.format(digest=base_digest))
        if not os.path.exists(base_path):
            base_payload = (base_path, base_bytes)
        _base_digest_cache[cache_key] = base_digest

    delta = {
        "trainable": trainable,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    # EMA shadow (ADVICE r3 medium): without this a resumed ema_decay>0 run
    # silently dropped the polyak average (load rebuilt ema_params=None and
    # _ema_update is identity on None), flipping eval to live params.  Only
    # the trainable split is stored: frozen leaves receive set_to_zero
    # updates, so their EMA stays (numerically) pinned at the frozen base.
    ema = getattr(state, "ema_params", None)
    if ema is not None:
        delta["ema_trainable"] = _split_params(ema, frozen)[0]
    payload = _ser(_to_host(delta))
    meta = dict(metadata or {})
    meta["incremental"] = True
    meta["base_digest"] = base_digest
    meta["has_ema"] = ema is not None

    path = os.path.join(ckpt_dir, f"{name}.inc.msgpack")
    seq = _next_seq(path)

    def write():
        if base_payload is not None:
            _atomic_write(*base_payload)   # base commits before any delta
        with _lock_for(path):
            if _committed_seq.get(path, 0) > seq:
                return
            _committed_seq[path] = seq
            _atomic_write(path, payload)
            _atomic_write(
                os.path.join(ckpt_dir, f"{name}.inc.json"),
                json.dumps(meta, indent=2, default=str).encode())

    if async_write:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        return t
    write()
    return None


def incremental_checkpoint_exists(ckpt_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, f"{name}.inc.msgpack"))


def load_checkpoint_incremental(ckpt_dir: str, name: str, template: Any,
                                frozen: Any) -> Any:
    """Restore a TrainState saved by save_checkpoint_incremental.  `template`
    is a TrainState with the target structure/shapes (frozen leaves are taken
    from the recorded base file; trainable leaves, opt state, step and rng
    from the delta)."""
    with open(os.path.join(ckpt_dir, f"{name}.inc.json")) as f:
        meta = json.load(f)

    t_trainable, t_frozen = _split_params(template.params, frozen)
    delta_template = {"trainable": t_trainable, "opt_state": template.opt_state,
                      "step": template.step, "rng": template.rng}
    has_ema = meta.get("has_ema", False)
    if has_ema:
        # params leaves double as the shape/dtype template for the EMA split
        # (ema_params mirrors params structure) so restore works even when
        # the template TrainState was built with ema_params=None
        delta_template["ema_trainable"] = dict(t_trainable)
    with open(os.path.join(ckpt_dir, f"{name}.inc.msgpack"), "rb") as f:
        delta = _deser(delta_template, f.read())

    frozen_restored: Dict = {}
    if t_frozen:
        base_path = os.path.join(
            ckpt_dir, _FROZEN_BASE_FMT.format(digest=meta["base_digest"]))
        with open(base_path, "rb") as f:
            frozen_restored = _deser(t_frozen, f.read())

    flat = jax.tree_util.tree_flatten_with_path(template.params)

    def _merge(trainable_leaves: Dict) -> Any:
        merged = dict(trainable_leaves)
        merged.update(frozen_restored)
        leaves = [merged[jax.tree_util.keystr(path)] for path, _ in flat[0]]
        return jax.tree_util.tree_unflatten(flat[1], leaves)

    ema = _merge(delta["ema_trainable"]) if has_ema else None
    return type(template)(step=delta["step"], params=_merge(delta["trainable"]),
                          opt_state=delta["opt_state"], rng=delta["rng"],
                          ema_params=ema)


def load_checkpoint(ckpt_dir: str, name: str, template: Any) -> Any:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    return _deser(template, data)


def load_metadata(ckpt_dir: str, name: str) -> Dict:
    path = os.path.join(ckpt_dir, f"{name}.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def checkpoint_exists(ckpt_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, f"{name}.msgpack"))


def save_hidden(cfg, hidden, dataset: str = "") -> str:
    """Persist fused hidden representations (reference save_hidden parity,
    src/utils/tools.py:52-60; naming hidden_vectors/MISA[_C]_{dataset})."""
    import numpy as np

    os.makedirs("hidden_vectors", exist_ok=True)
    suffix = "_C" if cfg.use_confidNet else ""
    path = f"hidden_vectors/{cfg.model}{suffix}_{dataset or cfg.data}.npz"
    np.savez_compressed(path, hidden=np.asarray(hidden))
    return path


def load_hidden(cfg, dataset: str = ""):
    """Load previously saved hidden vectors (src/utils/tools.py:63-72)."""
    import numpy as np

    suffix = "_C" if cfg.use_confidNet else ""
    path = f"hidden_vectors/{cfg.model}{suffix}_{dataset or cfg.data}.npz"
    with np.load(path) as z:
        return z["hidden"]


def best_model_name(cfg) -> str:
    """Best-on-dev export name, mirroring the reference artifact naming
    best_model_MISA[_C]_{dataset}.pt (src/utils/tools.py:15-21)."""
    suffix = "_C" if cfg.use_confidNet else ""
    return f"best_model_{cfg.model}{suffix}_{cfg.data}"
