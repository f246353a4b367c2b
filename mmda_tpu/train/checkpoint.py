"""Checkpointing: full train-state save/restore + best-on-dev export.

The reference saves model/optimizer state_dicts on every dev improvement
(reference src/solver.py:218-223) and only ever reloads the model for the final
test (:323-325) - optimizer state is written but never restored, and there is
no mid-run resume (SURVEY.md §5).  Here the WHOLE TrainState pytree (params,
optimizer state, step counter, PRNG key) round-trips atomically, giving real
preemption-safe resume; writes happen on a background thread (async
checkpointing) with an atomic rename so a preempted write never corrupts the
previous checkpoint.

Serialization: flax msgpack (framework-native, no pickle of arbitrary code).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


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


def _atomic_write(path: str, data: bytes) -> None:
    """Write via a UNIQUE temp file in the target dir, then rename.  A fixed
    '<path>.tmp' would let two concurrent writers interleave into one file and
    rename a corrupt checkpoint into place."""
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               prefix=os.path.basename(path) + ".tmp.")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
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
    payload = serialization.to_bytes(host_state)
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


def load_checkpoint(ckpt_dir: str, name: str, template: Any) -> Any:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


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
