"""Raw-tensor checkpoint codec (round 5).

`flax.serialization.to_bytes` measured 43 s for a 1.76 GB bert-base
TrainState on the 1-core host (~41 MB/s: msgpack re-encodes every array
through Python), which was the single largest non-train term in the epoch
wall-clock (38.2 s/save, benchmarks/RESULTS.md round-5).  This codec keeps
flax's STRUCTURE layer (`to_state_dict` / `from_state_dict`, so TrainState
and every registered dataclass round-trips identically) and replaces only
the BYTES layer with a JSON header + concatenated raw array buffers:

    MMDAFSR1 | header_len (8 bytes LE) | header JSON | leaf bytes...

Header leaves are listed in tree_flatten order with {path, dtype, shape,
offset, nbytes}; Python int/float/bool/None/str leaves inline into the
header.  bf16 works through ml_dtypes' numpy registration (jax imports it).

Loaders SNIFF the magic, so legacy flax-msgpack checkpoints keep loading
through the same entry points (train/checkpoint.py) and the on-disk
filename stays `*.msgpack` for artifact-path stability; the .json metadata
records the codec.  Replaces the torch.save/load pair of the reference
(/root/reference/src/utils/tools.py:15-49) at raw-memcpy speed.
"""

from __future__ import annotations

import json
from typing import Any, List, Tuple

import numpy as np
from flax import serialization

MAGIC = b"MMDAFSR1"
_INLINE = (bool, int, float, str, type(None))  # bool before int (subclass)
_EMPTY_DICT = object()  # sentinel: an empty sub-dict that must round-trip


def _flatten(state_dict: Any, prefix: str, out: List[Tuple[str, Any]]):
    """Deterministic (path, leaf) list over the nested state dict.  flax
    state dicts are plain dicts (lists become {'0': ..} upstream), so dict
    recursion is sufficient; anything else is a leaf."""
    if isinstance(state_dict, dict):
        if not state_dict:
            # e.g. optax set_to_zero inner states: flax's restore requires
            # the (empty) key to exist, so record it explicitly
            out.append((prefix, _EMPTY_DICT))
            return
        for k in sorted(state_dict):
            if "/" in k:
                raise ValueError(
                    f"fastser paths use '/' as separator; key {k!r} under "
                    f"{prefix!r} would corrupt the header — use the flax "
                    "codec (MMDA_CKPT_CODEC=flax) for this tree")
            _flatten(state_dict[k], f"{prefix}/{k}", out)
    else:
        out.append((prefix, state_dict))


def is_fastser(data: bytes) -> bool:
    return data[: len(MAGIC)] == MAGIC


def to_bytes(target: Any) -> bytes:
    """Serialize like flax.serialization.to_bytes.  Prefer to_chunks for
    file writes: the 1-core host moves memory at ~170 MB/s, so skipping the
    join's extra full pass saves ~40% of a GB-scale save."""
    return b"".join(to_chunks(target))


def to_chunks(target: Any) -> List[Any]:
    """[header bytes, leaf buffer, ...] — write sequentially to a file (or
    b''.join for an in-memory payload).  Buffers are zero-copy memoryviews
    where the dtype allows."""
    leaves: List[Tuple[str, Any]] = []
    _flatten(serialization.to_state_dict(target), "", leaves)
    header = []
    buffers: List[bytes] = []
    offset = 0
    for path, leaf in leaves:
        if leaf is _EMPTY_DICT:
            header.append({"path": path, "empty_dict": True})
            continue
        if isinstance(leaf, _INLINE) and not isinstance(leaf, np.generic):
            header.append({"path": path, "value": leaf})
            continue
        arr = np.asarray(leaf)
        if not arr.flags["C_CONTIGUOUS"]:
            arr = np.ascontiguousarray(arr)
        header.append({"path": path, "dtype": arr.dtype.name,
                       "shape": list(arr.shape), "offset": offset,
                       "nbytes": arr.nbytes})
        if arr.nbytes == 0:
            buffers.append(b"")
        else:
            try:
                buffers.append(arr.data)       # zero-copy memoryview
            except ValueError:
                # ml_dtypes (bfloat16/float8) lack the buffer protocol
                buffers.append(arr.tobytes())
        offset += arr.nbytes
    hdr = json.dumps(header).encode()
    return [MAGIC + len(hdr).to_bytes(8, "little") + hdr, *buffers]


def _dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # registered by jax; covers bfloat16/float8_*

        return np.dtype(getattr(ml_dtypes, name))


def from_bytes(target: Any, data: bytes) -> Any:
    """Restore into the structure of `target` (flax from_state_dict
    semantics: shapes/dtypes validated by the caller's template use).
    Array leaves are zero-copy views into `data`."""
    if not is_fastser(data):
        raise ValueError("not a fastser payload (bad magic)")
    n = int.from_bytes(data[8:16], "little")
    header = json.loads(data[16:16 + n].decode())
    base = 16 + n
    flat = {}
    for ent in header:
        if ent.get("empty_dict"):
            flat[ent["path"]] = {}
            continue
        if "value" in ent or ("dtype" not in ent):
            flat[ent["path"]] = ent.get("value")
            continue
        dt = _dtype(ent["dtype"])
        o = base + ent["offset"]
        arr = np.frombuffer(data, dtype=dt, count=ent["nbytes"] // dt.itemsize,
                            offset=o).reshape(ent["shape"])
        flat[ent["path"]] = arr
    # rebuild the nested dict, then let flax map it onto the target structure
    nested: dict = {}
    for path, leaf in flat.items():
        parts = path.strip("/").split("/")
        d = nested
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = leaf
    return serialization.from_state_dict(target, nested)
