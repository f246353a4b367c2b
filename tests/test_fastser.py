"""Raw-tensor checkpoint codec (train/fastser.py, round 5).

flax msgpack measured 41 MB/s on the 1-core host (43 s per bert-base
TrainState save — the largest non-train epoch term, benchmarks/RESULTS.md
round-5); fastser replaces only the bytes layer and keeps flax's
to_state_dict/from_state_dict structure layer, so everything that
round-tripped before round-trips bit-identically now.  Loads sniff the
magic, so legacy flax-msgpack files keep loading through the same
train/checkpoint.py entry points.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import serialization

from mmda_tpu.train import checkpoint as ckpt
from mmda_tpu.train import fastser

RNG = np.random.default_rng(11)


def _state():
    return {
        "params": {"dense": {"kernel": RNG.normal(size=(16, 8)).astype(np.float32),
                             "bias": np.zeros(8, np.float32)},
                   "emb": RNG.normal(size=(32, 4)).astype(np.float32)},
        "opt": {"count": np.asarray(7, np.int32),
                "mu": {"w": RNG.normal(size=(3, 3)).astype(np.float32)},
                "frozen": {}},       # empty sub-dict must round-trip
        "step": 1234,                 # python int inlines into the header
        "flag": True,
        "note": None,
        "rng": np.arange(2, dtype=np.uint32),
        "bf16": np.asarray(jnp.asarray(RNG.normal(size=(8, 8)), jnp.bfloat16)),
        "scalar0d": np.float32(2.5),  # np scalar -> 0-d array leaf
    }


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        assert x.shape == y.shape
        assert np.array_equal(x, y)


def test_roundtrip_exact_including_bf16_and_empty_dicts():
    s = _state()
    back = fastser.from_bytes(s, fastser.to_bytes(s))
    _assert_trees_equal(s, back)
    assert back["opt"]["frozen"] == {}
    assert back["step"] == 1234 and isinstance(back["step"], int)
    assert back["note"] is None and back["flag"] is True
    assert np.asarray(back["bf16"]).dtype == jnp.bfloat16


def test_chunks_equal_joined_bytes():
    s = _state()
    assert b"".join(bytes(c) for c in fastser.to_chunks(s)) == \
        fastser.to_bytes(s)


def test_magic_sniff_and_flax_fallback(tmp_path):
    """A legacy flax-msgpack checkpoint written before round 5 must load
    through the SAME load_checkpoint entry point (codec sniffing)."""
    s = _state()
    legacy = serialization.to_bytes(s)
    assert not fastser.is_fastser(legacy)
    with open(tmp_path / "old.msgpack", "wb") as f:
        f.write(legacy)
    back = ckpt.load_checkpoint(str(tmp_path), "old", s)
    _assert_trees_equal(s, back)


def test_save_load_checkpoint_uses_fast_codec(tmp_path):
    s = _state()
    ckpt.save_checkpoint(str(tmp_path), "m", s)
    with open(tmp_path / "m.msgpack", "rb") as f:
        head = f.read(8)
    assert head == fastser.MAGIC
    back = ckpt.load_checkpoint(str(tmp_path), "m", s)
    _assert_trees_equal(s, back)


def test_codec_env_forces_flax(tmp_path, monkeypatch):
    monkeypatch.setenv("MMDA_CKPT_CODEC", "flax")
    s = _state()
    ckpt.save_checkpoint(str(tmp_path), "m", s)
    with open(tmp_path / "m.msgpack", "rb") as f:
        head = f.read(8)
    assert head != fastser.MAGIC
    back = ckpt.load_checkpoint(str(tmp_path), "m", s)  # sniff still works
    _assert_trees_equal(s, back)


def test_slash_in_key_raises():
    with pytest.raises(ValueError, match="separator"):
        fastser.to_bytes({"a/b": np.zeros(2, np.float32)})
