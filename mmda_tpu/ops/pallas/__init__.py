"""Pallas TPU kernels (flagged, always with an XLA fallback).

`set_enabled(True)` routes supported ops through the fused kernels; the
default is off so every path works on any backend.  The Trainer enables it
from cfg.use_pallas when running on TPU.
"""

_ENABLED = False


def set_enabled(value: bool) -> None:
    global _ENABLED
    _ENABLED = bool(value)


def is_enabled() -> bool:
    return _ENABLED
