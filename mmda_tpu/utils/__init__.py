"""Utility re-exports (the reference re-exports its utils the same way,
src/utils/__init__.py:1-3)."""

from mmda_tpu.utils.convert import to_device, to_host
from mmda_tpu.utils.logging import MetricLogger
from mmda_tpu.utils.metrics import get_accuracy, get_metrics, select_by_eval_mode
from mmda_tpu.utils.sentiment_metrics import (
    eval_binary,
    eval_mosei_senti,
    eval_mosi,
    extreme_mae,
    multiclass_acc,
    weighted_accuracy,
)
from mmda_tpu.utils.timing import StepTimer, debug_mode, profile, time_desc_decorator

__all__ = [
    "to_device", "to_host", "MetricLogger",
    "get_accuracy", "get_metrics", "select_by_eval_mode",
    "eval_binary", "eval_mosei_senti", "eval_mosi", "extreme_mae",
    "multiclass_acc", "weighted_accuracy",
    "StepTimer", "debug_mode", "profile", "time_desc_decorator",
]
