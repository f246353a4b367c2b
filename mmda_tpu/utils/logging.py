"""Structured metric logging with pluggable sinks (stdout / JSONL / wandb).

Replaces the reference's inline wandb.log + hypertune + print observability
(reference src/train.py:40-41, src/solver.py:244-289).  Metric names are kept
wandb-compatible (train_loss, valid_loss, test_f_score, ...) for dashboard
parity; wandb itself is optional and off by default (zero-egress safe).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional, Sequence


class MetricLogger:
    def __init__(self, sinks: Sequence[str] = ("stdout",), run_name: str = "run",
                 log_dir: str = "logs", wandb_project: str = "MISA-classification"):
        self.sinks = tuple(sinks)
        self.run_name = run_name
        self._jsonl = None
        self._wandb = None
        if "jsonl" in self.sinks:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, f"{run_name}.jsonl"), "a")
        if "wandb" in self.sinks:
            try:
                import wandb

                wandb.init(project=wandb_project, name=run_name)
                self._wandb = wandb
            except Exception as e:  # offline / not installed: degrade gracefully
                print(f"[logging] wandb unavailable ({e}); dropping sink", file=sys.stderr)
        self._hypertune = None
        if "hypertune" in self.sinks:
            # Google Cloud hypertune report (reference src/solver.py:285-289)
            try:
                import hypertune

                self._hypertune = hypertune.HyperTune()
            except Exception as e:
                print(f"[logging] hypertune unavailable ({e}); dropping sink",
                      file=sys.stderr)

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        payload = {k: (float(v) if hasattr(v, "__float__") else v)
                   for k, v in metrics.items()}
        if step is not None:
            payload["step"] = step
        payload["time"] = time.time()
        if "stdout" in self.sinks:
            shown = {k: (round(v, 5) if isinstance(v, float) else v)
                     for k, v in payload.items() if k != "time"}
            print(f"[{self.run_name}] {shown}", flush=True)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(payload) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in payload.items() if k != "time"})
        if self._hypertune is not None and "test_acc2" in payload:
            # same tag/value as the reference (src/solver.py:285-289)
            self._hypertune.report_hyperparameter_tuning_metric(
                hyperparameter_metric_tag="accuracy",
                metric_value=payload["test_acc2"],
                global_step=int(payload.get("epoch", 0)))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
