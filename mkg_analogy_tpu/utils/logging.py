"""Metric logging: stdout + JSONL (+ TensorBoard when available).

Metric names match the reference exactly ("Eval_entity/hits10", …,
lit_models/transformer.py:185-193) so downstream tooling reads the same
keys.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self.log_dir = log_dir
        self._file = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{name}_metrics.jsonl"), "a")
            try:  # TensorBoard is optional
                from flax.metrics import tensorboard  # type: ignore

                self._tb = tensorboard.SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        record = {("%s%s" % (prefix, k)): float(v) for k, v in metrics.items()}
        record["step"] = step
        record["time"] = time.time()
        line = " ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
            if k != "time"
        )
        print(f"[metrics] {line}", flush=True)
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb:
            for k, v in record.items():
                if k not in ("step", "time"):
                    self._tb.scalar(k, v, step)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.flush()
