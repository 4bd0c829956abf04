"""Metrics logging: JSONL to stdout + optional TensorBoard scalars.

Lineage: log_string() to log_train.txt + TB scalars (SURVEY.md §5
"Metrics / logging / observability"). TB is optional and lazily imported;
everything works without it.
"""

from __future__ import annotations

import json
import sys


class MetricsLogger:
    def __init__(self, tb_dir: str = ""):
        self._tb = None
        if tb_dir:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(tb_dir)
            except Exception as e:  # TB genuinely optional
                print(f"tensorboard unavailable ({e}); JSONL only",
                      file=sys.stderr)

    def log(self, step: int, scalars: dict, prefix: str = ""):
        rec = {"step": step}
        rec.update(
            {f"{prefix}{k}": v for k, v in scalars.items()
             if isinstance(v, (int, float))}
        )
        print(json.dumps(rec), flush=True)
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.scalar(f"{prefix}{k}", v, step)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
