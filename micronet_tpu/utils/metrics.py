"""Structured training metrics — JSONL sink.

The reference's observability is ``print()`` lines only (SURVEY.md §5:
per-100-batch loss/LR, per-epoch test acc — no tensorboard/wandb/logging
module). The TPU-native framework keeps those human lines AND appends
machine-readable rows to a JSONL file, so dashboards/regression tooling
can consume runs without scraping stdout.

One row per event::

    {"event": "epoch", "epoch": 3, "loss": 1.71, "lr": 1e-3,
     "img_per_s": 5891.2, "seconds": 12.4}
    {"event": "eval", "epoch": 3, "acc": 0.874, "best_acc": 0.881}

Files are APPEND-only: a preemption restart (``--auto_resume``) keeps
the pre-preemption history and adds a ``run_start`` marker row, so
dashboards see one continuous run. Rows carry no wall-clock timestamps
by default (deterministic tests); pass ``stamp=True`` to add
``time.time()``.
"""

from __future__ import annotations

import json
import time
from typing import Optional

__all__ = ["MetricsLogger"]


class MetricsLogger:
    """Append-only JSONL metrics writer (no-op when ``path`` is None)."""

    def __init__(self, path: Optional[str], stamp: bool = False):
        self.path = path
        self.stamp = stamp
        if path:
            # append-only: restarts must not wipe pre-preemption rows
            self.log("run_start")

    def log(self, event: str, **fields) -> None:
        if not self.path:
            return
        row = {"event": event, **fields}
        if self.stamp:
            row["time"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
