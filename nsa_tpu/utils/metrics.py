"""Append-only CSV metrics logging.

The reference logs training to wandb (pretrain/train.py:216-218) and
benchmark results to append-only CSVs with header auto-creation
(evaluation/efficiency.py:558-563, evaluation/perplexity.py:505-510); the
CSV writer here keeps that exact contract (same schema headers) so the
reference's plotters remain compatible, while wandb is optional.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class CSVLogger:
    """Append rows to a CSV, writing the header on first creation."""

    def __init__(self, path: str):
        self.path = path
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def append(self, row: Dict):
        """Append one row; the header is fixed by the FIRST row ever
        written, later rows are aligned to it (missing keys blank, new
        keys appended in order at the end so nothing is silently dropped —
        a train row following a valid-loss row must not lose its loss
        column to the narrower header)."""
        exists = os.path.exists(self.path)
        fields = list(row.keys())
        if exists:
            with open(self.path, newline="") as f:
                header = next(csv.reader(f), None)
            if header:
                fields = header + [k for k in row if k not in header]
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            if not exists:
                writer.writeheader()
            writer.writerow(row)


class MetricsLogger:
    """stdout + optional CSV + optional wandb training logger."""

    def __init__(self, csv_path: Optional[str] = None, use_wandb: bool = False,
                 project: str = "", run_name: str = ""):
        self.csv = CSVLogger(csv_path) if csv_path else None
        self.wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                wandb.init(project=project)
                if run_name:
                    wandb.run.name = run_name
                self.wandb = wandb
            except Exception:
                self.wandb = None
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        stamp = time.time() - self._t0
        parts = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                         for k, v in metrics.items())
        print(f"[{stamp:8.1f}s] step {step}: {parts}", flush=True)
        if self.csv:
            # unified schema: train and valid rows share one header
            row = {"step": step, "time_s": round(stamp, 2),
                   "loss": "", "tokens_per_s": "", "valid_loss": ""}
            row.update(metrics)
            self.csv.append(row)
        if self.wandb:
            self.wandb.log(metrics, step=step)
