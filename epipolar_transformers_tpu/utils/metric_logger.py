"""Windowed training meters (reference utils/metric_logger.py:7-83)."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np


class SmoothedValue:
    """Track a series of values and provide access to smoothed values over a
    window (20) plus the global average."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value):
        value = float(value)
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = float(v)
            self.meters[k].update(v)

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})" for name, m in self.meters.items()
        )

    def get_all_avg(self):
        return {name: m.global_avg for name, m in self.meters.items()}


def prefix_dict(d: dict, prefix: str) -> dict:
    """reference utils/misc.py:11-12."""
    return {f"{prefix}/{k}": v for k, v in d.items()}


class TensorboardWriter:
    """Scalar writer with the reference's train//test tag convention
    (reference utils/metric_logger.py:52-60, tensorboardX)."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self.writer = None
        if enabled and log_dir:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except ImportError:
                pass

    def write(self, metrics: dict, step: int, tag: str = "train"):
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(f"{tag}/{k}", float(v), step)
            except (TypeError, ValueError):
                continue

    def close(self):
        if self.writer is not None:
            self.writer.close()
