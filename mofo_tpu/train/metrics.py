"""Metrics, console logging, JSONL epoch logs, and profiling hooks.

Reference surfaces (utils.py:17-194, SURVEY.md 5.5):
  - SmoothedValue / MetricLogger: windowed meters, `log_every` console
    lines with ETA and data/step time
  - TensorboardLogger: per-step scalar heads
  - rank-0 JSONL log.txt per epoch (run_mae_pretraining.py:289-293)
Additions the reference lacks (SURVEY.md 5.1): step-time and model-FLOPs
utilization meters, and jax.profiler trace capture around chosen steps.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    """Track a window of values + global avg (utils.py:17-86)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


class MetricLogger:
    """Console meter aggregation + timed iteration (utils.py:89-170)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = float(v)
            self.meters[k].update(v)

    def update_weighted(self, n: int, **kwargs):
        """Update meters with a sample count, so global_avg weights
        batches by their real (non-padded) size."""
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = float(v)
            self.meters[k].update(v, n=max(int(n), 0) or 1)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: Optional[int] = None):
        i = 0
        if total is None:
            try:
                total = len(iterable)
            except TypeError:
                total = -1
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == total - 1:
                if total > 0:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                else:
                    eta_str = "?"
                self.print(
                    f"{header} [{i}/{total}] eta: {eta_str} {self} "
                    f"time: {iter_time} data: {data_time}"
                )
            i += 1
            end = time.time()
        elapsed = time.time() - start
        self.print(
            f"{header} Total time: "
            f"{str(datetime.timedelta(seconds=int(elapsed)))} "
            f"({elapsed / max(i, 1):.4f} s / it)"
        )

    def epoch_stats(self, sync: bool = False) -> Dict[str, float]:
        """Per-meter global averages. sync=True reduces (total, count)
        across JAX processes first — the MetricLogger
        synchronize_between_processes allreduce (utils.py:45-56)."""
        if sync:
            import jax

            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                names = sorted(self.meters)
                local = np.asarray(
                    [[self.meters[k].total, self.meters[k].count]
                     for k in names],
                    dtype=np.float64,
                )
                gathered = np.asarray(
                    multihost_utils.process_allgather(local)
                )  # (P, N, 2)
                tot = gathered.sum(axis=0)
                return {
                    k: float(tot[i, 0] / max(tot[i, 1], 1.0))
                    for i, k in enumerate(names)
                }
        return {k: m.global_avg for k, m in self.meters.items()}


class JsonlLogger:
    """Rank-0 JSONL epoch log (log.txt convention,
    run_mae_pretraining.py:289-293)."""

    def __init__(self, output_dir: str, enabled: bool = True,
                 filename: str = "log.txt"):
        self.enabled = enabled and bool(output_dir)
        if self.enabled:
            os.makedirs(output_dir, exist_ok=True)
            self.path = os.path.join(output_dir, filename)

    def write(self, stats: Dict):
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(stats) + "\n")


class TensorboardLogger:
    """Thin tensorboardX wrapper (utils.py:173-194); no-op when the
    package or logdir is absent."""

    def __init__(self, log_dir: Optional[str]):
        self.writer = None
        self.step = 0
        if log_dir:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(logdir=log_dir)
            except ImportError:
                pass

    def set_step(self, step: Optional[int] = None):
        self.step = step if step is not None else self.step + 1

    def update(self, head: str = "scalar", step: Optional[int] = None,
               **kwargs):
        if self.writer is None:
            return
        for k, v in kwargs.items():
            if v is None:
                continue
            if hasattr(v, "item"):
                v = float(v)
            self.writer.add_scalar(
                f"{head}/{k}", v, self.step if step is None else step
            )

    def flush(self):
        if self.writer is not None:
            self.writer.flush()


class ThroughputMeter:
    """Step-time + clips/s + MFU (absent from the reference; SURVEY 5.1)."""

    def __init__(self, batch_size: int, flops_per_step: float = 0.0,
                 peak_flops: float = 0.0):
        self.batch_size = batch_size
        self.flops_per_step = flops_per_step
        self.peak_flops = peak_flops
        self.times = SmoothedValue(window_size=50)

    def update(self, step_seconds: float):
        self.times.update(step_seconds)

    @property
    def clips_per_sec(self) -> float:
        return self.batch_size / max(self.times.avg, 1e-9)

    @property
    def mfu(self) -> float:
        if not (self.flops_per_step and self.peak_flops):
            return 0.0
        return self.flops_per_step / max(self.times.avg, 1e-9) / self.peak_flops


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace into log_dir."""
    import jax

    return jax.profiler.trace(log_dir)
