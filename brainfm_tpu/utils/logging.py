"""Training metrics and logging.

Parity with /root/reference/utils/logging.py:20-74 (master-only logging)
and utils/misc.py:647-840 (SmoothedValue / MetricLogger) — re-designed for
the JAX single-controller model: cross-process sync uses
`jax.experimental.multihost_utils` when more than one process exists,
instead of torch.distributed all-reduce.
"""

from __future__ import annotations

import datetime
import json
import logging
import sys
import time
from collections import defaultdict, deque

import numpy as np


def setup_logging(output=None, name="brainfm_tpu", rank0_only=True):
    """(parity: utils/logging.py:39-74)"""
    import jax

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if rank0_only and jax.process_index() != 0:
        logger.addHandler(logging.NullHandler())
        return logger
    fmt = logging.Formatter("[%(asctime)s] %(name)s %(levelname)s: %(message)s",
                            datefmt="%m/%d %H:%M:%S")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output:
        fh = logging.FileHandler(output)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SmoothedValue:
    """Windowed meter (parity: utils/misc.py:647-709)."""

    def __init__(self, window_size=20, fmt="{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n=1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

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
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def synchronize_between_processes(self):
        """Sum count/total across hosts (parity: misc.py:676-690)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.array([self.count, self.total], np.float64)
        out = multihost_utils.process_allgather(arr)
        self.count = int(out[:, 0].sum())
        self.total = float(out[:, 1].sum())

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """(parity: utils/misc.py:712-840)"""

    def __init__(self, delimiter="  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable, print_freq, logger, header="", total=None):
        i = 0
        total = total if total is not None else len(iterable)
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == total - 1:
                eta = iter_time.global_avg * (total - i)
                logger.info(
                    f"{header} [{i}/{total}] eta: "
                    f"{datetime.timedelta(seconds=int(eta))} {self} "
                    f"time: {iter_time} data: {data_time}")
            i += 1
            end = time.time()
        elapsed = time.time() - start
        logger.info(f"{header} Total time: "
                    f"{datetime.timedelta(seconds=int(elapsed))} "
                    f"({elapsed / max(total, 1):.4f} s / it)")


def write_log_line(path, stats: dict):
    """Append one epoch of stats as a JSON line (parity: train.py:223-226)."""
    with open(path, "a") as f:
        f.write(json.dumps(stats) + "\n")


def read_log(path):
    """(parity: utils/misc.py:1391-1404)"""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def plot_loss(log_path, out_path=None, keys=None):
    """Loss curves from the JSON-line log (parity: utils/misc.py:1406-1420 +
    scripts/train.py:229-235). Returns the figure path, or None when a real
    matplotlib isn't importable (e.g. stubbed in hermetic test envs)."""
    import matplotlib

    if not hasattr(matplotlib, "use"):  # stubbed module
        return None
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not hasattr(plt, "subplots"):
        return None

    stats = read_log(log_path)
    if not stats:
        return None
    keys = keys or [k for k in stats[0] if k.startswith("loss")]
    xs = [s.get("epoch", i) for i, s in enumerate(stats)]
    fig, ax = plt.subplots(figsize=(8, 5))
    for k in keys:
        ys = [s.get(k) for s in stats]
        if any(y is not None for y in ys):
            ax.plot(xs, ys, label=k)
    ax.set_xlabel("epoch")
    ax.set_yscale("log")
    ax.legend(fontsize=7)
    out_path = out_path or str(log_path) + ".png"
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path
