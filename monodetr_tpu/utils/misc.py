"""Logging + seeding (reference lib/helpers/utils_helper.py parity) and
small host-side helpers."""

import logging
import random

import numpy as np


def create_logger(log_file, rank=0):
    log_format = "%(asctime)s  %(levelname)5s  %(message)s"
    logging.basicConfig(
        level=logging.INFO if rank == 0 else logging.WARNING,
        format=log_format,
        filename=log_file,
    )
    console = logging.StreamHandler()
    console.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    console.setFormatter(logging.Formatter(log_format))
    logging.getLogger(__name__).addHandler(console)
    return logging.getLogger(__name__)


def set_random_seed(seed):
    """Seeds python/numpy (utils_helper.py:18-26; the torch/cuda seeds map to
    the jax PRNGKey the trainer derives from the same seed)."""
    random.seed(seed)
    np.random.seed(seed)


class SmoothedValue:
    """Windowed scalar tracker (utils/misc.py:30-89): median/avg over the
    last `window_size` values plus a global average.  Values are host floats —
    fetch device scalars before updating."""

    def __init__(self, window_size=20, fmt="{median:.4f} ({global_avg:.4f})"):
        from collections import deque

        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n=1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        return float(np.median(np.asarray(self.deque))) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(np.asarray(self.deque))) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Training-loop meter collection + timed iteration logger
    (utils/misc.py:162-249).  `log_every` yields batches and prints progress
    with eta / per-meter stats / iteration time every `print_freq` steps."""

    def __init__(self, delimiter="\t"):
        from collections import defaultdict

        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{attr}'")

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def log_every(self, iterable, print_freq, header=None, total=None,
                  log_fn=print):
        import datetime
        import time

        header = header or ""
        total = total if total is not None else len(iterable)
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        space = len(str(total))
        end = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == total - 1:
                eta = datetime.timedelta(
                    seconds=int(iter_time.global_avg * (total - i)))
                log_fn(self.delimiter.join(
                    [header, f"[{i:{space}d}/{total}]", f"eta: {eta}",
                     str(self), f"time: {iter_time}"]))
            end = time.time()


def accuracy(scores, target, topk=(1,)):
    """Top-k classification accuracy in percent (utils/misc.py:436-451).
    scores: [N, C] array-like, target: [N]."""
    scores = np.asarray(scores)
    target = np.asarray(target)
    if target.size == 0:
        return [0.0 for _ in topk]
    maxk = max(topk)
    pred = np.argsort(-scores, axis=1)[:, :maxk]  # [N, maxk]
    correct = pred == target[:, None]
    return [float(correct[:, :k].any(axis=1).mean() * 100.0) for k in topk]


class NestedTensor:
    """Array + padding-mask pair (utils/misc.py:287-332).  This framework's
    fixed 1280x384 warp makes every mask all-valid, so the model never builds
    one — provided for API compatibility with DETR-style user code."""

    def __init__(self, tensors, mask):
        self.tensors = tensors
        self.mask = mask

    def decompose(self):
        return self.tensors, self.mask

    def __repr__(self):
        return str(self.tensors)


def nested_array_from_list(arrays, pad_value=0.0):
    """Batch variable-shaped [H, W, C] numpy images into one padded array +
    boolean mask (True = padding), mirroring nested_tensor_from_tensor_list
    (utils/misc.py:310-335) in NHWC."""
    shapes = np.array([a.shape for a in arrays])
    H, W, C = shapes.max(axis=0)
    batch = np.full((len(arrays), H, W, C), pad_value,
                    dtype=np.asarray(arrays[0]).dtype)
    mask = np.ones((len(arrays), H, W), dtype=bool)
    for i, a in enumerate(arrays):
        h, w, c = a.shape
        batch[i, :h, :w, :c] = a
        mask[i, :h, :w] = False
    return NestedTensor(batch, mask)


def get_sha():
    """Current git sha/diff/branch string for experiment logging
    (utils/misc.py:252-269)."""
    import os
    import subprocess

    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        try:
            return subprocess.check_output(
                cmd, cwd=cwd, stderr=subprocess.DEVNULL).decode("ascii").strip()
        except Exception:
            return "N/A"

    sha = _run(["git", "rev-parse", "HEAD"])
    diff = "clean" if _run(["git", "diff-index", "HEAD"]) == "" else "has uncommitted changes"
    branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    return f"sha: {sha}, status: {diff}, branch: {branch}"
