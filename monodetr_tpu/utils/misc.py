"""Logging + seeding (reference lib/helpers/utils_helper.py parity).

The reference also vendors DETR's SmoothedValue / MetricLogger / accuracy /
NestedTensor / get_sha (utils/misc.py:30-269) — all dead code there (nothing
in the shipped train/eval path calls them) and deliberately NOT
re-implemented here: fixed shapes make NestedTensor masks constants, and the
trainer logs losses + img/s directly (train/trainer.py)."""

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


def is_main_process():
    """Multi-host write gate (SURVEY §5.8): the reference gates checkpoint
    saves and downloads on `is_main_process`/`save_on_master`
    (reference utils/misc.py:381-432); the JAX equivalent is process 0 of
    the distributed runtime.  True on single-host runs."""
    import jax

    return jax.process_index() == 0


def set_random_seed(seed):
    """Seeds python/numpy (utils_helper.py:18-26; the torch/cuda seeds map to
    the jax PRNGKey the trainer derives from the same seed)."""
    random.seed(seed)
    np.random.seed(seed)
