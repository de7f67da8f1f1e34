"""Checkpoint I/O with reference-compatible logical contents.

State dict = {epoch, model_state, optimizer_state, best_result, best_epoch}
(save_helper.py:13-28), stored as a pickle of numpy pytrees (device arrays
are pulled to host — the analogue of the reference's CPU-cast on save,
save_helper.py:6-18).  `.pth` extension kept for familiarity.
"""

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def get_checkpoint_state(params, opt_state, epoch: int, best_result: float,
                         best_epoch: int) -> dict:
    return {
        "epoch": epoch,
        "model_state": _to_numpy(params),
        "optimizer_state": _to_numpy(opt_state),
        "best_result": best_result,
        "best_epoch": best_epoch,
    }


def save_checkpoint(state: dict, filename: str):
    filename = "{}.pth".format(filename)
    with open(filename, "wb") as f:
        pickle.dump(state, f)


def load_checkpoint(filename: str, logger=None) -> dict:
    assert os.path.isfile(filename), filename
    if logger:
        logger.info("==> Loading from checkpoint '{}'".format(filename))
    with open(filename, "rb") as f:
        state = pickle.load(f)
    if logger:
        logger.info("==> Done")
    return state


def merge_params(base, update, path=""):
    """Merge a (possibly partial) parameter subtree into `base`.

    Supports backbone-only ImageNet checkpoints
    (tools/convert_checkpoint.py --torchvision-backbone — the analogue of
    the reference's torchvision pretrained init, backbone.py:100-102):
    every leaf present in `update` replaces the same-named, same-shaped
    leaf of `base`; leaves absent from `update` keep their init values.
    Returns a new tree; raises on unknown names or shape mismatches.
    """
    out = dict(base)
    for k, v in update.items():
        if k not in out:
            raise KeyError(f"checkpoint key not in model tree: {path}{k}")
        if isinstance(v, dict):
            out[k] = merge_params(out[k], v, path=f"{path}{k}/")
        else:
            have = np.shape(out[k])
            want = np.shape(v)
            if have != want:
                raise ValueError(
                    f"shape mismatch at {path}{k}: model {have} vs ckpt {want}")
            out[k] = v
    return out
