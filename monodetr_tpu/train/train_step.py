"""Jitted training / evaluation steps.

One compiled function per phase: forward + criterion (matching + 8 losses) +
backward + reference-AdamW update all fuse into a single XLA program — the
reference's host round-trips (scipy matching at matcher.py:87, the DDN paint
loop) do not exist here.

Data-parallel variants shard the batch over a mesh axis; gradients are
averaged with a compiled psum (see parallel/mesh.py).
"""

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def make_train_step(model, criterion, step_fn, donate: bool = True) -> Callable:
    """Returns jitted train_step(params, opt_state, batch, lr, rng).

    batch: dict with images [B,H,W,3], calibs [B,3,4], img_sizes [B,2], and
    the padded target arrays (labels/boxes/boxes_3d/depth/size_3d/
    heading_bin/heading_res/mask).
    """

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, batch["images"], batch["calibs"], batch["img_sizes"],
            train=True, deterministic=False, rngs={"dropout": rng},
        )
        losses = criterion(out, batch, train=True)
        return criterion.total(losses), losses

    # Two platform-measured latency rules baked in here (v5e, bs=16):
    #  - donate params/opt_state: in-place update instead of ~450 MB of
    #    fresh buffers per step (49 -> 6.5 ms per chained step);
    #  - return ONE stacked loss vector, not ~30 scalar buffers: per-buffer
    #    dispatch overhead dominated the step otherwise (74 -> 6 ms).
    loss_keys = []

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def _step(params, opt_state, batch, lr, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        params, opt_state = step_fn(grads, opt_state, params, lr)
        keys = sorted(losses.keys())
        if not loss_keys:  # trace-time: record the stacking order
            loss_keys.extend(keys + ["loss_detr"])
        stacked = jnp.stack([losses[k] for k in keys] + [total])
        return params, opt_state, stacked

    def train_step(params, opt_state, batch, lr, rng):
        params, opt_state, stacked = _step(params, opt_state, batch, lr, rng)
        return params, opt_state, LossVector(tuple(loss_keys), stacked)

    train_step.jitted = _step  # AOT access (profiling: .lower().compile())
    return train_step


class LossVector:
    """Lazy named view over the stacked loss vector: behaves like the old
    dict of scalars but costs one device buffer."""

    def __init__(self, keys, values):
        self.keys_ = keys
        self.values = values

    def __getitem__(self, k):
        import numpy as np

        return np.asarray(self.values)[self.keys_.index(k)]

    def items(self):
        import numpy as np

        host = np.asarray(self.values)
        return [(k, host[i]) for i, k in enumerate(self.keys_)]

    def as_dict(self):
        return dict(self.items())


def make_eval_step(model, topk: int = 50, threshold: float = 0.2) -> Callable:
    """Returns jitted eval_step(params, images, calibs, img_sizes) ->
    detections [B, topk, 36] (the reference's extract_dets_from_outputs
    layout, decode_helper.py:57-110)."""
    from ..eval.decode import extract_dets_from_outputs

    @jax.jit
    def eval_step(params, images, calibs, img_sizes):
        out = model.apply(params, images, calibs, img_sizes, train=False)
        return extract_dets_from_outputs(out, topk=topk)

    return eval_step
