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


def make_train_step(model, criterion, step_fn) -> Callable:
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

    @jax.jit
    def train_step(params, opt_state, batch, lr, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        params, opt_state = step_fn(grads, opt_state, params, lr)
        losses["loss_detr"] = total
        return params, opt_state, losses

    return train_step


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
