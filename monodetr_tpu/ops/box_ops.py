"""Box format conversions and (generalized) IoU in pure jnp.

Behavioral parity with the reference `utils/box_ops.py` (box_cxcywh_to_xyxy,
box_cxcylrtb_to_xyxy, box_xyxy_to_cxcywh, generalized_box_iou at
utils/box_ops.py:13-72), re-written batched/broadcasting-first so they fuse
under jit.  All functions accept arbitrary leading batch dims.
"""

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x):
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1
    )


def box_cxcylrtb_to_xyxy(x):
    """6-D box (3D-center cx, cy + distances to left/right/top/bottom edges)
    to corner xyxy.  Matches reference utils/box_ops.py:20-24."""
    xc, yc, l, r, t, b = jnp.split(x, 6, axis=-1)
    return jnp.concatenate([xc - l, yc - t, xc + r, yc + b], axis=-1)


def box_xyxy_to_cxcywh(x):
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou_pairwise(boxes1, boxes2):
    """Pairwise IoU: boxes1 [..., N, 4] x boxes2 [..., M, 4] -> ([..., N, M] iou, union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / union
    return iou, union


def generalized_box_iou(boxes1, boxes2):
    """Pairwise GIoU matrix [..., N, M]; boxes in xyxy.

    Unlike the torch reference (which asserts well-formedness), degenerate
    boxes flow through untouched — the callers mask padded entries instead.
    """
    iou, union = box_iou_pairwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def generalized_box_iou_elementwise(boxes1, boxes2):
    """Elementwise GIoU over matched pairs: [..., 4] x [..., 4] -> [...]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / union
    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    area = wh_e[..., 0] * wh_e[..., 1]
    return iou - (area - union) / area
