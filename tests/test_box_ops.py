"""Golden tests: jnp box ops vs the reference's torch math (re-stated here in
numpy — no code is imported from the reference)."""

import numpy as np
import jax.numpy as jnp

from monodetr_tpu.ops import box_ops


def np_cxcylrtb_to_xyxy(x):
    xc, yc, l, r, t, b = np.split(x, 6, axis=-1)
    return np.concatenate([xc - l, yc - t, xc + r, yc + b], axis=-1)


def np_giou(b1, b2):
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / union
    lt_e = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb_e = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh_e = np.clip(rb_e - lt_e, 0, None)
    area = wh_e[..., 0] * wh_e[..., 1]
    return iou - (area - union) / area


def random_boxes(rng, n):
    c = rng.rand(n, 2).astype(np.float32)
    wh = (rng.rand(n, 4) * 0.3 + 0.01).astype(np.float32)
    return np.concatenate([c, wh], axis=-1)  # cxcylrtb


def test_cxcylrtb_roundtrip(rng):
    x = random_boxes(rng, 32)
    got = np.asarray(box_ops.box_cxcylrtb_to_xyxy(jnp.asarray(x)))
    np.testing.assert_allclose(got, np_cxcylrtb_to_xyxy(x), rtol=1e-6)


def test_cxcywh_conversions(rng):
    x = np.abs(rng.randn(17, 4)).astype(np.float32)
    xyxy = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(x)))
    back = np.asarray(box_ops.box_xyxy_to_cxcywh(jnp.asarray(xyxy)))
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


def test_generalized_iou(rng):
    a = np_cxcylrtb_to_xyxy(random_boxes(rng, 20))
    b = np_cxcylrtb_to_xyxy(random_boxes(rng, 13))
    got = np.asarray(box_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_giou(a, b), rtol=1e-5, atol=1e-6)


def test_generalized_iou_elementwise(rng):
    a = np_cxcylrtb_to_xyxy(random_boxes(rng, 20))
    b = np_cxcylrtb_to_xyxy(random_boxes(rng, 20))
    full = np.asarray(box_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    elem = np.asarray(
        box_ops.generalized_box_iou_elementwise(jnp.asarray(a), jnp.asarray(b))
    )
    np.testing.assert_allclose(elem, np.diag(full), rtol=1e-5, atol=1e-6)
