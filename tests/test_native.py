"""Native C++ kernel tests: warp parity vs PIL, rotated IoU parity vs the
vectorized numpy implementation (and both vs each other on random boxes)."""

import numpy as np
import pytest
from PIL import Image

from monodetr_tpu import native
from monodetr_tpu.data.kitti_utils import get_affine_transform
from monodetr_tpu.eval.kitti_eval.rotated_iou import (
    rotated_box_intersection,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (run native/build.sh)"
)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def test_warp_matches_pil():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (375, 1242, 3)).astype(np.uint8)
    # smooth the noise so bilinear sub-pixel differences are tiny
    src = (src.astype(np.float32) + np.roll(src, 1, 0) + np.roll(src, 1, 1)).astype(
        np.uint8
    )
    center = np.array([640.0, 190.0])
    crop_size = np.array([1242 * 1.04, 375 * 1.04])
    res = np.array([320, 96])
    trans, trans_inv = get_affine_transform(center, crop_size, 0, res, inv=1)

    pil = Image.fromarray(src).transform(
        (320, 96), method=Image.AFFINE,
        data=tuple(trans_inv.reshape(-1).tolist()), resample=Image.BILINEAR,
    )
    want = (np.array(pil).astype(np.float32) / 255.0 - MEAN) / STD

    got = native.warp_affine_normalize(src, trans_inv, 320, 96, MEAN, STD)
    assert got.shape == (96, 320, 3)
    # PIL quantizes the warped image to uint8 before normalize (we don't),
    # and handles border samples differently — compare the interior up to
    # quantization tolerance
    tol = (1.0 / 255.0) / STD.min() + 1e-4
    diff = np.abs(got - want)[4:-4, 4:-4]
    assert diff.max() < tol * 1.5, diff.max()
    assert diff.mean() < tol * 0.5, diff.mean()


def test_warp_identity_transform():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 255, (96, 320, 3)).astype(np.uint8)
    inv = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    got = native.warp_affine_normalize(src, inv, 320, 96, MEAN, STD)
    want = (src.astype(np.float32) / 255.0 - MEAN) / STD
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotated_iou_matches_numpy():
    rng = np.random.RandomState(2)
    boxes = np.stack(
        [rng.uniform(-10, 10, 40), rng.uniform(0, 60, 40),
         rng.uniform(1, 5, 40), rng.uniform(1, 3, 40),
         rng.uniform(-np.pi, np.pi, 40)], -1,
    )
    qboxes = boxes[: 25] + rng.randn(25, 5) * 0.3

    inter_np = rotated_box_intersection(boxes, qboxes)
    area1 = (boxes[:, 2] * boxes[:, 3])[:, None]
    area2 = (qboxes[:, 2] * qboxes[:, 3])[None, :]
    want = inter_np / (area1 + area2 - inter_np)

    got = native.rotated_iou(boxes, qboxes, -1)
    np.testing.assert_allclose(got, want, atol=1e-4)

    got2 = native.rotated_iou(boxes, qboxes, 2)
    np.testing.assert_allclose(got2, inter_np, atol=1e-4)


def test_rotated_iou_empty():
    assert native.rotated_iou(np.zeros((0, 5)), np.zeros((3, 5))).shape == (0, 3)
