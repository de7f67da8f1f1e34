"""Executable goldens for the host data layer and decode path: this repo's
KITTIDataset.__getitem__ and eval/decode vs the REAL reference implementation
(lib/datasets/kitti/kitti_dataset.py, lib/helpers/decode_helper.py) run on a
shared synthetic-KITTI fixture.

These pin the target-encoding and decode semantics from the reference's own
code, so the vectorized rewrite of the data layer cannot silently drift.
"""

import numpy as np
import pytest
import torch

import ref_import

ref_import.install()

from lib.datasets.kitti.kitti_dataset import KITTI_Dataset  # noqa: E402
from lib.helpers import decode_helper as ref_decode  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from monodetr_tpu.data.kitti_dataset import KITTIDataset  # noqa: E402
from monodetr_tpu.data.kitti_utils import Calibration  # noqa: E402
from monodetr_tpu.eval import decode as our_decode  # noqa: E402
from tests.synthetic_kitti import make_synthetic_kitti  # noqa: E402


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_golden")
    make_synthetic_kitti(str(root), n_train=5, n_val=3, seed=11, max_cars=5)
    return str(root)


def base_cfg(root):
    return {
        "root_dir": root,
        "writelist": ["Car"],
        "use_3d_center": True,
        "bbox2d_type": "anno",
        "meanshape": False,
        "class_merging": False,
        "use_dontcare": False,
        "aug_pd": False,
        "aug_crop": False,
        "aug_calib": False,
        "random_flip": 0.5,
        "random_crop": 0.5,
        "scale": 0.4,
        "shift": 0.1,
        "depth_scale": "normal",
        "clip_2d": False,
    }


TARGET_KEYS = [
    ("calibs", "calibs"),
    ("labels", "labels"),
    ("boxes", "boxes"),
    ("boxes_3d", "boxes_3d"),
    ("depth", "depth"),
    ("size_2d", "size_2d"),
    ("size_3d", "size_3d"),
    ("src_size_3d", "src_size_3d"),
    ("heading_bin", "heading_bin"),
    ("heading_res", "heading_res"),
    ("mask", "mask_2d"),
]


def assert_targets_equal(ours, refs, ctx=""):
    for our_k, ref_k in TARGET_KEYS:
        np.testing.assert_allclose(
            np.asarray(ours[our_k], np.float64),
            np.asarray(refs[ref_k], np.float64),
            rtol=1e-5, atol=1e-6, err_msg=f"{ctx}: {our_k} vs ref {ref_k}",
        )


def _force_pil_path(monkeypatch):
    """Use the PIL warp (identical calls to the reference) so images compare
    exactly; the native C++ warp's bilinear equivalence is covered in
    tests/test_native.py."""
    from monodetr_tpu.data import kitti_dataset as kd

    monkeypatch.setattr(kd.native, "available", lambda: False)


# The affine matrix itself differs in the last ulp between our exact 3-point
# linear solve and cv2.getAffineTransform, which flips PIL's bilinear
# rounding on a handful of pixels (measured: 6 / 1.5M).  One uint8 level
# after ImageNet normalization is 1/255/0.224 ~= 0.0175.
IMG_ATOL = 0.02


def assert_images_equal(img_o, img_r, ctx=""):
    np.testing.assert_allclose(
        np.asarray(img_o), np.transpose(img_r, (1, 2, 0)),
        rtol=0, atol=IMG_ATOL, err_msg=f"{ctx}: image")


def test_val_getitem_matches_reference(kitti_root, monkeypatch):
    _force_pil_path(monkeypatch)
    ours = KITTIDataset("val", base_cfg(kitti_root))
    refs = KITTI_Dataset("val", base_cfg(kitti_root))
    assert len(ours) == len(refs)

    for item in range(len(ours)):
        img_o, p2_o, tgt_o, info_o = ours[item]
        img_r, p2_r, tgt_r, info_r = refs[item]
        assert_images_equal(img_o, img_r, ctx=f"item {item}")
        np.testing.assert_allclose(p2_o, p2_r, err_msg=f"item {item}: P2")
        assert_targets_equal(tgt_o, tgt_r, ctx=f"item {item}")
        assert info_o["img_id"] == info_r["img_id"]
        np.testing.assert_allclose(info_o["img_size"], info_r["img_size"])
        np.testing.assert_allclose(
            info_o["bbox_downsample_ratio"], info_r["bbox_downsample_ratio"])


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_train_getitem_matches_reference_with_flip(kitti_root, monkeypatch, seed):
    """Train split, aug_pd/aug_crop off: the only RNG draw is the flip coin,
    and both implementations draw it identically from the global np.random
    stream — so seeding before each access exercises the flip branch (object
    box/alpha/ry mirroring + center_3d flip) deterministically."""
    _force_pil_path(monkeypatch)
    ours = KITTIDataset("train", base_cfg(kitti_root))
    refs = KITTI_Dataset("train", base_cfg(kitti_root))

    flipped = 0
    for item in range(len(ours)):
        np.random.seed(seed * 100 + item)
        img_o, _, tgt_o, _ = ours[item]
        np.random.seed(seed * 100 + item)
        img_r, _, tgt_r, _ = refs[item]
        np.random.seed(seed * 100 + item)
        flipped += int(np.random.random() < 0.5)
        assert_images_equal(img_o, img_r, ctx=f"item {item} (train)")
        assert_targets_equal(tgt_o, tgt_r, ctx=f"item {item} (train)")
    if seed == 0:
        assert flipped > 0  # the branch actually ran


def test_lrtb_filtered_object_keeps_label_like_reference(tmp_path, monkeypatch):
    """An object passing every filter EXCEPT lrtb>=0 (3-D center projects
    outside its clipped 2-D box) keeps labels/size_2d but nothing else —
    the reference writes those before its lrtb `continue`
    (kitti_dataset.py:257-261 vs :274)."""
    _force_pil_path(monkeypatch)
    root = str(tmp_path / "kitti_edge")
    make_synthetic_kitti(root, n_train=1, n_val=1, seed=3, max_cars=2)
    import glob
    import os

    val_id = open(os.path.join(root, "ImageSets", "val.txt")).read().split()[0]
    label_path = os.path.join(root, "training", "label_2", f"{int(val_id):06d}.txt")
    # z=10, x chosen so the 3-D center projects to u ~= 700 (in image), but
    # the hand-clipped 2-D box ends at x2=660 -> r < 0
    x = (700.0 - 609.56) * 10.0 / 721.54
    with open(label_path, "a") as f:
        f.write(f"Car 0.20 0 0.50 600.00 150.00 660.00 200.00 "
                f"1.50 1.60 4.00 {x:.2f} 1.65 10.00 0.50\n")

    ours = KITTIDataset("val", base_cfg(root))
    refs = KITTI_Dataset("val", base_cfg(root))
    _, _, tgt_o, _ = ours[0]
    _, _, tgt_r, _ = refs[0]
    assert_targets_equal(tgt_o, tgt_r, ctx="lrtb edge")
    # the edge case actually triggered: its slot has a size_2d but no box
    slot = np.where((tgt_r["size_2d"] != 0).any(1)
                    & ~(tgt_r["boxes"] != 0).any(1))[0]
    assert slot.size >= 1


def test_decode_matches_reference(kitti_root):
    """extract_dets_from_outputs + decode_detections vs decode_helper.py on
    random outputs and the fixture's real calibrations."""
    rng = np.random.RandomState(42)
    B, Q, C = 3, 24, 3
    out_np = {
        "pred_logits": rng.randn(B, Q, C).astype(np.float32),
        "pred_boxes": (rng.rand(B, Q, 6) * 0.8 + 0.1).astype(np.float32),
        "pred_3d_dim": (rng.rand(B, Q, 3) + 0.5).astype(np.float32),
        "pred_depth": np.stack(
            [rng.rand(B, Q) * 50 + 5, rng.randn(B, Q) * 0.3], -1
        ).astype(np.float32),
        "pred_angle": rng.randn(B, Q, 24).astype(np.float32),
    }
    topk = 20

    dets_r = ref_decode.extract_dets_from_outputs(
        {k: torch.from_numpy(v) for k, v in out_np.items()}, topk=topk
    ).numpy()
    dets_o = np.asarray(our_decode.extract_dets_from_outputs(
        {k: jnp.asarray(v) for k, v in out_np.items()}, topk=topk))
    np.testing.assert_allclose(dets_o, dets_r, rtol=1e-4, atol=1e-5)

    ours_ds = KITTIDataset("val", base_cfg(kitti_root))
    calibs = [ours_ds.get_calib(int(ours_ds.idx_list[i % len(ours_ds)]))
              for i in range(B)]
    assert all(isinstance(c, Calibration) for c in calibs)
    info = {
        "img_id": [int(ours_ds.idx_list[i % len(ours_ds)]) for i in range(B)],
        "img_size": np.tile(np.array([[1242.0, 375.0]]), (B, 1)),
    }
    cls_mean_size = np.zeros((3, 3), np.float32)

    res_r = ref_decode.decode_detections(
        dets_r.copy(), info, calibs, cls_mean_size, threshold=0.2)
    res_o = our_decode.decode_detections(
        dets_o.copy(), info, calibs, cls_mean_size, threshold=0.2)

    assert set(res_o.keys()) == set(res_r.keys())
    for img_id in res_r:
        a, b = np.asarray(res_o[img_id]), np.asarray(res_r[img_id])
        assert a.shape == b.shape, f"img {img_id}: {a.shape} != {b.shape}"
        if a.size:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=f"img {img_id}")
