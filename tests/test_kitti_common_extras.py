"""Annotation-I/O extras vs the REAL reference kitti_common.py.

Covers the helpers beyond the core eval path: info building
(get_kitti_image_info incl. calib parsing), path helpers, anno filtering,
result-line formatting and the axis-aligned IoU trio — each asserted
equal against the reference implementation imported from /root/reference
(with a tiny skimage stub; not installed here)."""

import os
import sys
import types

import numpy as np
import pytest

from monodetr_tpu.eval.kitti_eval import kitti_common as kc
from tests.synthetic_kitti import make_synthetic_kitti


@pytest.fixture(scope="module")
def ref_kc():
    def imread(path):
        from PIL import Image

        return np.asarray(Image.open(path))

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        io_m = types.ModuleType("skimage.io")
        sk.io = io_m
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = io_m
    # ref_import.py installs a RAISING imread stub; always win with a real one
    sys.modules["skimage.io"].imread = imread
    sys.modules["skimage"].io.imread = imread
    sys.path.insert(0, "/root/reference/lib/datasets/kitti/kitti_eval_python")
    import kitti_common as ref

    sys.path.pop(0)
    return ref


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    make_synthetic_kitti(str(root), n_train=3, n_val=0)
    return str(root)


def _dict_equal(a, b):
    assert sorted(a.keys()) == sorted(b.keys())
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_info_building_matches_reference(ref_kc, kitti_root):
    ours = kc.get_kitti_image_info(
        kitti_root, image_ids=[0, 1, 2], calib=True, num_worker=2)
    theirs = ref_kc.get_kitti_image_info(
        kitti_root, image_ids=[0, 1, 2], calib=True, num_worker=2)
    assert len(ours) == len(theirs) == 3
    for o, t in zip(ours, theirs):
        assert o["image_idx"] == t["image_idx"]
        assert o["img_path"] == t["img_path"]
        np.testing.assert_array_equal(o["img_shape"], t["img_shape"])
        for key in ("P0", "P1", "P2", "P3", "R0_rect", "Tr_velo_to_cam",
                    "Tr_imu_to_velo"):
            np.testing.assert_allclose(
                o["calib/" + key], t["calib/" + key], err_msg=key)
        _dict_equal(o["annos"], t["annos"])


def test_path_helpers_match_reference(ref_kc, kitti_root):
    for fn in ("get_image_path", "get_label_path", "get_calib_path"):
        for rel in (True, False):
            assert getattr(kc, fn)(1, kitti_root, relative_path=rel) == \
                getattr(ref_kc, fn)(1, kitti_root, relative_path=rel)
    with pytest.raises(ValueError):
        kc.get_velodyne_path(0, kitti_root)  # fixture has no velodyne


def test_filter_kitti_anno_matches_reference(ref_kc):
    rng = np.random.RandomState(0)
    n = 12
    anno = {
        "name": np.array(["Car", "Pedestrian", "DontCare", "Car"] * 3),
        "bbox": np.sort(rng.rand(n, 4) * 100, axis=-1)[:, [0, 1, 3, 2]][
            :, [1, 0, 3, 2]],
        "difficulty": rng.randint(-1, 3, n),
        "score": rng.rand(n),
    }
    # classes only; classes+difficulty; DontCare suppression
    for kwargs in ({"used_classes": ["Car"]},
                   {"used_classes": ("Car", "Pedestrian"),
                    "used_difficulty": [0, 1]},
                   {"used_classes": ["Car", "DontCare"],
                    "dontcare_iou": 0.1}):
        _dict_equal(kc.filter_kitti_anno(anno, **kwargs),
                    ref_kc.filter_kitti_anno(anno, **kwargs))


def test_result_line_matches_reference(ref_kc):
    full = {
        "name": "Car", "truncated": 0.1, "occluded": 2, "alpha": -1.55,
        "bbox": [614.24, 181.78, 727.31, 284.77],
        "dimensions": [1.57, 1.73, 4.15],
        "location": [1.0, 1.75, 13.22], "rotation_y": -1.62,
        "score": 0.9312,
    }
    assert kc.kitti_result_line(full) == ref_kc.kitti_result_line(full)
    partial = {"name": "Cyclist", "bbox": [1.0, 2.0, 3.0, 4.0],
               "score": 0.25}
    assert kc.kitti_result_line(partial) == ref_kc.kitti_result_line(partial)
    assert kc.kitti_result_line(full, precision=2) == \
        ref_kc.kitti_result_line(full, precision=2)
    with pytest.raises(ValueError):
        kc.kitti_result_line({"name": "Car"})


def test_iou_trio_matches_reference(ref_kc):
    rng = np.random.RandomState(1)
    b1 = np.sort(rng.rand(7, 4) * 50, axis=-1)[:, [0, 1, 2, 3]]
    b2 = np.sort(rng.rand(5, 4) * 50, axis=-1)[:, [0, 1, 2, 3]]
    # reference layout [ymin, xmin, ymax, xmax]: interleave sorted pairs
    b1 = np.stack([b1[:, 0], b1[:, 1], b1[:, 2], b1[:, 3]], 1)
    for add1 in (False, True):
        np.testing.assert_allclose(kc.area(b1, add1), ref_kc.area(b1, add1))
        np.testing.assert_allclose(
            kc.intersection(b1, b2, add1), ref_kc.intersection(b1, b2, add1))
        np.testing.assert_allclose(kc.iou(b1, b2, add1),
                                   ref_kc.iou(b1, b2, add1))
