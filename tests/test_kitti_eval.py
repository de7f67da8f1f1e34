"""KITTI evaluator tests: rotated IoU vs rasterized ground truth + analytic
cases; the vectorized matcher vs a direct transliteration of the reference's
sequential loop; end-to-end AP sanity (perfect detections -> 100)."""

import numpy as np
import pytest

from monodetr_tpu.eval.kitti_eval.rotated_iou import rotate_iou_eval
from monodetr_tpu.eval.kitti_eval.eval import (
    _match_image,
    eval_class,
    get_official_eval_result,
    get_thresholds,
    image_box_overlap,
)


# ---------- rotated IoU ----------

def raster_iou(b1, b2, res=400):
    """Rasterized IoU ground truth for one pair of [cx, cz, l, w, ry]."""
    lo = min(b1[0] - b1[2], b2[0] - b2[2], b1[1] - b1[3], b2[1] - b2[3]) - 1
    hi = max(b1[0] + b1[2], b2[0] + b2[2], b1[1] + b1[3], b2[1] + b2[3]) + 1
    xs = np.linspace(lo, hi, res)
    X, Z = np.meshgrid(xs, xs)

    def inside(b):
        dx, dz = X - b[0], Z - b[1]
        c, s = np.cos(b[4]), np.sin(b[4])
        u = dx * c - dz * s
        v = dx * s + dz * c
        return (np.abs(u) <= b[2] / 2) & (np.abs(v) <= b[3] / 2)

    i1, i2 = inside(b1), inside(b2)
    inter = (i1 & i2).sum()
    union = (i1 | i2).sum()
    return inter / union if union else 0.0


def test_rotated_iou_axis_aligned():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = rotate_iou_eval(a, b)[0, 0]
    np.testing.assert_allclose(iou, 2.0 / 6.0, rtol=1e-5)  # 1x2 / (4+4-2)


def test_rotated_iou_identical():
    a = np.array([[1.0, 2.0, 3.0, 1.5, 0.7]])
    np.testing.assert_allclose(rotate_iou_eval(a, a)[0, 0], 1.0, rtol=1e-5)


def test_rotated_iou_disjoint():
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
    b = np.array([[10.0, 0.0, 1.0, 1.0, -0.3]])
    assert rotate_iou_eval(a, b)[0, 0] == 0.0


def test_rotated_iou_45deg():
    # unit square vs itself rotated 45 deg: inter = regular octagon
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)  # octagon area
    want = inter / (2 - inter)
    np.testing.assert_allclose(rotate_iou_eval(a, b)[0, 0], want, rtol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_rotated_iou_random_vs_raster(seed):
    rng = np.random.RandomState(seed)
    boxes = np.stack(
        [rng.uniform(-2, 2, 4), rng.uniform(-2, 2, 4),
         rng.uniform(1, 4, 4), rng.uniform(1, 4, 4),
         rng.uniform(-np.pi, np.pi, 4)], -1,
    )
    qboxes = np.stack(
        [rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3),
         rng.uniform(1, 4, 3), rng.uniform(1, 4, 3),
         rng.uniform(-np.pi, np.pi, 3)], -1,
    )
    got = rotate_iou_eval(boxes, qboxes)
    for i in range(4):
        for j in range(3):
            want = raster_iou(boxes[i], qboxes[j], res=600)
            np.testing.assert_allclose(got[i, j], want, atol=0.01)


def test_criterion_2_intersection_area():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    np.testing.assert_allclose(rotate_iou_eval(a, b, criterion=2)[0, 0], 2.0, rtol=1e-5)


# ---------- matching engine vs reference transliteration ----------

def reference_match(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                    dc_bboxes, metric, min_overlap, thresh, compute_fp,
                    compute_aos):
    """Direct transliteration of compute_statistics_jit (eval.py:233-350)."""
    det_size = dt_datas.shape[0]
    gt_size = gt_datas.shape[0]
    dt_scores = dt_datas[:, -1]
    dt_alphas = dt_datas[:, 4]
    gt_alphas = gt_datas[:, 4]
    dt_bboxes = dt_datas[:, :4]

    assigned_detection = [False] * det_size
    ignored_threshold = [False] * det_size
    if compute_fp:
        for i in range(det_size):
            if dt_scores[i] < thresh:
                ignored_threshold[i] = True
    NO_DETECTION = -10000000
    tp, fp, fn, similarity = 0, 0, 0, 0
    thresholds = []
    delta = []
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0
        assigned_ignored_det = False
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned_detection[j] or ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            dt_score = dt_scores[j]
            if not compute_fp and overlap > min_overlap and dt_score > valid_detection:
                det_idx = j
                valid_detection = dt_score
            elif (compute_fp and overlap > min_overlap
                  and (overlap > max_overlap or assigned_ignored_det)
                  and ignored_det[j] == 0):
                max_overlap = overlap
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = False
            elif (compute_fp and overlap > min_overlap
                  and valid_detection == NO_DETECTION and ignored_det[j] == 1):
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == NO_DETECTION and ignored_gt[i] == 0:
            fn += 1
        elif valid_detection != NO_DETECTION and (
            ignored_gt[i] == 1 or ignored_det[det_idx] == 1
        ):
            assigned_detection[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            thresholds.append(dt_scores[det_idx])
            if compute_aos:
                delta.append(gt_alphas[i] - dt_alphas[det_idx])
            assigned_detection[det_idx] = True
    if compute_fp:
        for i in range(det_size):
            if not (assigned_detection[i] or ignored_det[i] == -1
                    or ignored_det[i] == 1 or ignored_threshold[i]):
                fp += 1
        nstuff = 0
        if metric == 0 and len(dc_bboxes):
            overlaps_dt_dc = image_box_overlap(dt_bboxes, np.asarray(dc_bboxes), 0)
            for i in range(len(dc_bboxes)):
                for j in range(det_size):
                    if (assigned_detection[j] or ignored_det[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if overlaps_dt_dc[j, i] > min_overlap:
                        assigned_detection[j] = True
                        nstuff += 1
        fp -= nstuff
        if compute_aos:
            tmp = [0.0] * fp + [(1.0 + np.cos(d)) / 2.0 for d in delta]
            similarity = np.sum(tmp) if (tp > 0 or fp > 0) else -1
    return tp, fp, fn, similarity, thresholds


def random_case(rng, n_gt, n_dt):
    overlaps = rng.rand(n_dt, n_gt)
    gt_datas = np.concatenate(
        [rng.rand(n_gt, 4) * 100, rng.uniform(-np.pi, np.pi, (n_gt, 1))], 1
    )
    dt_datas = np.concatenate(
        [rng.rand(n_dt, 4) * 100, rng.uniform(-np.pi, np.pi, (n_dt, 1)),
         rng.rand(n_dt, 1)], 1
    )
    ignored_gt = rng.choice([-1, 0, 1], n_gt, p=[0.2, 0.6, 0.2])
    ignored_det = rng.choice([-1, 0, 1], n_dt, p=[0.2, 0.6, 0.2])
    dc = rng.rand(2, 4) * 100
    return overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("compute_fp", [False, True])
def test_match_engine_vs_reference(seed, compute_fp):
    rng = np.random.RandomState(seed)
    overlaps, gt_datas, dt_datas, ig, idt, dc = random_case(rng, 12, 15)
    threshs = [0.0, 0.3, 0.6] if compute_fp else [0.0]
    tp, fp, fn, sim, tp_scores = _match_image(
        overlaps, gt_datas, dt_datas, ig, idt, dc, metric=0,
        min_overlap=0.5, threshs=threshs, compute_fp=compute_fp,
        compute_aos=True,
    )
    for t, thr in enumerate(threshs):
        rtp, rfp, rfn, rsim, rthr = reference_match(
            overlaps, gt_datas, dt_datas, ig, idt, dc, metric=0,
            min_overlap=0.5, thresh=thr, compute_fp=compute_fp,
            compute_aos=True,
        )
        assert tp[t] == rtp, (t, thr)
        assert fn[t] == rfn
        if compute_fp:
            assert fp[t] == rfp
            np.testing.assert_allclose(sim[t], rsim, rtol=1e-9)
        np.testing.assert_allclose(sorted(tp_scores[t]), sorted(rthr))


# ---------- end-to-end AP ----------

def make_annos(rng, n_imgs=40, perfect=True):
    """Enough gt (> 41) that the recall sampling reaches every point —
    with few gt boxes AP_R40 caps below 100 by construction (the reference
    behaves identically)."""
    gt_annos, dt_annos = [], []
    for _ in range(n_imgs):
        n = rng.randint(2, 8)
        x = rng.uniform(-20, 20, n)
        z = rng.uniform(5, 60, n)
        y = np.full(n, 1.65)
        l = rng.uniform(3.5, 4.5, n)
        h = rng.uniform(1.4, 1.7, n)
        w = rng.uniform(1.5, 1.8, n)
        ry = rng.uniform(-np.pi, np.pi, n)
        x1 = rng.uniform(0, 600, n)
        y1 = rng.uniform(0, 200, n)
        bw = rng.uniform(60, 200, n)
        bh = rng.uniform(45, 120, n)
        bbox = np.stack([x1, y1, x1 + bw, y1 + bh], -1)
        alpha = rng.uniform(-np.pi, np.pi, n)
        gt = {
            "name": np.array(["Car"] * n),
            "truncated": np.zeros(n),
            "occluded": np.zeros(n, np.int64),
            "alpha": alpha,
            "bbox": bbox,
            "dimensions": np.stack([l, h, w], -1),
            "location": np.stack([x, y, z], -1),
            "rotation_y": ry,
            "score": np.zeros(n),
        }
        gt_annos.append(gt)
        dt = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in gt.items()}
        dt["score"] = rng.uniform(0.5, 1.0, n)
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_perfect_detections_ap_100():
    rng = np.random.RandomState(0)
    gt_annos, dt_annos = make_annos(rng)
    result_str, ret, car_moderate = get_official_eval_result(gt_annos, dt_annos, 0)
    np.testing.assert_allclose(car_moderate, 100.0, atol=0.5)
    np.testing.assert_allclose(ret["Car_3d_easy_R40"], 100.0, atol=0.5)
    np.testing.assert_allclose(ret["Car_bev_moderate_R40"], 100.0, atol=0.5)
    assert "Car AP@0.70, 0.70, 0.70" in result_str


def test_empty_detections_ap_0():
    rng = np.random.RandomState(1)
    gt_annos, dt_annos = make_annos(rng)
    empty = {
        "name": np.array([]), "truncated": np.array([]),
        "occluded": np.array([], np.int64), "alpha": np.array([]),
        "bbox": np.zeros((0, 4)), "dimensions": np.zeros((0, 3)),
        "location": np.zeros((0, 3)), "rotation_y": np.array([]),
        "score": np.array([]),
    }
    _, ret, car_moderate = get_official_eval_result(
        gt_annos, [dict(empty) for _ in gt_annos], 0
    )
    assert car_moderate == 0.0


def test_get_thresholds_spacing():
    scores = np.linspace(0.99, 0.01, 200)
    th = get_thresholds(scores.copy(), 200)
    assert len(th) == 41
    assert th[0] >= th[-1]
