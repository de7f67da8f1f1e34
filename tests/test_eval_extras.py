"""Distance-band / COCO-style evaluators and the offline eval CLI."""

import numpy as np

from monodetr_tpu.eval.kitti_eval.eval import (
    get_coco_eval_result,
    get_distance_eval_result,
)
from tests.test_kitti_eval import make_annos


def test_distance_eval_perfect():
    rng = np.random.RandomState(0)
    gt, dt = make_annos(rng, n_imgs=40)
    result, ret = get_distance_eval_result(gt, dt, 0)
    assert "AP(distance)" in result
    # boxes exist in all bands; perfect detections -> high AP where gt dense
    assert ret["Car_3d_30m_R40"] >= 0.0
    assert "Car_3d_70m_R40" in ret
    # the three bands partition gt; at least one band should be near-perfect
    assert max(ret["Car_3d_30m_R40"], ret["Car_3d_50m_R40"], ret["Car_3d_70m_R40"]) > 90


def test_coco_eval_runs():
    rng = np.random.RandomState(1)
    gt, dt = make_annos(rng, n_imgs=20)
    result = get_coco_eval_result(gt, dt, 0)
    assert "coco AP@0.50:0.05:0.95" in result
    assert "3d   AP" in result


def test_evaluate_cli(tmp_path):
    from monodetr_tpu.eval.kitti_eval.evaluate import evaluate

    rng = np.random.RandomState(2)
    gt, dt = make_annos(rng, n_imgs=10)
    gt_dir = tmp_path / "label_2"
    dt_dir = tmp_path / "results"
    gt_dir.mkdir()
    dt_dir.mkdir()
    for i, (g, d) in enumerate(zip(gt, dt)):
        for path, anno, with_score in [(gt_dir, g, False), (dt_dir, d, True)]:
            lines = []
            for j in range(len(anno["name"])):
                l, h, w = anno["dimensions"][j]
                row = (
                    f"{anno['name'][j]} {anno['truncated'][j]:.2f} "
                    f"{int(anno['occluded'][j])} {anno['alpha'][j]:.2f} "
                    + " ".join(f"{v:.2f}" for v in anno["bbox"][j])
                    + f" {h:.2f} {w:.2f} {l:.2f} "
                    + " ".join(f"{v:.2f}" for v in anno["location"][j])
                    + f" {anno['rotation_y'][j]:.2f}"
                )
                if with_score:
                    row += f" {anno['score'][j]:.3f}"
                lines.append(row)
            with open(path / ("%06d.txt" % i), "w") as f:
                f.write("\n".join(lines) + "\n")
    split = tmp_path / "val.txt"
    split.write_text("\n".join("%06d" % i for i in range(10)) + "\n")

    out = evaluate(str(gt_dir), str(dt_dir), str(split), current_class=0)
    result_str, ret_dict, car_mod = out
    assert "Car AP@0.70" in result_str
    assert np.isfinite(car_mod)
