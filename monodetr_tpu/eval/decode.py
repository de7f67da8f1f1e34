"""NMS-free detection decoding.

`extract_dets_from_outputs` (on device, jit-able): flat top-k over
(queries x classes) sigmoid scores, gathers box/heading/depth/dim/sigma into
the reference's 37-column detection layout (decode_helper.py:57-110).

`decode_detections` (host, numpy): threshold filter, unnormalize, back-project
(x3d, y3d, depth) through the calibration, heading bin -> alpha -> ry,
score *= exp(-sigma) (decode_helper.py:8-54).

The reference decode_helper.py also carries legacy centernet helpers
(_nms/_topk/_gather_feat, :116-172) that its DETR decode path never
calls; they are deliberately not re-implemented.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import box_ops
from ..ops.utils import class2angle_np


def extract_dets_from_outputs(outputs: Dict, topk: int = 50) -> jnp.ndarray:
    """[B, topk, 37]: label, score, x2d, y2d, w2d, h2d, depth, 24 heading,
    3 size_3d, x3d, y3d, exp(-sigma)."""
    out_logits = outputs["pred_logits"]  # [B, Q, C]
    out_bbox = outputs["pred_boxes"]  # [B, Q, 6]
    B, Q, C = out_logits.shape

    prob = jax.nn.sigmoid(out_logits).reshape(B, Q * C)
    topk_values, topk_indexes = jax.lax.top_k(prob, topk)
    topk_boxes = topk_indexes // C  # query index
    labels = topk_indexes % C

    def g(x, width):
        return jnp.take_along_axis(x, topk_boxes[..., None].repeat(width, -1), axis=1)

    heading = g(outputs["pred_angle"], 24)
    size_3d = g(outputs["pred_3d_dim"], 3)
    depth_sig = g(outputs["pred_depth"], 2)
    depth = depth_sig[..., 0:1]
    sigma = jnp.exp(-depth_sig[..., 1:2])
    boxes = g(out_bbox, 6)

    xs3d = boxes[..., 0:1]
    ys3d = boxes[..., 1:2]
    corner_2d = box_ops.box_cxcylrtb_to_xyxy(boxes)
    xywh_2d = box_ops.box_xyxy_to_cxcywh(corner_2d)

    return jnp.concatenate(
        [
            labels[..., None].astype(jnp.float32),
            topk_values[..., None],
            xywh_2d[..., 0:2],
            xywh_2d[..., 2:4],
            depth,
            heading,
            size_3d,
            xs3d,
            ys3d,
            sigma,
        ],
        axis=2,
    )


def get_heading_angle(heading: np.ndarray) -> float:
    """24-vector -> alpha (decode_helper.py:175-179)."""
    heading_bin, heading_res = heading[0:12], heading[12:24]
    cls = int(np.argmax(heading_bin))
    return class2angle_np(cls, float(heading_res[cls]), to_label_format=True)


def decode_detections(dets: np.ndarray, info: Dict, calibs: List,
                      cls_mean_size: np.ndarray, threshold: float) -> Dict:
    """Host-side decode to per-image KITTI-format rows
    [cls_id, alpha, x1, y1, x2, y2, h, w, l, X, Y, Z, ry, score]."""
    results = {}
    for i in range(dets.shape[0]):
        preds = []
        for j in range(dets.shape[1]):
            cls_id = int(dets[i, j, 0])
            score = dets[i, j, 1]
            if score < threshold:
                continue

            x = dets[i, j, 2] * info["img_size"][i][0]
            y = dets[i, j, 3] * info["img_size"][i][1]
            w = dets[i, j, 4] * info["img_size"][i][0]
            h = dets[i, j, 5] * info["img_size"][i][1]
            bbox = [x - w / 2, y - h / 2, x + w / 2, y + h / 2]

            depth = dets[i, j, 6]
            dimensions = dets[i, j, 31:34] + cls_mean_size[cls_id]

            x3d = dets[i, j, 34] * info["img_size"][i][0]
            y3d = dets[i, j, 35] * info["img_size"][i][1]
            locations = calibs[i].img_to_rect(
                np.array([x3d]), np.array([y3d]), np.array([depth])
            ).reshape(-1)
            locations[1] += dimensions[0] / 2

            alpha = get_heading_angle(dets[i, j, 7:31])
            ry = calibs[i].alpha2ry(alpha, x)

            score = score * dets[i, j, -1]
            preds.append(
                [cls_id, alpha] + bbox + dimensions.tolist()
                + locations.tolist() + [ry, score]
            )
        results[info["img_id"][i]] = preds
    return results


CLASS_NAMES = ["Pedestrian", "Car", "Cyclist"]


def save_results(results: Dict, output_dir: str):
    """Write KITTI-format txt per image (tester_helper.py:112-132)."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    for img_id, preds in results.items():
        path = os.path.join(output_dir, "%06d.txt" % img_id)
        with open(path, "w") as f:
            for p in preds:
                f.write(CLASS_NAMES[int(p[0])])
                f.write(" 0.0 0")
                for x in p[1:]:
                    f.write(" %.2f" % x)
                f.write("\n")
