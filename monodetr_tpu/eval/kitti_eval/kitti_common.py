"""KITTI label txt <-> annotation-dict I/O (kitti_common.py:294-347 parity).

Annotation dict arrays: name, truncated, occluded, alpha, bbox [N,4],
dimensions [N,3] in l,h,w (converted from the label file's h,w,l),
location [N,3], rotation_y [N], score [N].
"""

import pathlib
import re

import numpy as np


def get_image_index_str(img_idx):
    return "{:06d}".format(img_idx)


def get_label_anno(label_path):
    annotations = {}
    with open(label_path) as f:
        lines = f.readlines()
    content = [line.strip().split(" ") for line in lines if line.strip()]
    annotations["name"] = np.array([x[0] for x in content])
    annotations["truncated"] = np.array([float(x[1]) for x in content])
    annotations["occluded"] = np.array([int(float(x[2])) for x in content])
    annotations["alpha"] = np.array([float(x[3]) for x in content])
    annotations["bbox"] = np.array(
        [[float(v) for v in x[4:8]] for x in content]
    ).reshape(-1, 4)
    # label file stores h, w, l; standard camera order is l, h, w
    annotations["dimensions"] = np.array(
        [[float(v) for v in x[8:11]] for x in content]
    ).reshape(-1, 3)[:, [2, 0, 1]]
    annotations["location"] = np.array(
        [[float(v) for v in x[11:14]] for x in content]
    ).reshape(-1, 3)
    annotations["rotation_y"] = np.array([float(x[14]) for x in content]).reshape(-1)
    if len(content) != 0 and len(content[0]) == 16:
        annotations["score"] = np.array([float(x[15]) for x in content])
    else:
        annotations["score"] = np.zeros([len(annotations["bbox"])])
    return annotations


def get_label_annos(label_folder, image_ids=None):
    if image_ids is None:
        filepaths = pathlib.Path(label_folder).glob("*.txt")
        prog = re.compile(r"^\d{6}.txt$")
        filepaths = filter(lambda f: prog.match(f.name), filepaths)
        image_ids = sorted(int(p.stem) for p in filepaths)
    if not isinstance(image_ids, list):
        image_ids = list(range(image_ids))
    annos = []
    label_folder = pathlib.Path(label_folder)
    for idx in image_ids:
        label_filename = label_folder / (get_image_index_str(idx) + ".txt")
        annos.append(get_label_anno(label_filename))
    return annos


def filter_annos_low_score(image_annos, thresh):
    """Drop detections below a score threshold (kitti_common.py:191-206)."""
    new_annos = []
    for anno in image_annos:
        keep = [i for i, s in enumerate(anno["score"]) if s >= thresh]
        new_annos.append({k: v[keep] for k, v in anno.items()})
    return new_annos


def add_difficulty_to_annos(info):
    """Tag each annotation with its KITTI difficulty 0/1/2 (-1 = none) —
    kitti_common.py:249-291."""
    min_height = [40, 25, 25]
    max_occlusion = [0, 1, 2]
    max_trunc = [0.15, 0.3, 0.5]
    annos = info["annos"]
    bbox = annos["bbox"]
    height = bbox[:, 3] - bbox[:, 1]
    occlusion = annos["occluded"]
    truncation = annos["truncated"]
    n = len(height)
    easy = np.ones(n, bool)
    moderate = np.ones(n, bool)
    hard = np.ones(n, bool)
    for i, (h, o, t) in enumerate(zip(height, occlusion, truncation)):
        if o > max_occlusion[0] or h <= min_height[0] or t > max_trunc[0]:
            easy[i] = False
        if o > max_occlusion[1] or h <= min_height[1] or t > max_trunc[1]:
            moderate[i] = False
        if o > max_occlusion[2] or h <= min_height[2] or t > max_trunc[2]:
            hard[i] = False
    is_moderate = np.logical_xor(easy, moderate)
    is_hard = np.logical_xor(hard, moderate)
    diff = []
    for i in range(n):
        if easy[i]:
            diff.append(0)
        elif is_moderate[i]:
            diff.append(1)
        elif is_hard[i]:
            diff.append(2)
        else:
            diff.append(-1)
    annos["difficulty"] = np.array(diff, np.int32)
    return diff
