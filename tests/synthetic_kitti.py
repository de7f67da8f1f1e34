"""Synthetic KITTI-format dataset fixture.

Generates a miniature, physically-consistent KITTI directory tree (images +
calib + labels + ImageSets) for pipeline/trainer/eval tests: boxes are real
projections of parked 3D "cars", and each car is painted into the image so a
model can in principle fit the data.
"""

import os

import numpy as np
from PIL import Image

P2 = np.array(
    [
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ],
    dtype=np.float32,
)

CALIB_TXT = """P0: 721.5377 0.0 609.5593 0.0 0.0 721.5377 172.854 0.0 0.0 0.0 1.0 0.0
P1: 721.5377 0.0 609.5593 -387.5744 0.0 721.5377 172.854 0.0 0.0 0.0 1.0 0.0
P2: 721.5377 0.0 609.5593 44.85728 0.0 721.5377 172.854 0.2163791 0.0 0.0 1.0 0.002745884
P3: 721.5377 0.0 609.5593 -339.5 0.0 721.5377 172.854 2.199936 0.0 0.0 1.0 0.002729905
R0_rect: 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0
Tr_velo_to_cam: 0.0 -1.0 0.0 0.0 0.0 0.0 -1.0 0.0 1.0 0.0 0.0 0.0
Tr_imu_to_velo: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0
"""


def _project(pts3d):
    """[N,3] rect coords -> [N,2] pixels."""
    hom = np.hstack([pts3d, np.ones((len(pts3d), 1))])
    uvw = hom @ P2.T
    return uvw[:, :2] / uvw[:, 2:3]


def _corners3d(pos, h, w, l, ry):
    x_c = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y_c = [0, 0, 0, 0, -h, -h, -h, -h]
    z_c = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    R = np.array(
        [[np.cos(ry), 0, np.sin(ry)], [0, 1, 0], [-np.sin(ry), 0, np.cos(ry)]]
    )
    return (R @ np.vstack([x_c, y_c, z_c])).T + pos


def make_synthetic_kitti(root, n_train=8, n_val=4, img_w=1242, img_h=375,
                         seed=0, max_cars=4):
    rng = np.random.RandomState(seed)
    n_total = n_train + n_val

    for sub in ["training/image_2", "training/calib", "training/label_2", "ImageSets"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    ids = []
    for idx in range(n_total):
        img = (rng.rand(img_h, img_w, 3) * 40 + 100).astype(np.uint8)
        # horizon gradient
        img[: img_h // 2] = (img[: img_h // 2].astype(np.int32) + 60).clip(0, 255)

        lines = []
        n_cars = rng.randint(1, max_cars + 1)
        for _ in range(n_cars):
            z = rng.uniform(8, 45)
            x = rng.uniform(-0.5, 0.5) * z * 0.6
            y = 1.65  # ground plane
            h, w, l = (
                rng.uniform(1.4, 1.7),
                rng.uniform(1.5, 1.8),
                rng.uniform(3.4, 4.5),
            )
            ry = rng.uniform(-np.pi, np.pi)
            pos = np.array([x, y, z])
            corners = _corners3d(pos, h, w, l, ry)
            if (corners[:, 2] <= 0.5).any():
                continue
            uv = _project(corners)
            x1, y1 = uv.min(0)
            x2, y2 = uv.max(0)
            x1c, y1c = max(x1, 0), max(y1, 0)
            x2c, y2c = min(x2, img_w - 1), min(y2, img_h - 1)
            if x2c - x1c < 15 or y2c - y1c < 15:
                continue
            # paint the car
            color = rng.randint(0, 80, 3)
            img[int(y1c):int(y2c), int(x1c):int(x2c)] = color

            alpha = ry - np.arctan2(x, z)
            if alpha > np.pi:
                alpha -= 2 * np.pi
            if alpha < -np.pi:
                alpha += 2 * np.pi
            trunc = 0.0
            occ = 0
            lines.append(
                "Car %.2f %d %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f"
                % (trunc, occ, alpha, x1c, y1c, x2c, y2c, h, w, l, x, y, z, ry)
            )

        Image.fromarray(img).save(os.path.join(root, "training/image_2", "%06d.png" % idx))
        with open(os.path.join(root, "training/calib", "%06d.txt" % idx), "w") as f:
            f.write(CALIB_TXT)
        with open(os.path.join(root, "training/label_2", "%06d.txt" % idx), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        ids.append("%06d" % idx)

    with open(os.path.join(root, "ImageSets/train.txt"), "w") as f:
        f.write("\n".join(ids[:n_train]) + "\n")
    with open(os.path.join(root, "ImageSets/val.txt"), "w") as f:
        f.write("\n".join(ids[n_train:]) + "\n")
    with open(os.path.join(root, "ImageSets/trainval.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return root
