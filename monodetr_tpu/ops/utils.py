"""Small numeric primitives shared across the model: inverse sigmoid,
bilinear grid-sampling, sine positional tables, LID depth bins, heading-angle
bin encode/decode.

These mirror the math of the reference (file:line cited per function) but are
written as shape-polymorphic jnp functions so XLA fuses them into neighbours.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

NUM_HEADING_BIN = 12  # lib/datasets/utils.py:6


def inverse_sigmoid(x, eps=1e-5):
    """utils/misc.py:473-477."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def grid_sample_bilinear(img, coords, align_corners=False):
    """Bilinear sampling of `img` [H, W, C] at normalized coords [..., 2]
    in [-1, 1] (x, y) — torch.nn.functional.grid_sample semantics with
    padding_mode='zeros'.

    align_corners=False: pixel centers at (i + 0.5) / size * 2 - 1.
    align_corners=True: corners at -1 and 1 exactly.

    Used by: MSDA reference path (ops/functions/ms_deform_attn_func.py:55)
    with align_corners=False, and the depth-map readout (monodetr.py:249-253)
    with align_corners=True.
    """
    H, W, C = img.shape
    x, y = coords[..., 0], coords[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = (x + 1.0) * 0.5 * W - 0.5
        fy = (y + 1.0) * 0.5 * H - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def fetch(xi, yi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = img[yi_c, xi_c]  # [..., C]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = fetch(x0i, y0i)
    v01 = fetch(x0i + 1, y0i)
    v10 = fetch(x0i, y0i + 1)
    v11 = fetch(x0i + 1, y0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def lid_bin_values(num_bins, depth_min, depth_max):
    """LID (linear increasing discretization) bin centers + overflow value.

    Matches depth_predictor.py:21-24: returns [num_bins + 1] with the last
    entry = depth_max.
    """
    bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    idx = np.arange(num_bins, dtype=np.float64)
    vals = (idx + 0.5) ** 2 * bin_size / 2 - bin_size / 8 + depth_min
    return np.concatenate([vals, [depth_max]]).astype(np.float32)


def bin_depths(depth_map, mode="LID", depth_min=1e-3, depth_max=60.0,
               num_bins=80):
    """Depth map -> bin indices, out-of-range/NaN -> num_bins.

    Matches ddn_loss.py:66-102 (target=True) for all three discretization
    modes (arxiv 2005.13423):
      UD  — uniform bins,
      LID — linearly increasing bin widths,
      SID — log-spaced (spacing-increasing) bins.
    """
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(1 + 8 * (depth_map - depth_min) / bin_size)
    elif mode == "SID":
        indices = (num_bins * (jnp.log(1 + depth_map) - math.log(1 + depth_min))
                   / (math.log(1 + depth_max) - math.log(1 + depth_min)))
    else:
        raise NotImplementedError(f"bin_depths mode {mode!r}")
    invalid = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
    indices = jnp.where(invalid, num_bins, indices)
    return indices.astype(jnp.int32)


def bin_depths_lid(depth_map, depth_min=1e-3, depth_max=60.0, num_bins=80):
    """Depth map -> LID bin indices (ddn_loss.py mode='LID', target=True)."""
    return bin_depths(depth_map, "LID", depth_min, depth_max, num_bins)


def sine_position_encoding(h, w, num_pos_feats=128, temperature=10000.0,
                           scale=2 * math.pi):
    """Normalized sine positional encoding [H, W, 2*num_pos_feats].

    Matches PositionEmbeddingSine with normalize=True and an all-valid mask
    (position_encoding.py:36-56): cumsum of ones == index + 1.
    """
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=2)  # [H, W, 2*num_pos_feats]


def angle2class_np(angle):
    """Continuous heading angle -> (bin id, residual).  lib/datasets/utils.py:8-16."""
    angle = angle % (2 * np.pi)
    angle_per_class = 2 * np.pi / float(NUM_HEADING_BIN)
    shifted_angle = (angle + angle_per_class / 2) % (2 * np.pi)
    class_id = int(shifted_angle / angle_per_class)
    residual_angle = shifted_angle - (class_id * angle_per_class + angle_per_class / 2)
    return class_id, residual_angle


def class2angle_np(cls, residual, to_label_format=False):
    """Inverse of angle2class.  lib/datasets/utils.py:19-26."""
    angle_per_class = 2 * np.pi / float(NUM_HEADING_BIN)
    angle = cls * angle_per_class + residual
    if to_label_format and angle > np.pi:
        angle = angle - 2 * np.pi
    return angle


def gaussian_radius(bbox_size, min_overlap=0.7):
    """Minimum gaussian radius keeping IoU >= min_overlap for a (h, w) box —
    the three quadratic cases from CornerNet (lib/datasets/utils.py:29-50)."""
    height, width = bbox_size

    # NOTE: all three roots use the canonical CornerNet "(b + sqrt)/2" form
    # (without the 1/2a factor) — mathematically off for cases 2/3 but kept
    # for behavioral parity with every published implementation.
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    b1 = height + width
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * c1)) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2 ** 2 - 4 * a2 * c2)) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def gaussian2d(shape, sigma=1.0):
    """Unnormalized 2-D gaussian patch (lib/datasets/utils.py:52-58)."""
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_heatmap_gaussian(heatmap, center, radius, k=1):
    """Max-composite a gaussian peak into `heatmap` in place (umich style,
    lib/datasets/utils.py:61-74).  Host-side numpy: heatmap targets are built
    in the data pipeline, not on device."""
    diameter = 2 * radius + 1
    gaussian = gaussian2d((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]

    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    if right + left <= 0 or bottom + top <= 0:
        return heatmap
    region = heatmap[y - top:y + bottom, x - left:x + right]
    patch = gaussian[radius - top:radius + bottom, radius - left:radius + right]
    np.maximum(region, patch * k, out=region)
    return heatmap


def draw_msra_gaussian(heatmap, center, sigma):
    """Max-composite an msra-style (sigma-parameterized) gaussian
    (lib/datasets/utils.py:77-98), preserving the reference's (w, h) naming
    swap — it indexes shape[0] as w — which is harmless on square maps and
    reproduced here for bit parity."""
    tmp_size = sigma * 3
    mu_x = int(center[0] + 0.5)
    mu_y = int(center[1] + 0.5)
    w, h = heatmap.shape[0], heatmap.shape[1]
    ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
    br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
    if ul[0] >= h or ul[1] >= w or br[0] < 0 or br[1] < 0:
        return heatmap
    size = 2 * tmp_size + 1
    x = np.arange(0, size, 1, np.float32)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
    g_x = max(0, -ul[0]), min(br[0], h) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], w) - ul[1]
    img_x = max(0, ul[0]), min(br[0], h)
    img_y = max(0, ul[1]), min(br[1], w)
    heatmap[img_y[0]:img_y[1], img_x[0]:img_x[1]] = np.maximum(
        heatmap[img_y[0]:img_y[1], img_x[0]:img_x[1]],
        g[g_y[0]:g_y[1], g_x[0]:g_x[1]])
    return heatmap


def draw_projected_box3d(image, corners2d, color=(255, 255, 255), thickness=1):
    """Draw the 12 edges of a projected 3-D box into an image
    (lib/datasets/utils.py:101-124; same vertex order: 0-3 top ring, 4-7
    bottom ring).  Debug/visualization helper."""
    import cv2

    corners2d = corners2d.astype(np.int32)
    for k in range(0, 4):
        for i, j in ((k, (k + 1) % 4), (k + 4, (k + 1) % 4 + 4), (k, k + 4)):
            cv2.line(image, (corners2d[i, 0], corners2d[i, 1]),
                     (corners2d[j, 0], corners2d[j, 1]), color, thickness,
                     lineType=cv2.LINE_AA)
    return image


def interpolate_1d_embed(coord, table):
    """Linear interpolation into a 1-D embedding table.

    coord: [...] float in [0, n-1]; table: [n, C].
    Matches depth_predictor.py:99-104 (floor/ceil lerp, ceil clamped).
    """
    floor_c = jnp.floor(coord)
    delta = (coord - floor_c)[..., None]
    f = floor_c.astype(jnp.int32)
    c = jnp.clip(f + 1, None, table.shape[0] - 1)
    return table[f] * (1 - delta) + table[c] * delta
