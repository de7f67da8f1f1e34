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


def bin_depths_lid(depth_map, depth_min=1e-3, depth_max=60.0, num_bins=80):
    """Depth map -> LID bin indices, out-of-range/NaN -> num_bins.

    Matches ddn_loss.py:66-102 (mode='LID', target=True).
    """
    bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    indices = -0.5 + 0.5 * jnp.sqrt(1 + 8 * (depth_map - depth_min) / bin_size)
    invalid = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
    indices = jnp.where(invalid, num_bins, indices)
    return indices.astype(jnp.int32)


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
