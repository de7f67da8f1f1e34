"""DN-DETR denoising-query components (fixed-shape JAX).

Capability parity with reference lib/models/monodetr/dn_components.py.
Status in the reference: **defined but not wired** — `prepare_for_dn` is
imported by monodetr.py:21 yet never called in `MonoDETR.forward`, and the
transformer call has the attention mask commented out
(monodetr.py:203-204 `...depth_pos_embed_ip)#, attn_mask)`); `use_dn` is
False in the shipped config.  We mirror that: the same functional surface
exists here (usable by a custom trainer), and the shipped model does not
invoke it.

Fixed-shape redesign: the reference pads denoising groups to the *batch
maximum* object count (dn_components.py:140, a dynamic shape); here every
group is padded to the static `max_objs` slot count with a validity mask, so
everything jits.  Padded slots carry zero queries and are excluded from the
reconstruction losses — the same treatment the reference gives its
shorter-image padding slots.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import box_ops
from ..ops.utils import inverse_sigmoid


def prepare_for_dn(rng, targets: Dict, label_embed_table: jnp.ndarray,
                   scalar: int = 5, label_noise_scale: float = 0.2,
                   box_noise_scale: float = 0.4, num_classes: int = 3):
    """Build noised denoising queries from padded targets.

    targets: labels [B, T], boxes_3d [B, T, 6], mask [B, T] (+ 3D keys)
    label_embed_table: [num_classes + 1, hidden_dim - 1] (reference
    label_enc, monodetr.py:52)

    Returns (dn_label_queries [B, S*T, hidden_dim], dn_ref_boxes_unact
    [B, S*T, 6], attn_mask [Stot, Stot] bool (True = masked), mask_dict).
    """
    B, T = targets["labels"].shape
    S = scalar

    labels = jnp.tile(targets["labels"][:, None, :], (1, S, 1))  # [B, S, T]
    boxes = jnp.tile(targets["boxes_3d"][:, None, :, :], (1, S, 1, 1))
    valid = jnp.tile(targets["mask"][:, None, :], (1, S, 1))

    k1, k2, k3 = jax.random.split(rng, 3)
    # label flip noise (dn_components.py:115-121)
    flip = jax.random.uniform(k1, labels.shape) < label_noise_scale
    rand_label = jax.random.randint(k2, labels.shape, 0, num_classes)
    noised_labels = jnp.where(flip, rand_label, labels)

    # box jitter scaled by the box extent (dn_components.py:123-132)
    diff = jnp.stack(
        [
            (boxes[..., 2] + boxes[..., 3]) / 2,
            (boxes[..., 4] + boxes[..., 5]) / 2,
            boxes[..., 2], boxes[..., 3], boxes[..., 4], boxes[..., 5],
        ],
        axis=-1,
    )
    jitter = (jax.random.uniform(k3, boxes.shape) * 2 - 1.0) * diff * box_noise_scale
    noised_boxes = jnp.clip(boxes + jitter, 0.0, 1.0)

    # label embedding + dn indicator bit (dn_components.py:134-138)
    emb = label_embed_table[noised_labels]  # [B, S, T, hidden-1]
    indicator = jnp.ones(emb.shape[:-1] + (1,), emb.dtype)
    label_queries = jnp.concatenate([emb, indicator], axis=-1)
    label_queries = jnp.where(valid[..., None], label_queries, 0.0)

    ref_unact = inverse_sigmoid(noised_boxes)
    ref_unact = jnp.where(valid[..., None], ref_unact, 0.0)

    pad_size = S * T
    label_queries = label_queries.reshape(B, pad_size, -1)
    ref_unact = ref_unact.reshape(B, pad_size, 6)

    mask_dict = {
        "pad_size": pad_size,
        "scalar": S,
        "known_labels": labels.reshape(B, pad_size),
        "known_boxes": boxes.reshape(B, pad_size, 6),
        "known_valid": valid.reshape(B, pad_size),
        "known_size_3d": jnp.tile(
            targets["size_3d"][:, None], (1, S, 1, 1)
        ).reshape(B, pad_size, 3),
        "known_depth": jnp.tile(
            targets["depth"][:, None], (1, S, 1, 1)
        ).reshape(B, pad_size, 1),
        "known_heading_bin": jnp.tile(
            targets["heading_bin"][:, None], (1, S, 1, 1)
        ).reshape(B, pad_size, 1),
        "known_heading_res": jnp.tile(
            targets["heading_res"][:, None], (1, S, 1, 1)
        ).reshape(B, pad_size, 1),
    }
    return label_queries, ref_unact, dn_attn_mask(pad_size, T, 0), mask_dict


def dn_attn_mask(pad_size: int, single_pad: int, num_match_queries: int):
    """[Stot, Stot] bool mask, True = attention BLOCKED
    (dn_components.py:157-170): match queries cannot see denoising queries;
    denoising groups cannot see each other."""
    tot = pad_size + num_match_queries
    mask = jnp.zeros((tot, tot), bool)
    if pad_size > 0:
        # match -> dn blocked
        mask = mask.at[pad_size:, :pad_size].set(True)
        n_groups = pad_size // single_pad
        row = jnp.arange(pad_size) // single_pad
        col = jnp.arange(pad_size) // single_pad
        blocked = row[:, None] != col[None, :]
        mask = mask.at[:pad_size, :pad_size].set(blocked)
    return mask


def dn_post_process(outputs_class, outputs_coord, outputs_3d_dim,
                    outputs_depth, outputs_angle, mask_dict):
    """Split decoder outputs into (dn part -> mask_dict, match part)
    (dn_components.py:188-206).  Inputs are [L, B, Q, .] stacks."""
    if mask_dict and mask_dict["pad_size"] > 0:
        p = mask_dict["pad_size"]
        mask_dict["output_known_lbs_bboxes"] = (
            outputs_class[:, :, :p],
            outputs_coord[:, :, :p],
            outputs_3d_dim[:, :, :p],
            outputs_depth[:, :, :p],
            outputs_angle[:, :, :p],
        )
        return (
            outputs_class[:, :, p:],
            outputs_coord[:, :, p:],
            outputs_3d_dim[:, :, p:],
            outputs_depth[:, :, p:],
            outputs_angle[:, :, p:],
        )
    return outputs_class, outputs_coord, outputs_3d_dim, outputs_depth, outputs_angle


def _masked_sum(x, valid):
    return jnp.where(valid, x, 0.0).sum()


def compute_dn_loss(mask_dict: Optional[Dict], training: bool, aux_num: int,
                    focal_alpha: float = 0.25):
    """Reconstruction losses on the denoising queries
    (dn_components.py:335-392): focal labels, L1+GIoU boxes, L1 center,
    bin-CE + residual angles; aux repeats per intermediate layer."""
    losses = {}
    zero = jnp.float32(0.0)
    if not (training and mask_dict and "output_known_lbs_bboxes" in mask_dict):
        base = {
            "tgt_loss_bbox": zero, "tgt_loss_giou": zero, "tgt_loss_ce": zero,
            "tgt_loss_center": zero, "tgt_loss_angle": zero,
        }
        losses.update(base)
        for i in range(aux_num):
            losses.update({f"{k}_{i}": v for k, v in base.items()})
        return losses

    (out_class, out_coord, out_dim, out_depth, out_angle) = mask_dict[
        "output_known_lbs_bboxes"
    ]
    labels = mask_dict["known_labels"]
    boxes = mask_dict["known_boxes"]
    valid = mask_dict["known_valid"]
    hbin = mask_dict["known_heading_bin"][..., 0]
    hres = mask_dict["known_heading_res"][..., 0]
    num_tgt = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)

    def layer_losses(cls_l, coord_l, angle_l):
        out = {}
        # focal labels over dn queries (tgt_loss_labels, :310-332)
        C = cls_l.shape[-1]
        onehot = jax.nn.one_hot(jnp.where(valid, labels, C), C)
        prob = jax.nn.sigmoid(cls_l)
        ce = (
            jnp.maximum(cls_l, 0) - cls_l * onehot
            + jnp.log1p(jnp.exp(-jnp.abs(cls_l)))
        )
        p_t = prob * onehot + (1 - prob) * (1 - onehot)
        fl = ce * (1 - p_t) ** 2 * (
            focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
        )
        out["tgt_loss_ce"] = jnp.where(valid[..., None], fl, 0.0).sum() / num_tgt

        out["tgt_loss_bbox"] = (
            _masked_sum(jnp.abs(coord_l[..., 2:6] - boxes[..., 2:6]),
                        valid[..., None]) / num_tgt
        )
        giou = box_ops.generalized_box_iou_elementwise(
            box_ops.box_cxcylrtb_to_xyxy(coord_l),
            box_ops.box_cxcylrtb_to_xyxy(boxes),
        )
        out["tgt_loss_giou"] = _masked_sum(1 - giou, valid) / num_tgt
        out["tgt_loss_center"] = (
            _masked_sum(jnp.abs(coord_l[..., :2] - boxes[..., :2]),
                        valid[..., None]) / num_tgt
        )

        logp = jax.nn.log_softmax(angle_l[..., :12], axis=-1)
        cls_loss = -jnp.take_along_axis(logp, hbin[..., None], axis=-1)[..., 0]
        res_pred = jnp.take_along_axis(
            angle_l[..., 12:24], hbin[..., None], axis=-1
        )[..., 0]
        out["tgt_loss_angle"] = (
            _masked_sum(cls_loss + jnp.abs(res_pred - hres), valid) / num_tgt
        )
        return out

    losses.update(layer_losses(out_class[-1], out_coord[-1], out_angle[-1]))
    for i in range(aux_num):
        li = layer_losses(out_class[i], out_coord[i], out_angle[i])
        losses.update({f"{k}_{i}": v for k, v in li.items()})
    return losses
