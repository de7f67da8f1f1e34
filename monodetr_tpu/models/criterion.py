"""SetCriterion: Hungarian-matched training losses, fully on device.

Parity with reference lib/models/monodetr/monodetr.py:296-532 (SetCriterion)
and depth_predictor/ddn_loss/ (DDNLoss + Balancer + focal), re-expressed over
fixed-shape padded targets:

  - the reference converts padded target arrays into ragged per-image lists
    (trainer_helper.py:175-186) and concatenates matched pairs; we keep the
    [B, T=50] padding with a validity mask end-to-end, so every loss is a
    masked dense reduction and the whole step jits;
  - invalid target slots are routed to an out-of-bounds scatter index and
    dropped (mode='drop'), reproducing the ragged semantics exactly;
  - the DDN depth-map target rasterization replaces the reference's paint-
    far-to-near python loop (ddn_loss.py:56-62) with a per-pixel min-depth
    reduction over covering boxes (painting sorted descending by depth means
    the nearest box wins — identical result, one vectorized op).

All 8 loss terms: labels (focal), cardinality (log-only), center, boxes
(L1+GIoU), depths (Laplacian aleatoric), dims (compensated relative L1),
angles (bin CE + residual L1), depth_map (DDN focal).  Aux losses repeat all
but depth_map per intermediate decoder layer (monodetr.py:518-531).
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import box_ops
from ..ops.utils import bin_depths
from .matcher import hungarian_match


def _gather_queries(pred, matched_q):
    """pred [B, QG, ...] gathered at matched_q [B, G, T] -> [B, G, T, ...]."""
    B, G, T = matched_q.shape
    flat = matched_q.reshape(B, G * T)
    out = jnp.take_along_axis(
        pred, flat[..., None] if pred.ndim == 3 else flat, axis=1
    )
    return out.reshape((B, G, T) + pred.shape[2:])


def loss_labels(outputs, targets, matched_q, num_boxes, focal_alpha=0.25):
    """Sigmoid focal classification loss (monodetr.py:320-345)."""
    logits = outputs["pred_logits"]  # [B, QG, C]
    B, QG, C = logits.shape
    _, G, T = matched_q.shape
    labels = jnp.broadcast_to(targets["labels"][:, None, :], (B, G, T))
    valid = jnp.broadcast_to(targets["mask"][:, None, :], (B, G, T))

    # scatter matched labels into a dense [B, QG] class map (C = no-object)
    idx = jnp.where(valid, matched_q, QG)  # OOB -> dropped
    target_classes = jnp.full((B, QG), C, jnp.int32)
    target_classes = jax.vmap(
        lambda tc, i, l: tc.at[i.reshape(-1)].set(l.reshape(-1), mode="drop")
    )(target_classes, idx, labels.astype(jnp.int32))

    onehot = jax.nn.one_hot(target_classes, C, dtype=logits.dtype)  # no-obj -> zeros
    prob = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * (1 - p_t) ** 2
    alpha_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
    loss = alpha_t * loss
    return {"loss_ce": loss.sum() / num_boxes}


def loss_cardinality(outputs, targets, group_num):
    """Log-only |#non-background-argmax - #targets| (monodetr.py:347-359).
    The reference counts argmax != last-class-index."""
    logits = outputs["pred_logits"]
    card_pred = (jnp.argmax(logits, -1) != logits.shape[-1] - 1).sum(-1)
    tgt_len = targets["mask"].sum(-1)
    err = jnp.abs(card_pred.astype(jnp.float32) - tgt_len.astype(jnp.float32))
    return {"cardinality_error": jax.lax.stop_gradient(err.mean())}


def loss_center(outputs, targets, matched_q, num_boxes):
    src = _gather_queries(outputs["pred_boxes"], matched_q)[..., :2]
    tgt = targets["boxes_3d"][:, None, :, :2]
    valid = targets["mask"][:, None, :, None]
    l1 = jnp.where(valid, jnp.abs(src - tgt), 0.0)
    return {"loss_center": l1.sum() / num_boxes}


def loss_boxes(outputs, targets, matched_q, num_boxes):
    src = _gather_queries(outputs["pred_boxes"], matched_q)  # [B,G,T,6]
    tgt = jnp.broadcast_to(
        targets["boxes_3d"][:, None, :, :], src.shape
    )
    valid = targets["mask"][:, None, :]
    l1 = jnp.where(valid[..., None], jnp.abs(src[..., 2:6] - tgt[..., 2:6]), 0.0)
    giou = box_ops.generalized_box_iou_elementwise(
        box_ops.box_cxcylrtb_to_xyxy(src), box_ops.box_cxcylrtb_to_xyxy(tgt)
    )
    loss_giou = jnp.where(valid, 1.0 - giou, 0.0)
    return {
        "loss_bbox": l1.sum() / num_boxes,
        "loss_giou": loss_giou.sum() / num_boxes,
    }


def loss_depths(outputs, targets, matched_q, num_boxes):
    """Laplacian aleatoric depth loss (monodetr.py:393-404)."""
    src = _gather_queries(outputs["pred_depth"], matched_q)  # [B,G,T,2]
    d, logvar = src[..., 0], src[..., 1]
    tgt = targets["depth"][:, None, :, 0]
    valid = targets["mask"][:, None, :]
    loss = 1.4142 * jnp.exp(-logvar) * jnp.abs(d - tgt) + logvar
    return {"loss_depth": jnp.where(valid, loss, 0.0).sum() / num_boxes}


def loss_dims(outputs, targets, matched_q, num_boxes):
    """Dim-normalized L1 with no-grad compensation weight (monodetr.py:406-420)."""
    src = _gather_queries(outputs["pred_3d_dim"], matched_q)  # [B,G,T,3]
    tgt = targets["size_3d"][:, None, :, :]
    valid = targets["mask"][:, None, :, None]
    n = jnp.maximum(valid.sum() * 3.0, 1.0)

    abs_err = jnp.abs(src - tgt)
    # padded target sizes are 0; divide by 1 there so masked-out entries do
    # not inject inf into the BACKWARD pass (0-cotangent * inf = NaN)
    safe_tgt = jax.lax.stop_gradient(
        jnp.where(valid, jnp.broadcast_to(tgt, src.shape), 1.0)
    )
    dim_loss = abs_err / safe_tgt
    abs_mean = jnp.where(valid, abs_err, 0.0).sum() / n
    dim_mean = jnp.where(valid, dim_loss, 0.0).sum() / n
    comp = jax.lax.stop_gradient(abs_mean / dim_mean)
    loss = jnp.where(valid, dim_loss * comp, 0.0)
    return {"loss_dim": loss.sum() / num_boxes}


def loss_angles(outputs, targets, matched_q, num_boxes):
    """12-bin CE + matched-bin residual L1 (monodetr.py:422-446)."""
    src = _gather_queries(outputs["pred_angle"], matched_q)  # [B,G,T,24]
    bins = jnp.broadcast_to(
        targets["heading_bin"][:, None, :, 0], src.shape[:3]
    ).astype(jnp.int32)
    res = jnp.broadcast_to(targets["heading_res"][:, None, :, 0], src.shape[:3])
    valid = targets["mask"][:, None, :]

    cls_logits = src[..., :12]
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    cls_loss = -jnp.take_along_axis(logp, bins[..., None], axis=-1)[..., 0]

    res_pred = jnp.take_along_axis(src[..., 12:24], bins[..., None], axis=-1)[..., 0]
    reg_loss = jnp.abs(res_pred - res)

    loss = jnp.where(valid, cls_loss + reg_loss, 0.0)
    return {"loss_angle": loss.sum() / num_boxes}


def loss_depth_map(outputs, targets, fg_weight=13.0, bg_weight=1.0,
                   alpha=0.25, gamma=2.0, depth_min=1e-3, depth_max=60.0,
                   num_bins=80, raster_wh=None, bin_mode="LID"):
    """DDN depth-map loss (ddn_loss/ddn_loss.py + balancer.py + focalloss.py).

    Targets: per-pixel depth of the *nearest* valid box covering the pixel
    (reference paints boxes far->near so near overwrites), binned with LID;
    focal CE, then fg(13x)/bg(1x) balancing normalized by total pixel count.

    ``raster_wh``: the (W, H) the normalized gt boxes are scaled by before
    rasterization.  The reference hardcodes (80, 24) (monodetr.py:452)
    — the depth-map shape at its only supported input resolution 1280x384;
    at any other resolution its boxes land at the wrong scale.  Default
    None uses the actual depth-map dims: identical at the supported
    resolution, and still correct at others (e.g. 2x-res configs).
    """
    logits = outputs["pred_depth_map_logits"]  # [B, H, W, D+1] NHWC
    B, Hf, Wf, _ = logits.shape
    boxes = targets["boxes"]  # [B, T, 4] cxcywh normalized
    valid = targets["mask"]  # [B, T]
    depth = targets["depth"][..., 0]  # [B, T]

    rw, rh = (Wf, Hf) if raster_wh is None else raster_wh
    scale = jnp.asarray([rw, rh, rw, rh], jnp.float32)
    xyxy = box_ops.box_cxcywh_to_xyxy(boxes * scale)
    u1 = jnp.floor(xyxy[..., 0])
    v1 = jnp.floor(xyxy[..., 1])
    u2 = jnp.ceil(xyxy[..., 2])
    v2 = jnp.ceil(xyxy[..., 3])

    ys = jnp.arange(Hf, dtype=jnp.float32)[None, None, :, None]  # [1,1,H,1]
    xs = jnp.arange(Wf, dtype=jnp.float32)[None, None, None, :]  # [1,1,1,W]
    cover = (
        (xs >= u1[..., None, None])
        & (xs < u2[..., None, None])
        & (ys >= v1[..., None, None])
        & (ys < v2[..., None, None])
        & valid[..., None, None]
    )  # [B, T, H, W]

    INF = jnp.float32(1e9)
    cand = jnp.where(cover, depth[..., None, None], INF)
    pix_depth = cand.min(axis=1)  # [B, H, W]
    fg_mask = cover.any(axis=1)  # [B, H, W]
    pix_depth = jnp.where(fg_mask, pix_depth, 0.0)

    tgt_bin = bin_depths(pix_depth, bin_mode, depth_min, depth_max, num_bins)  # [B,H,W]

    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    logp_t = jnp.take_along_axis(logp, tgt_bin[..., None], axis=-1)[..., 0]
    p_t = jnp.take_along_axis(p, tgt_bin[..., None], axis=-1)[..., 0]
    focal = -alpha * (1.0 - p_t) ** gamma * logp_t  # [B, H, W]

    weights = jnp.where(fg_mask, fg_weight, bg_weight)
    num_pixels = B * Hf * Wf
    return {"loss_depth_map": (focal * weights).sum() / num_pixels}


class SetCriterion:
    """Stateless loss aggregator mirroring reference SetCriterion + weights.

    Usage:  crit = SetCriterion(cfg_model); losses = crit(outputs, targets,
    group_num=11, train=True); total = crit.total(losses).
    """

    def __init__(self, cfg: Dict[str, Any]):
        self.num_classes = cfg.get("num_classes", 3)
        self.focal_alpha = cfg.get("focal_alpha", 0.25)
        self.dec_layers = cfg.get("dec_layers", 3)
        self.group_num = cfg.get("group_num", 11)
        self.cost_class = float(cfg.get("set_cost_class", 2))
        self.cost_3dcenter = float(cfg.get("set_cost_3dcenter", 10))
        self.cost_bbox = float(cfg.get("set_cost_bbox", 5))
        self.cost_giou = float(cfg.get("set_cost_giou", 2))
        self.depth_min = float(cfg.get("depth_min", 1e-3))
        self.depth_max = float(cfg.get("depth_max", 60.0))
        self.num_depth_bins = int(cfg.get("num_depth_bins", 80))
        # (W, H) box-raster scale for the DDN loss; None = actual map dims.
        # Set to (80, 24) to reproduce the reference's hardcoded constant
        # (monodetr.py:452) at non-default input resolutions.
        self.depth_map_raster_wh = cfg.get("depth_map_raster_wh")
        # depth-map target discretization: UD | LID | SID (ddn_loss.py:82-91).
        # The reference config carries `model.mode: LID` but never reads it
        # (DDNLoss.forward uses the LID default); here the key is wired
        # through so all three bin_depths modes are reachable from config.
        self.depth_bin_mode = cfg.get("depth_bin_mode", cfg.get("mode", "LID"))

        base = {
            "loss_ce": cfg.get("cls_loss_coef", 2),
            "loss_bbox": cfg.get("bbox_loss_coef", 5),
            "loss_giou": cfg.get("giou_loss_coef", 2),
            "loss_dim": cfg.get("dim_loss_coef", 1),
            "loss_angle": cfg.get("angle_loss_coef", 1),
            "loss_depth": cfg.get("depth_loss_coef", 1),
            "loss_center": cfg.get("3dcenter_loss_coef", 10),
            "loss_depth_map": cfg.get("depth_map_loss_coef", 1),
        }
        weight_dict = dict(base)
        for i in range(self.dec_layers - 1):
            weight_dict.update({f"{k}_{i}": v for k, v in base.items()})
        self.weight_dict = weight_dict

    def _match(self, outputs, targets, group_num):
        return hungarian_match(
            outputs, targets, group_num=group_num,
            cost_class=self.cost_class, cost_3dcenter=self.cost_3dcenter,
            cost_bbox=self.cost_bbox, cost_giou=self.cost_giou,
        )

    def _single(self, outputs, targets, matched_q, num_boxes):
        losses = {}
        losses.update(loss_labels(outputs, targets, matched_q, num_boxes, self.focal_alpha))
        losses.update(loss_center(outputs, targets, matched_q, num_boxes))
        losses.update(loss_boxes(outputs, targets, matched_q, num_boxes))
        losses.update(loss_depths(outputs, targets, matched_q, num_boxes))
        losses.update(loss_dims(outputs, targets, matched_q, num_boxes))
        losses.update(loss_angles(outputs, targets, matched_q, num_boxes))
        return losses

    def __call__(self, outputs, targets, train: bool = True):
        """All decoder layers (final + aux) are stacked on a leading axis and
        matched/scored by ONE vmapped instance of the matcher and loss set —
        the reference loops python-level over aux outputs (monodetr.py:
        518-531), which would inline dec_layers copies of the Hungarian
        solver into the XLA program and multiply compile time."""
        group_num = self.group_num if train else 1
        num_boxes = jnp.maximum(
            targets["mask"].sum().astype(jnp.float32) * group_num, 1.0
        )

        aux = outputs.get("aux_outputs", [])
        layer_keys = ("pred_logits", "pred_boxes", "pred_3d_dim",
                      "pred_depth", "pred_angle")
        stacked = {
            k: jnp.stack([a[k] for a in aux] + [outputs[k]]) for k in layer_keys
        }  # [L, B, QG, .]; last entry = final layer

        def one_layer(layer_outputs):
            matched = self._match(layer_outputs, targets, group_num)
            return self._single(layer_outputs, targets, matched, num_boxes)

        per_layer = jax.vmap(one_layer)(stacked)  # dict of [L]

        losses = {k: v[-1] for k, v in per_layer.items()}
        for i in range(len(aux)):
            losses.update({f"{k}_{i}": v[i] for k, v in per_layer.items()})

        losses.update(loss_cardinality(outputs, targets, group_num))
        losses.update(
            loss_depth_map(
                outputs, targets,
                depth_min=self.depth_min, depth_max=self.depth_max,
                num_bins=self.num_depth_bins,
                raster_wh=self.depth_map_raster_wh,
                bin_mode=self.depth_bin_mode,
            )
        )
        return losses

    def total(self, losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return sum(
            losses[k] * w for k, w in self.weight_dict.items() if k in losses
        )
