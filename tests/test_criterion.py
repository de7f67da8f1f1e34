"""Criterion parity: masked dense losses vs a numpy restatement of the
reference's ragged-list computation (monodetr.py:296-532, ddn_loss/)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from monodetr_tpu.models.criterion import SetCriterion
from tests.test_matcher import np_reference_cost

B, G, NQ, T = 2, 2, 6, 5
N_VALID = (3, 2)
CFG = {"num_classes": 3, "dec_layers": 2, "group_num": G}


def make_example(seed=0):
    rng = np.random.RandomState(seed)
    QG = G * NQ

    def outputs():
        return {
            "pred_logits": rng.randn(B, QG, 3).astype(np.float32),
            "pred_boxes": np.concatenate(
                [rng.rand(B, QG, 2), rng.rand(B, QG, 4) * 0.2 + 0.02], -1
            ).astype(np.float32),
            "pred_3d_dim": (rng.rand(B, QG, 3) * 2 + 0.5).astype(np.float32),
            "pred_depth": np.stack(
                [rng.rand(B, QG) * 50, rng.randn(B, QG) * 0.3], -1
            ).astype(np.float32),
            "pred_angle": rng.randn(B, QG, 24).astype(np.float32),
        }

    out = outputs()
    out["aux_outputs"] = [outputs()]
    out["pred_depth_map_logits"] = rng.randn(B, 6, 20, 81).astype(np.float32)

    mask = np.zeros((B, T), bool)
    for b, nv in enumerate(N_VALID):
        mask[b, :nv] = True
    targets = {
        "labels": rng.randint(0, 3, (B, T)).astype(np.int32) * mask,
        "boxes": np.concatenate(
            [rng.rand(B, T, 2) * 0.8 + 0.1, rng.rand(B, T, 2) * 0.2 + 0.05], -1
        ).astype(np.float32),
        "boxes_3d": np.concatenate(
            [rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.2 + 0.02], -1
        ).astype(np.float32),
        "depth": (rng.rand(B, T, 1) * 55 + 2).astype(np.float32),
        "size_3d": (rng.rand(B, T, 3) * 2 + 0.5).astype(np.float32),
        "heading_bin": rng.randint(0, 12, (B, T, 1)).astype(np.int64),
        "heading_res": (rng.randn(B, T, 1) * 0.2).astype(np.float32),
        "mask": mask,
    }
    return out, targets


def reference_losses(out, targets):
    """Numpy restatement of the reference's ragged loss computation."""
    num_boxes = max(sum(N_VALID) * G, 1)
    losses = {}

    # per-(b, g) scipy matching
    matches = []  # list of (b, q_idx [nv], t_idx [nv])
    for b in range(B):
        nv = N_VALID[b]
        for g in range(G):
            ql, qh = g * NQ, (g + 1) * NQ
            C = np_reference_cost(
                out["pred_logits"][b, ql:qh],
                out["pred_boxes"][b, ql:qh],
                targets["labels"][b, :nv],
                targets["boxes_3d"][b, :nv],
            )
            q_i, t_i = linear_sum_assignment(C)
            matches.append((b, q_i + ql, t_i))

    # labels: focal over all queries
    QG = G * NQ
    tc = np.full((B, QG), 3, np.int64)
    for b, q_i, t_i in matches:
        tc[b, q_i] = targets["labels"][b, t_i]
    onehot = np.zeros((B, QG, 3), np.float32)
    for b in range(B):
        for q in range(QG):
            if tc[b, q] < 3:
                onehot[b, q, tc[b, q]] = 1
    x = out["pred_logits"]
    prob = 1 / (1 + np.exp(-x))
    ce = np.maximum(x, 0) - x * onehot + np.log1p(np.exp(-np.abs(x)))
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * (1 - p_t) ** 2 * (0.25 * onehot + 0.75 * (1 - onehot))
    losses["loss_ce"] = loss.sum() / num_boxes

    # gather matched pairs (concatenated, ragged-style)
    sb, sq, st = [], [], []
    for b, q_i, t_i in matches:
        sb += [b] * len(q_i)
        sq += list(q_i)
        st += list(t_i)
    sb, sq, st = np.array(sb), np.array(sq), np.array(st)

    pb = out["pred_boxes"][sb, sq]
    tb = targets["boxes_3d"][sb, st]
    losses["loss_center"] = np.abs(pb[:, :2] - tb[:, :2]).sum() / num_boxes
    losses["loss_bbox"] = np.abs(pb[:, 2:6] - tb[:, 2:6]).sum() / num_boxes

    def to_xyxy(x):
        return np.stack(
            [x[:, 0] - x[:, 2], x[:, 1] - x[:, 4], x[:, 0] + x[:, 3], x[:, 1] + x[:, 5]], -1
        )

    def giou_diag(b1, b2):
        area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
        area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        lt = np.maximum(b1[:, :2], b2[:, :2])
        rb = np.minimum(b1[:, 2:], b2[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        union = area1 + area2 - inter
        iou = inter / union
        lt_e = np.minimum(b1[:, :2], b2[:, :2])
        rb_e = np.maximum(b1[:, 2:], b2[:, 2:])
        wh_e = np.clip(rb_e - lt_e, 0, None)
        area = wh_e[:, 0] * wh_e[:, 1]
        return iou - (area - union) / area

    losses["loss_giou"] = (1 - giou_diag(to_xyxy(pb), to_xyxy(tb))).sum() / num_boxes

    pd = out["pred_depth"][sb, sq]
    td = targets["depth"][sb, st, 0]
    dl = 1.4142 * np.exp(-pd[:, 1]) * np.abs(pd[:, 0] - td) + pd[:, 1]
    losses["loss_depth"] = dl.sum() / num_boxes

    ps = out["pred_3d_dim"][sb, sq]
    ts = targets["size_3d"][sb, st]
    dim_loss = np.abs(ps - ts) / ts
    comp = np.abs(ps - ts).mean() / dim_loss.mean()
    losses["loss_dim"] = (dim_loss * comp).sum() / num_boxes

    pa = out["pred_angle"][sb, sq]
    tbin = targets["heading_bin"][sb, st, 0]
    tres = targets["heading_res"][sb, st, 0]
    logits = pa[:, :12]
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    cls_l = -logp[np.arange(len(tbin)), tbin]
    res_l = np.abs(pa[np.arange(len(tbin)), 12 + tbin] - tres)
    losses["loss_angle"] = (cls_l + res_l).sum() / num_boxes

    # depth map: painting loop far -> near (ddn_loss.py:43-64)
    dm_logits = out["pred_depth_map_logits"]  # [B, H, W, 81]
    _, Hf, Wf, _ = dm_logits.shape
    scale = np.array([Wf, Hf, Wf, Hf], np.float32)
    depth_map = np.zeros((B, Hf, Wf), np.float32)
    fg = np.zeros((B, Hf, Wf), bool)
    for b in range(B):
        nv = N_VALID[b]
        boxes = targets["boxes"][b, :nv] * scale
        xyxy = np.stack(
            [boxes[:, 0] - boxes[:, 2] / 2, boxes[:, 1] - boxes[:, 3] / 2,
             boxes[:, 0] + boxes[:, 2] / 2, boxes[:, 1] + boxes[:, 3] / 2], -1
        )
        xyxy[:, :2] = np.floor(xyxy[:, :2])
        xyxy[:, 2:] = np.ceil(xyxy[:, 2:])
        xyxy = xyxy.astype(np.int64)
        depths = targets["depth"][b, :nv, 0]
        order = np.argsort(-depths)
        for n in order:
            u1, v1, u2, v2 = xyxy[n]
            depth_map[b, v1:v2, u1:u2] = depths[n]
        for n in range(nv):
            u1, v1, u2, v2 = xyxy[n]
            fg[b, v1:v2, u1:u2] = True

    bin_size = 2 * (60.0 - 1e-3) / (80 * 81)
    idx = -0.5 + 0.5 * np.sqrt(1 + 8 * (depth_map - 1e-3) / bin_size)
    idx[(idx < 0) | (idx > 80) | ~np.isfinite(idx)] = 80
    tgt_bin = idx.astype(np.int64)
    lp = dm_logits - dm_logits.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    p = np.exp(lp)
    bi, yi, xi = np.meshgrid(np.arange(B), np.arange(Hf), np.arange(Wf), indexing="ij")
    lp_t = lp[bi, yi, xi, tgt_bin]
    p_t = p[bi, yi, xi, tgt_bin]
    focal = -0.25 * (1 - p_t) ** 2 * lp_t
    w = np.where(fg, 13.0, 1.0)
    losses["loss_depth_map"] = (focal * w).sum() / (B * Hf * Wf)

    return losses


def test_losses_match_reference_semantics():
    out, targets = make_example()
    crit = SetCriterion(CFG)
    import jax
    got = jax.jit(lambda o, t: crit(o, t, train=True))(
        {k: jnp.asarray(v) if not isinstance(v, list) else [
            {kk: jnp.asarray(vv) for kk, vv in a.items()} for a in v
        ] for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    want = reference_losses(out, targets)
    for k, v in want.items():
        np.testing.assert_allclose(
            float(got[k]), v, rtol=2e-4, atol=1e-5, err_msg=k
        )
    # aux losses present with _0 suffix
    assert "loss_ce_0" in got and "loss_bbox_0" in got
    # weighted total is finite
    assert np.isfinite(float(crit.total(got)))


def test_total_weighting():
    out, targets = make_example()
    crit = SetCriterion(CFG)
    import jax
    got = jax.jit(lambda o, t: crit(o, t, train=True))(
        {k: jnp.asarray(v) if not isinstance(v, list) else [
            {kk: jnp.asarray(vv) for kk, vv in a.items()} for a in v
        ] for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    total = float(crit.total(got))
    manual = sum(
        float(got[k]) * w for k, w in crit.weight_dict.items() if k in got
    )
    np.testing.assert_allclose(total, manual, rtol=1e-6)
    # cardinality_error is log-only: not in the weight dict
    assert "cardinality_error" not in crit.weight_dict
