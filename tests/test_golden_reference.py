"""Executable goldens: this repo's matcher / criterion / losses vs the REAL
reference implementation imported from /root/reference and run on CPU torch
(see tests/ref_import.py for the import shims).

Unlike the hand-derived parity tests elsewhere in the suite, these cannot
encode a shared misreading: the right-hand side IS the reference code
(lib/models/monodetr/matcher.py, monodetr.py SetCriterion,
depth_predictor/ddn_loss/).  Random inputs, fp32, exact-semantics paths.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_import

ref_import.install()

from lib.models.monodetr.matcher import HungarianMatcher  # noqa: E402
from lib.models.monodetr.monodetr import SetCriterion as RefSetCriterion  # noqa: E402

from monodetr_tpu.models.criterion import SetCriterion  # noqa: E402
from monodetr_tpu.models.matcher import hungarian_match, matching_cost  # noqa: E402

B, T = 3, 8
GROUP, NQ = 2, 12  # 2 groups x 12 queries (semantics identical to 11x50)
QG = GROUP * NQ
NUM_CLASSES = 3
COUNTS = (4, 2, 6)  # objects per image (varying, none empty: squeeze() traps)
DHF, DWF = 24, 80  # depth-map grid; the reference hardcodes [80, 24] scaling


def make_case(seed=0):
    """Random predictions + targets in both layouts (padded jax / ragged torch)."""
    rng = np.random.RandomState(seed)
    out_np = {
        "pred_logits": rng.randn(B, QG, NUM_CLASSES).astype(np.float32),
        "pred_boxes": rng.rand(B, QG, 6).astype(np.float32) * 0.8 + 0.1,
        "pred_3d_dim": (rng.rand(B, QG, 3).astype(np.float32) + 0.5),
        "pred_depth": np.stack(
            [rng.rand(B, QG) * 50 + 5, rng.randn(B, QG) * 0.3], -1
        ).astype(np.float32),
        "pred_angle": rng.randn(B, QG, 24).astype(np.float32),
        # ours NHWC [B, H, W, D+1]; reference NCHW [B, D+1, H, W]
        "pred_depth_map_logits": rng.randn(B, DHF, DWF, 81).astype(np.float32),
    }
    mask = np.zeros((B, T), bool)
    for b, n in enumerate(COUNTS):
        mask[b, :n] = True
    tgt_np = {
        "labels": rng.randint(0, NUM_CLASSES, (B, T)).astype(np.int32),
        "boxes": np.concatenate(
            [rng.rand(B, T, 2) * 0.8 + 0.1, rng.rand(B, T, 2) * 0.15 + 0.02], -1
        ).astype(np.float32),
        "boxes_3d": np.concatenate(
            [rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.2 + 0.05], -1
        ).astype(np.float32),
        "depth": (rng.rand(B, T, 1) * 50 + 5).astype(np.float32),
        "size_3d": (rng.rand(B, T, 3) + 0.8).astype(np.float32),
        "heading_bin": rng.randint(0, 12, (B, T, 1)).astype(np.int32),
        "heading_res": (rng.randn(B, T, 1) * 0.2).astype(np.float32),
        "mask": mask,
    }
    return out_np, tgt_np


def to_torch_outputs(out_np, aux_np=()):
    out = {
        k: torch.from_numpy(v)
        for k, v in out_np.items()
        if k != "pred_depth_map_logits"
    }
    out["pred_depth_map_logits"] = torch.from_numpy(
        np.transpose(out_np["pred_depth_map_logits"], (0, 3, 1, 2)).copy()
    )
    if aux_np:
        out["aux_outputs"] = [
            {k: torch.from_numpy(v) for k, v in a.items()} for a in aux_np
        ]
    return out


def to_torch_targets(tgt_np):
    targets = []
    for b in range(B):
        n = int(tgt_np["mask"][b].sum())
        t = {
            "labels": torch.from_numpy(tgt_np["labels"][b, :n]).long(),
            "boxes": torch.from_numpy(tgt_np["boxes"][b, :n]),
            "boxes_3d": torch.from_numpy(tgt_np["boxes_3d"][b, :n]),
            "depth": torch.from_numpy(tgt_np["depth"][b, :n]),
            "size_3d": torch.from_numpy(tgt_np["size_3d"][b, :n]),
            "heading_bin": torch.from_numpy(tgt_np["heading_bin"][b, :n]).long(),
            "heading_res": torch.from_numpy(tgt_np["heading_res"][b, :n]),
        }
        targets.append(t)
    return targets


COSTS = dict(cost_class=2.0, cost_3dcenter=10.0, cost_bbox=5.0, cost_giou=2.0)


def ref_cost_matrices(out_t, tgt_t):
    """Per-image [Q, n_b] cost blocks, reproducing HungarianMatcher's C."""
    m = HungarianMatcher(
        cost_class=COSTS["cost_class"],
        cost_3dcenter=COSTS["cost_3dcenter"],
        cost_bbox=COSTS["cost_bbox"],
        cost_giou=COSTS["cost_giou"],
    )
    # recompute C exactly as the forward does, but return it instead of LAP
    out_prob = out_t["pred_logits"].flatten(0, 1).sigmoid()
    tgt_ids = torch.cat([v["labels"] for v in tgt_t]).long()
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * (out_prob**gamma) * (-(1 - out_prob + 1e-8).log())
    pos = alpha * ((1 - out_prob) ** gamma) * (-(out_prob + 1e-8).log())
    cost_class = pos[:, tgt_ids] - neg[:, tgt_ids]
    out_3dc = out_t["pred_boxes"][:, :, 0:2].flatten(0, 1)
    tgt_3dc = torch.cat([v["boxes_3d"][:, 0:2] for v in tgt_t])
    cost_3dcenter = torch.cdist(out_3dc, tgt_3dc, p=1)
    out_2d = out_t["pred_boxes"][:, :, 2:6].flatten(0, 1)
    tgt_2d = torch.cat([v["boxes_3d"][:, 2:6] for v in tgt_t])
    cost_bbox = torch.cdist(out_2d, tgt_2d, p=1)
    from utils.box_ops import box_cxcylrtb_to_xyxy, generalized_box_iou

    out_bbox = out_t["pred_boxes"].flatten(0, 1)
    tgt_bbox = torch.cat([v["boxes_3d"] for v in tgt_t])
    cost_giou = -generalized_box_iou(
        box_cxcylrtb_to_xyxy(out_bbox), box_cxcylrtb_to_xyxy(tgt_bbox)
    )
    C = (
        COSTS["cost_bbox"] * cost_bbox
        + COSTS["cost_3dcenter"] * cost_3dcenter
        + COSTS["cost_class"] * cost_class
        + COSTS["cost_giou"] * cost_giou
    ).view(B, QG, -1)
    sizes = [len(v["labels"]) for v in tgt_t]
    blocks = []
    for b, c in enumerate(C.split(sizes, -1)):
        blocks.append(c[b].numpy())
    return blocks, m


@pytest.mark.parametrize("seed", [0, 1])
def test_matcher_cost_matrix_matches_reference(seed):
    out_np, tgt_np = make_case(seed)
    out_t = {k: torch.from_numpy(v) for k, v in out_np.items()}
    tgt_t = to_torch_targets(tgt_np)
    ref_blocks, _ = ref_cost_matrices(out_t, tgt_t)

    for b in range(B):
        n = int(tgt_np["mask"][b].sum())
        got = np.asarray(
            matching_cost(
                jnp.asarray(out_np["pred_logits"][b]),
                jnp.asarray(out_np["pred_boxes"][b]),
                jnp.asarray(tgt_np["labels"][b, :n]),
                jnp.asarray(tgt_np["boxes_3d"][b, :n]),
                jnp.ones((n,), bool),
                **COSTS,
            )
        )
        np.testing.assert_allclose(got, ref_blocks[b], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matcher_assignment_matches_reference(seed):
    out_np, tgt_np = make_case(seed)
    out_t = {k: torch.from_numpy(v) for k, v in out_np.items()}
    tgt_t = to_torch_targets(tgt_np)

    matcher = HungarianMatcher(
        cost_class=COSTS["cost_class"],
        cost_3dcenter=COSTS["cost_3dcenter"],
        cost_bbox=COSTS["cost_bbox"],
        cost_giou=COSTS["cost_giou"],
    )
    ref_indices = matcher(out_t, tgt_t, group_num=GROUP)

    matched = np.asarray(
        hungarian_match(
            {k: jnp.asarray(out_np[k]) for k in ("pred_logits", "pred_boxes")},
            {
                "labels": jnp.asarray(tgt_np["labels"]),
                "boxes_3d": jnp.asarray(tgt_np["boxes_3d"]),
                "mask": jnp.asarray(tgt_np["mask"]),
            },
            group_num=GROUP,
            **COSTS,
        )
    )  # [B, G, T] flat query index

    for b in range(B):
        n = int(tgt_np["mask"][b].sum())
        qi, ti = ref_indices[b][0].numpy(), ref_indices[b][1].numpy()
        ref_pairs = set(zip(qi.tolist(), ti.tolist()))
        got_pairs = set()
        for g in range(GROUP):
            for t in range(n):
                got_pairs.add((int(matched[b, g, t]), t))
        assert got_pairs == ref_pairs, f"image {b}: {got_pairs} != {ref_pairs}"


def make_aux(seed):
    rng = np.random.RandomState(100 + seed)
    keys = ("pred_logits", "pred_boxes", "pred_3d_dim", "pred_depth", "pred_angle")
    shapes = {
        "pred_logits": (B, QG, NUM_CLASSES),
        "pred_boxes": (B, QG, 6),
        "pred_3d_dim": (B, QG, 3),
        "pred_depth": (B, QG, 2),
        "pred_angle": (B, QG, 24),
    }
    aux = []
    for _ in range(2):
        a = {}
        for k in keys:
            v = rng.randn(*shapes[k]).astype(np.float32)
            if k == "pred_boxes":
                v = (rng.rand(*shapes[k]) * 0.8 + 0.1).astype(np.float32)
            if k == "pred_depth":
                v = np.stack(
                    [rng.rand(B, QG) * 50 + 5, rng.randn(B, QG) * 0.3], -1
                ).astype(np.float32)
            a[k] = v
        aux.append(a)
    return aux


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_all_losses_match_reference(seed):
    """All 8 loss terms + 2 aux layers vs the reference SetCriterion."""
    out_np, tgt_np = make_case(seed)
    aux_np = make_aux(seed)

    ref_crit = RefSetCriterion(
        num_classes=NUM_CLASSES,
        matcher=HungarianMatcher(
            cost_class=COSTS["cost_class"],
            cost_3dcenter=COSTS["cost_3dcenter"],
            cost_bbox=COSTS["cost_bbox"],
            cost_giou=COSTS["cost_giou"],
        ),
        weight_dict={},
        focal_alpha=0.25,
        losses=["labels", "boxes", "cardinality", "depths", "dims", "angles",
                "center", "depth_map"],
        group_num=GROUP,
    )
    ref_crit.train()
    with torch.no_grad():
        ref_losses = ref_crit(
            to_torch_outputs(out_np, aux_np), to_torch_targets(tgt_np)
        )

    crit = SetCriterion(
        {"num_classes": NUM_CLASSES, "dec_layers": 3, "group_num": GROUP}
    )
    outputs = {k: jnp.asarray(v) for k, v in out_np.items()}
    outputs["aux_outputs"] = [
        {k: jnp.asarray(v) for k, v in a.items()} for a in aux_np
    ]
    targets = {k: jnp.asarray(v) for k, v in tgt_np.items()}
    got = crit(outputs, targets, train=True)

    keys = [
        "loss_ce", "loss_bbox", "loss_giou", "loss_depth", "loss_dim",
        "loss_angle", "loss_center", "loss_depth_map", "cardinality_error",
    ]
    aux_keys = [
        f"{k}_{i}"
        for i in range(2)
        for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_depth",
                  "loss_dim", "loss_angle", "loss_center")
    ]
    for k in keys + aux_keys:
        want = float(ref_losses[k])
        have = float(got[k])
        np.testing.assert_allclose(have, want, rtol=2e-4, atol=1e-5, err_msg=k)


def test_bin_depths_all_modes_golden():
    """bin_depths UD/LID/SID vs the reference DDNLoss.bin_depths
    (ddn_loss.py:66-102, target=True): same indices incl. the out-of-range
    and non-finite -> num_bins overflow routing."""
    from lib.models.monodetr.depth_predictor.ddn_loss.ddn_loss import DDNLoss

    from monodetr_tpu.ops.utils import bin_depths

    ref = DDNLoss()
    rng = np.random.RandomState(7)
    depth = rng.rand(16, 20).astype(np.float32) * 80 - 5  # spans out-of-range
    depth[0, :4] = [np.nan, np.inf, -np.inf, 60.0]
    depth[1, :3] = [1e-3, 0.0, 59.999]
    for mode in ("UD", "LID", "SID"):
        want = ref.bin_depths(
            torch.from_numpy(depth), mode=mode, target=True).numpy()
        have = np.asarray(bin_depths(jnp.asarray(depth), mode))
        np.testing.assert_array_equal(have, want, err_msg=mode)
