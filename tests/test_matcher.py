"""On-device LAP solver + Hungarian matcher vs scipy ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from monodetr_tpu.models.matcher import (
    BIG_COST,
    hungarian_match,
    lap_solve,
    matching_cost,
)


@pytest.mark.parametrize("n", [3, 10, 50])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lap_solve_optimal(n, seed):
    rng = np.random.RandomState(seed)
    C = rng.randn(n, n).astype(np.float32) * 10
    rows, cols = linear_sum_assignment(C)
    got = np.asarray(lap_solve(jnp.asarray(C)))
    # assignments may differ under cost ties; compare total cost
    want_cost = C[rows, cols].sum()
    got_cost = C[np.arange(n), got].sum()
    assert len(set(got.tolist())) == n  # a permutation
    np.testing.assert_allclose(got_cost, want_cost, rtol=1e-5)


def test_lap_solve_vmap():
    rng = np.random.RandomState(3)
    C = rng.rand(7, 12, 12).astype(np.float32)
    got = np.asarray(jax.vmap(lap_solve)(jnp.asarray(C)))
    for b in range(7):
        r, c = linear_sum_assignment(C[b])
        np.testing.assert_allclose(
            C[b][np.arange(12), got[b]].sum(), C[b][r, c].sum(), rtol=1e-5
        )


def np_reference_cost(logits, boxes, labels, tboxes, alpha=0.25, gamma=2.0):
    """Reference matcher cost (matcher.py:57-86) in numpy."""
    prob = 1 / (1 + np.exp(-logits))
    neg = (1 - alpha) * prob**gamma * (-np.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-np.log(prob + 1e-8))
    cls = pos[:, labels] - neg[:, labels]
    center = np.abs(boxes[:, None, :2] - tboxes[None, :, :2]).sum(-1)
    bbox = np.abs(boxes[:, None, 2:6] - tboxes[None, :, 2:6]).sum(-1)

    def to_xyxy(x):
        return np.stack(
            [x[:, 0] - x[:, 2], x[:, 1] - x[:, 4], x[:, 0] + x[:, 3], x[:, 1] + x[:, 5]],
            -1,
        )

    def giou(b1, b2):
        area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
        area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
        rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        union = area1[:, None] + area2[None, :] - inter
        iou = inter / union
        lt_e = np.minimum(b1[:, None, :2], b2[None, :, :2])
        rb_e = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
        wh_e = np.clip(rb_e - lt_e, 0, None)
        area = wh_e[..., 0] * wh_e[..., 1]
        return iou - (area - union) / area

    g = -giou(to_xyxy(boxes), to_xyxy(tboxes))
    return 5 * bbox + 10 * center + 2 * cls + 2 * g


def make_example(rng, B=2, G=3, nq=8, T=8, n_valid=(5, 3)):
    QG = G * nq
    logits = rng.randn(B, QG, 3).astype(np.float32)
    boxes = np.concatenate(
        [rng.rand(B, QG, 2), rng.rand(B, QG, 4) * 0.2 + 0.02], -1
    ).astype(np.float32)
    labels = rng.randint(0, 3, (B, T)).astype(np.int32)
    tboxes = np.concatenate(
        [rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.2 + 0.02], -1
    ).astype(np.float32)
    mask = np.zeros((B, T), bool)
    for b, nv in enumerate(n_valid):
        mask[b, :nv] = True
    return logits, boxes, labels, tboxes, mask


def test_hungarian_match_vs_scipy(rng):
    G, nq, T = 3, 8, 8
    logits, boxes, labels, tboxes, mask = make_example(rng, G=G, nq=nq, T=T)
    outputs = {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    targets = {
        "labels": jnp.asarray(labels),
        "boxes_3d": jnp.asarray(tboxes),
        "mask": jnp.asarray(mask),
    }
    matched = np.asarray(hungarian_match(outputs, targets, group_num=G))
    B = logits.shape[0]
    for b in range(B):
        valid = mask[b]
        nv = valid.sum()
        for g in range(G):
            ql, qh = g * nq, (g + 1) * nq
            C = np_reference_cost(
                logits[b, ql:qh], boxes[b, ql:qh], labels[b][valid], tboxes[b][valid]
            )
            r, c = linear_sum_assignment(C.T)  # rows = targets
            want_cost = C.T[r, c].sum()
            got_q = matched[b, g][valid] - ql
            got_cost = C.T[np.arange(nv), got_q].sum()
            np.testing.assert_allclose(got_cost, want_cost, rtol=1e-4)
            # matched queries distinct
            assert len(set(got_q.tolist())) == nv


def test_matching_cost_matches_numpy(rng):
    logits = rng.randn(8, 3).astype(np.float32)
    boxes = np.concatenate([rng.rand(8, 2), rng.rand(8, 4) * 0.2 + 0.02], -1).astype(np.float32)
    labels = rng.randint(0, 3, (4,)).astype(np.int32)
    tboxes = np.concatenate([rng.rand(4, 2), rng.rand(4, 4) * 0.2 + 0.02], -1).astype(np.float32)
    want = np_reference_cost(logits, boxes, labels, tboxes)
    got = np.asarray(
        matching_cost(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(tboxes), jnp.ones(4, bool),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", list(range(8)))
def test_lap_solve_masked_rectangular_vs_scipy(seed):
    """Padded/masked problems (the training shape): valid rows must get the
    same optimal cost as scipy on the reduced [K, n] rectangular problem.

    Regression guard: a LAPJV-style column-reduction greedy init satisfied
    complementary slackness but broke the rectangular SAP invariant
    (partial matchings must be optimal for their row set), producing ~2%
    suboptimal assignments on exactly this shape.
    """
    rng = np.random.RandomState(100 + seed)
    n = 50
    K = rng.randint(1, 20)
    C = (rng.rand(n, n) * 10).astype(np.float32)
    # valid-first rows like hungarian_match's sort; ghosts get BIG_COST
    C[K:] = BIG_COST
    valid = np.zeros(n, bool)
    valid[:K] = True
    # adversarial: make several rows share the same argmin column so the
    # greedy round conflicts and SAP must augment through matched columns
    C[: min(K, 5), 0] = 0.01 * np.arange(min(K, 5))

    got = np.asarray(lap_solve(jnp.asarray(C), jnp.asarray(valid)))
    r, c = linear_sum_assignment(C[:K])
    want_cost = C[:K][r, c].sum()
    got_cost = C[np.arange(K), got[:K]].sum()
    assert len(set(got[:K].tolist())) == K  # injective on valid rows
    np.testing.assert_allclose(got_cost, want_cost, rtol=1e-5)
    assert (got[K:] == -1).all()  # ghost rows untouched
