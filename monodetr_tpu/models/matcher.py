"""On-device Hungarian matching.

The reference moves the cost matrix to the CPU and loops
scipy.optimize.linear_sum_assignment over (11 groups x batch) problems
(matcher.py:87-104) — a device->host sync in the middle of every training
step.  Here the whole thing is a jitted shortest-augmenting-path LAP solver
(the same algorithm scipy implements) over fixed-shape 50x50 padded cost
matrices, vmapped over batch x groups, so matching stays on the TPU.

Padding trick: invalid (padded) targets get a large constant cost; since all
ghost columns cost the same, they do not perturb the optimal assignment of
the real columns, and matches to ghosts are masked out downstream.

Cost terms and weights are those of reference matcher.py:62-86:
  focal-style class cost, L1 3D-center cost, L1 2D l/r/t/b cost, GIoU cost
  (cxcylrtb -> xyxy), weighted 2/10/5/2.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import box_ops

BIG_COST = 1e6


def lap_solve(cost, row_valid=None):
    """Exact LAP on a square cost matrix [n, n]; returns col4row [n]: the
    column assigned to each row.

    Shortest-augmenting-path with dual updates — the same algorithm as
    scipy.optimize.linear_sum_assignment — expressed with fixed-shape lax
    control flow so it jits and vmaps.

    row_valid [n] bool: rows marked False are skipped entirely (their
    col4row stays -1).  This mirrors the reference, which solves the
    rectangular [n_real_targets, n_queries] problem (matcher.py:89-104):
    skipped rows place no constraint on the others, so the assignment of the
    valid rows is identical to solving their sub-problem.  Perf contract:
    a skipped row contributes ZERO iterations to both inner while loops —
    under vmap the loop trip count is the max over lanes *that still have
    work*, so callers should sort valid rows first (hungarian_match does)
    to make the sequential depth track the real object count, not n.
    """
    n = cost.shape[0]
    INF = jnp.float32(1e18)
    if row_valid is None:
        row_valid = jnp.ones((n,), bool)

    # --- greedy row-reduction initialization (one fully-parallel round) ---
    # u0 = row min, v0 = 0; every row whose argmin column is uncontested is
    # matched there.  With v == 0 and tight matched edges this partial
    # matching is optimal FOR ITS ROW SET (cost(M) = sum u0 = the dual lower
    # bound valid for any column choice), which is exactly the invariant
    # shortest-augmenting-path needs on a rectangular problem — so SAP
    # completes it to the same optimum as solving from scratch, but most
    # real rows now cost ZERO Dijkstra iterations.  (Note: LAPJV's *column*
    # reduction v0[j] = min_i is NOT sound here — with rows < columns a
    # nonzero v on matched columns breaks partial-matching optimality;
    # observed as a 2% suboptimal assignment before this was removed.)
    u0 = jnp.where(row_valid, jnp.min(cost, axis=1), 0.0)
    v0 = jnp.zeros((n,))
    rows_n = jnp.arange(n, dtype=jnp.int32)
    jmin = jnp.argmin(cost, axis=1).astype(jnp.int32)     # [n] per row
    # winner per column = lowest row index claiming it
    claim = jnp.full((n,), n, jnp.int32).at[
        jnp.where(row_valid, jmin, n)].min(rows_n, mode="drop")
    has = row_valid & (claim[jmin] == rows_n)
    col4row0 = jnp.where(has, jmin, -1).astype(jnp.int32)
    row4col0 = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(has, jmin, n)].set(rows_n, mode="drop")

    def solve_row(carry, cur_row):
        u, v, col4row, row4col = carry
        # skip ghost rows and rows already matched by the greedy init
        valid = row_valid[cur_row] & (col4row[cur_row] < 0)

        shortest = jnp.full((n,), INF)
        path_row = jnp.full((n,), -1, jnp.int32)  # predecessor row per column
        SR = jnp.zeros((n,), bool)  # scanned rows
        SC = jnp.zeros((n,), bool)  # scanned columns

        def dij_cond(state):
            return state[6] < 0  # sink

        def dij_body(state):
            shortest, path_row, SR, SC, i, minVal, _sink = state
            SR = SR.at[i].set(True)
            cand = minVal + cost[i] - u[i] - v
            better = (cand < shortest) & ~SC
            shortest = jnp.where(better, cand, shortest)
            path_row = jnp.where(better, i, path_row)
            masked = jnp.where(SC, INF, shortest)
            j = jnp.argmin(masked)
            minVal = masked[j]
            SC = SC.at[j].set(True)
            r = row4col[j]
            sink = jnp.where(r < 0, j, -1)
            i = jnp.where(r < 0, i, r)
            return shortest, path_row, SR, SC, i, minVal, sink

        # skipped rows start with sink >= 0: zero Dijkstra trips
        init = (shortest, path_row, SR, SC, cur_row, jnp.float32(0.0),
                jnp.where(valid, jnp.int32(-1), jnp.int32(0)))
        shortest, path_row, SR, SC, _, minVal, sink = jax.lax.while_loop(
            dij_cond, dij_body, init
        )

        # dual updates (no-ops for skipped rows: SR/SC stay all-False there)
        u = u.at[cur_row].add(jnp.where(valid, minVal, 0.0))
        rows = jnp.arange(n)
        c4r_safe = jnp.clip(col4row, 0, n - 1)
        row_upd = SR & (rows != cur_row) & (col4row >= 0)
        u = u + jnp.where(row_upd, minVal - shortest[c4r_safe], 0.0)
        v = v - jnp.where(SC, minVal - shortest, 0.0)

        # augment along the alternating path ending at sink
        def aug_cond(state):
            return ~state[3]

        def aug_body(state):
            col4row, row4col, j, _done = state
            i = path_row[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return col4row, row4col, j_next, i == cur_row

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, ~valid)
        )
        return (u, v, col4row, row4col), None

    # scan only up to the last valid row (callers sort valid-first, so this
    # is the real object count, not n) — rows beyond never need work
    n_work = jnp.max(jnp.where(row_valid, rows_n, -1)) + 1

    def outer_cond(state):
        return state[0] < n_work

    def outer_body(state):
        cur_row, carry = state
        carry, _ = solve_row(carry, cur_row)
        return cur_row + 1, carry

    _, (u, v, col4row, row4col) = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), (u0, v0, col4row0, row4col0)),
    )
    return col4row


def matching_cost(pred_logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid,
                  cost_class=2.0, cost_3dcenter=10.0, cost_bbox=5.0,
                  cost_giou=2.0, focal_alpha=0.25, focal_gamma=2.0):
    """Cost matrix [Q, T] for one image; invalid targets -> BIG_COST."""
    prob = jax.nn.sigmoid(pred_logits)  # [Q, C]
    neg = (1 - focal_alpha) * prob**focal_gamma * (-jnp.log(1 - prob + 1e-8))
    pos = focal_alpha * (1 - prob) ** focal_gamma * (-jnp.log(prob + 1e-8))
    cls_cost = (pos - neg)[:, tgt_labels]  # [Q, T]

    center_cost = jnp.abs(
        pred_boxes[:, None, :2] - tgt_boxes[None, :, :2]
    ).sum(-1)
    bbox_cost = jnp.abs(
        pred_boxes[:, None, 2:6] - tgt_boxes[None, :, 2:6]
    ).sum(-1)
    giou_cost = -box_ops.generalized_box_iou(
        box_ops.box_cxcylrtb_to_xyxy(pred_boxes),
        box_ops.box_cxcylrtb_to_xyxy(tgt_boxes),
    )
    C = (
        cost_bbox * bbox_cost
        + cost_3dcenter * center_cost
        + cost_class * cls_cost
        + cost_giou * giou_cost
    )
    # non-finite costs would break the augmenting-path search (its while
    # loops assume totally ordered costs) — route them to BIG_COST so a bad
    # forward pass yields a degraded match, never a hang
    C = jnp.where(jnp.isfinite(C), C, BIG_COST)
    return jnp.where(tgt_valid[None, :], C, BIG_COST)


@partial(jax.jit, static_argnames=("group_num", "impl"))
def hungarian_match(outputs: Dict, targets: Dict, group_num: int = 11,
                    cost_class=2.0, cost_3dcenter=10.0, cost_bbox=5.0,
                    cost_giou=2.0, impl: str = "auto"):
    """Match padded targets to queries, per group.

    outputs: pred_logits [B, G*Nq, C], pred_boxes [B, G*Nq, 6]
    targets: labels [B, T] int, boxes_3d [B, T, 6], mask [B, T] bool
    Returns matched_q [B, G, T] int32 — for each (image, group, target slot)
    the index of the assigned query in [0, G*Nq); rows for invalid targets
    point at query 0 of their own group and must be masked with
    targets['mask'].

    impl: 'pallas' solves all B x G LAPs inside one Pallas kernel
    (ops/lap_pallas.py — no per-iteration dispatch cost), 'xla' uses the
    vmapped lax solver, 'auto' picks pallas on TPU.  Both are exact and
    bit-identical.
    """
    # the reference matcher runs under @torch.no_grad() (matcher.py:50);
    # stopping gradients here keeps autodiff out of the solver entirely
    # (required for the pallas impl, which has no VJP rule)
    outputs = jax.lax.stop_gradient(
        {k: outputs[k] for k in ("pred_logits", "pred_boxes")})
    targets = jax.lax.stop_gradient(targets)

    B, QG, C = outputs["pred_logits"].shape
    T = targets["labels"].shape[1]
    nq = QG // group_num

    logits = outputs["pred_logits"].reshape(B, group_num, nq, C)
    boxes = outputs["pred_boxes"].reshape(B, group_num, nq, 6)

    # Sort target slots valid-first so lap_solve's skipped-row fast path
    # collapses: the vmapped while-loop trip count then tracks the max real
    # object count over (batch x groups), not the max_objs=50 padding.
    mask = targets["mask"]
    order = jnp.argsort(~mask, axis=1, stable=True)  # [B, T]
    labels_s = jnp.take_along_axis(targets["labels"], order, axis=1)
    tboxes_s = jnp.take_along_axis(
        targets["boxes_3d"], order[..., None], axis=1)
    valid_s = jnp.take_along_axis(mask, order, axis=1)

    assert T <= nq, (T, nq)

    def cost_one(logits_g, boxes_g, labels, tboxes, valid):
        C_qt = matching_cost(
            logits_g, boxes_g, labels, tboxes, valid,
            cost_class, cost_3dcenter, cost_bbox, cost_giou,
        )
        # LAP over rows=targets (pad to nq), cols=queries
        C_tq = C_qt.T  # [T, nq]
        pad = nq - T
        row_valid = valid
        if pad > 0:
            C_tq = jnp.concatenate(
                [C_tq, jnp.full((pad, nq), BIG_COST)], axis=0
            )
            row_valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        return C_tq, row_valid

    C, rv = jax.vmap(  # over batch
        jax.vmap(cost_one, in_axes=(0, 0, None, None, None)),  # over groups
        in_axes=(0, 0, 0, 0, 0),
    )(logits, boxes, labels_s, tboxes_s, valid_s)  # [B, G, nq, nq], [B, G, nq]

    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform in ("tpu", "axon")
                else "xla")
    if impl == "pallas":
        from ..ops.lap_pallas import lap_solve_pallas

        matched_s = lap_solve_pallas(C, rv)[..., :T]
    else:
        matched_s = jax.vmap(jax.vmap(lap_solve))(C, rv)[..., :T]

    # undo the valid-first sort: slot order[b, i] was solved as row i
    inv = jnp.argsort(order, axis=1)  # [B, T]
    matched = jnp.take_along_axis(
        matched_s, jnp.broadcast_to(inv[:, None, :], matched_s.shape), axis=2)

    # unsolved (invalid) slots come back as -1; pin them to query 0 of their
    # own group so the post-offset index never aliases ANOTHER group's
    # queries for a consumer that forgets to mask
    matched = jnp.where(matched >= 0, matched, 0)

    # offset into the flat G*Nq query axis
    offsets = (jnp.arange(group_num) * nq)[None, :, None]
    return matched + offsets
