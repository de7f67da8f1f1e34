"""Standalone loss library (jnp).

The reference ships these in `lib/losses/` as a small torch library; the
shipped MonoDETR criterion inlines the two it uses (`dim_aware_l1_loss` into
`SetCriterion.loss_dims`, the Laplacian aleatoric term into `loss_depths`) and
leaves the rest as public API.  Here they are re-implemented as pure jnp
functions with optional element masks so they compose with this framework's
padded-dense target layout (a masked mean over padded slots equals the
reference's mean over ragged concatenations).

Reference citations:
  - sigmoid_focal_loss:                 lib/losses/focal_loss.py:69-94
  - heatmap focal (RetinaNet-style):    lib/losses/focal_loss.py:6-34
  - cornernet focal:                    lib/losses/focal_loss.py:37-66
  - dim_aware_l1_loss:                  lib/losses/dim_aware_loss.py:4-14
  - laplacian/gaussian aleatoric:       lib/losses/uncertainty_loss.py:5-24
"""

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def sigmoid_focal_loss(logits, targets, num_boxes, alpha=0.25, gamma=2.0,
                       query_mask=None):
    """RetinaNet focal loss on logits: mean over the class axis, summed over
    queries, / num_boxes (focal_loss.py:69-94).

    logits/targets: [..., Q, C]; query_mask: [..., Q] optional (1 = count).
    Uses the numerically stable BCE-with-logits formulation.
    """
    p = jax.nn.sigmoid(logits)
    ce = jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    loss = jnp.mean(loss, axis=-1)  # mean over classes
    if query_mask is not None:
        loss = loss * query_mask.astype(loss.dtype)
    return jnp.sum(loss) / jnp.clip(num_boxes, 1.0, None)


def heatmap_focal_loss(probs, target, alpha=0.25, gamma=2.0):
    """Dense heatmap focal loss on probabilities (focal_loss.py:6-34).

    Positives are cells where target == 1; everything else is negative.
    Returns -(pos + neg) / num_pos (or -neg when there are no positives,
    selected with lax.cond-free arithmetic so it stays jittable).
    """
    pos = (target == 1.0).astype(probs.dtype)
    neg = (target < 1.0).astype(probs.dtype)
    eps = 1e-12
    pos_loss = jnp.log(jnp.clip(probs, eps, None)) * (1 - probs) ** gamma * pos * alpha
    neg_loss = (jnp.log(jnp.clip(1 - probs, eps, None)) * probs ** gamma * neg
                * (1 - alpha))
    num_pos = jnp.sum(pos)
    total = jnp.sum(pos_loss) + jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -jnp.sum(neg_loss), -total / jnp.clip(num_pos, 1.0, None))


def cornernet_focal_loss(probs, target, gamma=2.0):
    """CornerNet penalty-reduced focal loss (focal_loss.py:37-66): negatives
    are down-weighted by (1 - target)^4 so cells near a peak hurt less."""
    pos = (target == 1.0).astype(probs.dtype)
    neg = (target < 1.0).astype(probs.dtype)
    eps = 1e-12
    pos_loss = jnp.log(jnp.clip(probs, eps, None)) * (1 - probs) ** gamma * pos
    neg_loss = (jnp.log(jnp.clip(1 - probs, eps, None)) * probs ** gamma * neg
                * (1 - target) ** 4)
    num_pos = jnp.sum(pos)
    total = jnp.sum(pos_loss) + jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -jnp.sum(neg_loss), -total / jnp.clip(num_pos, 1.0, None))


def dim_aware_l1_loss(pred, target, dimension, mask=None):
    """L1 normalized by the (detached) gt dimension, rescaled by a no-grad
    compensation weight so the magnitude matches plain L1
    (dim_aware_loss.py:4-14)."""
    dimension = jax.lax.stop_gradient(dimension)
    loss = jnp.abs(pred - target) / dimension
    plain_l1 = _masked_mean(jnp.abs(pred - target), mask)
    compensation = jax.lax.stop_gradient(
        plain_l1 / jnp.clip(_masked_mean(loss, mask), 1e-12, None))
    return _masked_mean(loss * compensation, mask)


def laplacian_aleatoric_uncertainty_loss(pred, target, log_variance,
                                         reduction="mean", mask=None):
    """sqrt(2)·e^{-s}|x - x*| + s (uncertainty_loss.py:5-14)."""
    loss = 1.4142 * jnp.exp(-log_variance) * jnp.abs(pred - target) + log_variance
    if reduction == "sum":
        if mask is not None:
            loss = loss * jnp.broadcast_to(mask, loss.shape).astype(loss.dtype)
        return jnp.sum(loss)
    return _masked_mean(loss, mask)


def gaussian_aleatoric_uncertainty_loss(pred, target, log_variance,
                                        reduction="mean", mask=None):
    """0.5·e^{-s}|x - x*|² + 0.5·s (uncertainty_loss.py:16-24)."""
    loss = (0.5 * jnp.exp(-log_variance) * jnp.abs(pred - target) ** 2
            + 0.5 * log_variance)
    if reduction == "sum":
        if mask is not None:
            loss = loss * jnp.broadcast_to(mask, loss.shape).astype(loss.dtype)
        return jnp.sum(loss)
    return _masked_mean(loss, mask)
