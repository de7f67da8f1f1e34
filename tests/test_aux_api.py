"""Tests for the auxiliary API surface: standalone losses (lib/losses/),
gaussian heatmap helpers (lib/datasets/utils.py), centernet decode helpers
(lib/helpers/decode_helper.py:116-172), warmup/BN schedules, and the
DETR-style logging utilities (utils/misc.py).

Goldens are independent torch/numpy restatements — nothing is imported from
the reference."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from monodetr_tpu.ops import losses as L
from monodetr_tpu.ops import utils as U
from monodetr_tpu.train.scheduler import lr_at_epoch


@pytest.fixture
def rng():
    return np.random.RandomState(7)


# ------------------------------- losses ----------------------------------


def test_sigmoid_focal_loss_matches_torch(rng):
    logits = rng.randn(4, 20, 3).astype(np.float32)
    targets = (rng.rand(4, 20, 3) > 0.8).astype(np.float32)
    num_boxes = 9.0

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(targets)
    prob = lt.sigmoid()
    ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = prob * tt + (1 - prob) * (1 - tt)
    loss = ce * (1 - p_t) ** 2
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    want = float((alpha_t * loss).mean(2).sum() / num_boxes)
    # the reference mean(1)s over queries then sums batch x classes; with the
    # class-mean formulation here the equivalent is mean over classes, sum
    # over batch x queries — same scalar for the same tensor.
    got = float(L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                     num_boxes))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_heatmap_focal_losses(rng):
    probs = rng.rand(2, 3, 8, 8).astype(np.float32) * 0.98 + 0.01
    target = np.zeros_like(probs)
    target[0, 1, 2, 3] = 1.0
    target[1, 0, 4, 4] = 1.0
    target[1, 0, 4, 5] = 0.6  # near-peak soft value

    pos = (target == 1).astype(np.float64)
    neg = (target < 1).astype(np.float64)
    p = probs.astype(np.float64)

    pos_l = np.log(p) * (1 - p) ** 2 * pos * 0.25
    neg_l = np.log(1 - p) * p ** 2 * neg * 0.75
    want = -(pos_l.sum() + neg_l.sum()) / pos.sum()
    got = float(L.heatmap_focal_loss(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    pos_lc = np.log(p) * (1 - p) ** 2 * pos
    neg_lc = np.log(1 - p) * p ** 2 * neg * (1 - target) ** 4
    want_c = -(pos_lc.sum() + neg_lc.sum()) / pos.sum()
    got_c = float(L.cornernet_focal_loss(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5)


def test_heatmap_focal_no_positives(rng):
    probs = rng.rand(1, 2, 4, 4).astype(np.float32) * 0.5 + 0.1
    target = np.zeros_like(probs)
    want = -(np.log(1 - probs.astype(np.float64))
             * probs.astype(np.float64) ** 2 * 0.75).sum()
    got = float(L.heatmap_focal_loss(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dim_aware_l1_matches_torch(rng):
    pred = rng.randn(5, 3).astype(np.float32)
    target = (rng.rand(5, 3) + 0.5).astype(np.float32)
    dim = (rng.rand(5, 3) + 0.5).astype(np.float32)

    pt, tt, dt = map(torch.from_numpy, (pred, target, dim))
    loss_t = (pt - tt).abs() / dt
    comp = F.l1_loss(pt, tt) / loss_t.mean()
    want = float((loss_t * comp).mean())
    got = float(L.dim_aware_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(dim)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_aleatoric_losses(rng):
    pred = rng.randn(11).astype(np.float32)
    target = rng.randn(11).astype(np.float32)
    logvar = rng.randn(11).astype(np.float32)

    lap_want = (1.4142 * np.exp(-logvar) * np.abs(pred - target) + logvar).mean()
    gau_want = (0.5 * np.exp(-logvar) * np.abs(pred - target) ** 2
                + 0.5 * logvar).mean()
    np.testing.assert_allclose(
        float(L.laplacian_aleatoric_uncertainty_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(logvar))),
        lap_want, rtol=1e-5)
    np.testing.assert_allclose(
        float(L.gaussian_aleatoric_uncertainty_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(logvar))),
        gau_want, rtol=1e-5)
    lap_sum = float(L.laplacian_aleatoric_uncertainty_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(logvar),
        reduction="sum"))
    np.testing.assert_allclose(lap_sum, lap_want * 11, rtol=1e-5)


def test_masked_losses_ignore_padding(rng):
    pred = rng.randn(6, 3).astype(np.float32)
    target = (rng.rand(6, 3) + 0.5).astype(np.float32)
    dim = (rng.rand(6, 3) + 0.5).astype(np.float32)
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)[:, None]

    got = float(L.dim_aware_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(dim), mask=jnp.asarray(mask)))
    want = float(L.dim_aware_l1_loss(jnp.asarray(pred[:3]),
                                     jnp.asarray(target[:3]),
                                     jnp.asarray(dim[:3])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# --------------------------- gaussian helpers ----------------------------


def test_gaussian_radius_known_values():
    # r must keep IoU >= overlap; spot-check the canonical formula's outputs
    r = U.gaussian_radius((24.0, 48.0), min_overlap=0.7)
    # case-wise roots computed by hand for (h=24, w=48):
    b1, c1 = 72.0, 24 * 48 * 0.3 / 1.7
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * c1)) / 2
    b2, c2 = 144.0, 0.3 * 24 * 48
    r2 = (b2 + np.sqrt(b2 ** 2 - 16 * c2)) / 2
    a3, b3, c3 = 2.8, -0.7 * 144.0, -0.3 * 24 * 48
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    assert r == pytest.approx(min(r1, r2, r3))
    assert r3 == min(r1, r2, r3)  # the shrink case binds


def test_gaussian2d_peak_and_symmetry():
    g = U.gaussian2d((7, 7), sigma=7 / 6)
    assert g[3, 3] == pytest.approx(1.0)
    np.testing.assert_allclose(g, g.T)
    np.testing.assert_allclose(g, g[::-1, ::-1])


def test_draw_heatmap_gaussian_clipping_and_max():
    hm = np.zeros((10, 12), np.float32)
    U.draw_heatmap_gaussian(hm, (2, 1), radius=3)  # partially off the top
    assert hm[1, 2] == pytest.approx(1.0)
    assert hm.max() <= 1.0
    before = hm.copy()
    U.draw_heatmap_gaussian(hm, (3, 2), radius=2)  # overlapping: max-composite
    assert (hm >= before - 1e-7).all()
    # fully off-image centers are a no-op
    hm2 = np.zeros((10, 12), np.float32)
    U.draw_heatmap_gaussian(hm2, (-8, -8), radius=2)
    assert hm2.sum() == 0.0


def test_draw_msra_gaussian_center_value():
    hm = np.zeros((16, 16), np.float32)
    U.draw_msra_gaussian(hm, (8, 8), sigma=2)
    assert hm[8, 8] == pytest.approx(1.0)
    assert 0 < hm[8, 10] < 1


# ------------------------------ schedules --------------------------------


def test_lr_schedule_reference_recipe():
    cfg = {"warmup": True, "decay_list": [125, 165], "decay_rate": 0.1}
    assert lr_at_epoch(cfg, 2e-4, 0) == pytest.approx(1e-5)
    assert lr_at_epoch(cfg, 2e-4, 5) == pytest.approx(2e-4)
    assert lr_at_epoch(cfg, 2e-4, 125) == pytest.approx(2e-5)
    assert lr_at_epoch(cfg, 2e-4, 165) == pytest.approx(2e-6)


def test_lr_schedule_cosine_decay():
    """`type: 'cos'` — declared in the reference config (monodetr.yaml:99)
    but ignored by its build_lr_scheduler; honored here as cosine annealing
    base_lr -> 0 over max_epoch, composed with the 5-epoch cosine warmup."""
    import math

    cfg = {"type": "cos", "warmup": False}
    assert lr_at_epoch(cfg, 2e-4, 0, max_epoch=100) == pytest.approx(2e-4)
    assert lr_at_epoch(cfg, 2e-4, 50, max_epoch=100) == pytest.approx(1e-4)
    assert lr_at_epoch(cfg, 2e-4, 100, max_epoch=100) == pytest.approx(0.0, abs=1e-12)
    assert lr_at_epoch(cfg, 2e-4, 25, max_epoch=100) == pytest.approx(
        2e-4 * 0.5 * (1 + math.cos(math.pi * 0.25)))
    # warmup takes precedence for the first 5 epochs
    cfg = {"type": "cos", "warmup": True}
    assert lr_at_epoch(cfg, 2e-4, 0, max_epoch=100) == pytest.approx(1e-5)
    # step config unaffected by the new kwarg
    step = {"warmup": False, "decay_list": [10], "decay_rate": 0.1}
    assert lr_at_epoch(step, 2e-4, 10, max_epoch=100) == pytest.approx(2e-5)
