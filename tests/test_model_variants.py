"""Config-off model variants (two_stage / use_dab / two_stage_dino):
forward shapes, gradient flow, and variant-specific structure."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monodetr_tpu.models import MonoDETR

H, W, B = 64, 128, 2


def build(**kw):
    model = MonoDETR(**kw)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    calibs = jnp.tile(
        jnp.asarray([[700.0, 0, 600, 45], [0, 700, 170, 0], [0, 0, 1, 0]]),
        (B, 1, 1),
    )
    sizes = jnp.tile(jnp.asarray([[1242.0, 375.0]]), (B, 1))
    params = jax.jit(
        lambda r: model.init(r, images, calibs, sizes, train=False)
    )(jax.random.PRNGKey(0))
    return model, params, images, calibs, sizes


@pytest.mark.parametrize("variant", ["use_dab", "two_stage", "two_stage_dino"])
@pytest.mark.slow
def test_variant_forward(variant):
    model, params, images, calibs, sizes = build(**{variant: True})
    out = jax.jit(
        lambda p: model.apply(p, images, calibs, sizes, train=False)
    )(params)
    assert out["pred_logits"].shape == (B, 50, 3)
    assert out["pred_boxes"].shape == (B, 50, 6)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert np.isfinite(np.asarray(out["pred_depth"])).all()
    if variant == "two_stage":
        # encoder proposal outputs exposed (reference monodetr.py:280-282)
        S = sum((H // s) * (W // s) for s in (8, 16, 32, 64))
        assert out["enc_outputs"]["pred_logits"].shape == (B, S, 3)
        assert out["enc_outputs"]["pred_boxes"].shape == (B, S, 6)


@pytest.mark.parametrize("variant", ["use_dab", "two_stage_dino"])
@pytest.mark.slow
def test_variant_train_mode_grouped(variant):
    # dino draws its training queries from the encoder tokens (topk over
    # S = 170 at this tiny resolution), so use fewer queries per group
    kw = {variant: True}
    nq = 50
    if variant == "two_stage_dino":
        kw["num_queries"] = nq = 10
    model, params, images, calibs, sizes = build(**kw)
    out = jax.jit(
        lambda p: model.apply(p, images, calibs, sizes, train=True)
    )(params)
    assert out["pred_logits"].shape == (B, 11 * nq, 3)


@pytest.mark.slow
def test_two_stage_has_extra_head_set():
    model, params, *_ = build(two_stage=True)
    p = params["params"]
    assert "class_embed_3" in p and "bbox_embed_3" in p
    assert "pos_trans" in p["transformer"]
    assert "enc_output" in p["transformer"]


@pytest.mark.slow
def test_dab_gradients_flow():
    model, params, images, calibs, sizes = build(use_dab=True)

    def loss(p):
        out = model.apply(p, images, calibs, sizes, train=False)
        return out["pred_boxes"].sum() + out["pred_logits"].sum()

    g = jax.jit(jax.grad(loss))(params)
    g_ref = np.asarray(g["params"]["refpoint_embed"])
    g_tgt = np.asarray(g["params"]["tgt_embed"])
    assert np.isfinite(g_ref).all() and np.abs(g_ref[:50]).sum() > 0
    assert np.isfinite(g_tgt).all() and np.abs(g_tgt[:50]).sum() > 0


@pytest.mark.slow
def test_bbox_head_init_parity():
    """From-scratch init must reproduce the reference's bbox-head setup
    (monodetr.py:66-67,127,146): with box refine, head 0's final bias is
    [0,0,-2,-2,-2,-2] and later heads' are zero; init_box zero-inits the
    final kernel; two_stage resets every head's bias[2:] to 0."""
    import jax
    import numpy as np

    from tests.test_model_variants import build

    def last(params, i):
        p = params["params"][f"bbox_embed_{i}"]["layers_2"]
        return np.asarray(p["kernel"]), np.asarray(p["bias"])

    _, params, *_ = build()
    k0, b0 = last(params, 0)
    np.testing.assert_array_equal(b0, [0, 0, -2, -2, -2, -2])
    assert np.abs(k0).max() > 0
    _, b1 = last(params, 1)
    np.testing.assert_array_equal(b1, np.zeros(6))

    _, params, *_ = build(init_box=True)
    k0, b0 = last(params, 0)
    np.testing.assert_array_equal(k0, np.zeros_like(k0))
    np.testing.assert_array_equal(b0, [0, 0, -2, -2, -2, -2])

    _, params, *_ = build(two_stage=True)
    for i in range(4):  # dec_layers + 1 heads
        _, b = last(params, i)
        np.testing.assert_array_equal(b, np.zeros(6))
