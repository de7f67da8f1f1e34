"""Model forward smoke tests at reduced resolution (CPU backend):
shape contracts, train/eval query bimodality, gradient flow, stop-grad
placement on iterative references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodetr_tpu.models import MonoDETR

# 96x320 input -> backbone strides 8/16/32 give (12,40), (6,20), (3,10);
# extra level (2,5)
H, W = 96, 320
B = 2


@pytest.fixture(scope="module")
def model_and_params():
    model = MonoDETR()
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(42), (B, H, W, 3), jnp.float32)
    calibs = jnp.tile(jnp.asarray([[700.0, 0, 600, 45], [0, 700, 170, 0], [0, 0, 1, 0]]), (B, 1, 1))
    img_sizes = jnp.tile(jnp.asarray([[1242.0, 375.0]]), (B, 1))
    # jitted init: one whole-graph compile instead of per-op eager compiles
    params = jax.jit(lambda r: model.init(r, images, calibs, img_sizes, train=False))(rng)
    apply_eval = jax.jit(
        lambda p: model.apply(p, images, calibs, img_sizes, train=False)
    )
    apply_train = jax.jit(
        lambda p, r: model.apply(
            p, images, calibs, img_sizes, train=True,
            deterministic=False, rngs={"dropout": r},
        )
    )
    return model, params, images, calibs, img_sizes, apply_eval, apply_train


def test_eval_forward_shapes(model_and_params):
    model, params, images, calibs, img_sizes, apply_eval, _ = model_and_params
    out = apply_eval(params)
    assert out["pred_logits"].shape == (B, 50, 3)
    assert out["pred_boxes"].shape == (B, 50, 6)
    assert out["pred_3d_dim"].shape == (B, 50, 3)
    assert out["pred_depth"].shape == (B, 50, 2)
    assert out["pred_angle"].shape == (B, 50, 24)
    assert out["pred_depth_map_logits"].shape == (B, 6, 20, 81)
    assert out["weighted_depth"].shape == (B, 6, 20)
    assert len(out["aux_outputs"]) == 2
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    # boxes are sigmoided -> in (0, 1)
    assert (np.asarray(out["pred_boxes"]) > 0).all()
    assert (np.asarray(out["pred_boxes"]) < 1).all()


def test_train_forward_uses_grouped_queries(model_and_params):
    model, params, images, calibs, img_sizes, _, apply_train = model_and_params
    out = apply_train(params, jax.random.PRNGKey(1))
    assert out["pred_logits"].shape == (B, 550, 3)
    assert out["pred_boxes"].shape == (B, 550, 6)


@pytest.mark.slow
def test_gradients_flow_and_stopgrad(model_and_params):
    model, params, images, calibs, img_sizes, _, _ = model_and_params

    def loss_fn(p):
        out = model.apply(p, images, calibs, img_sizes, train=False)
        return (
            out["pred_boxes"].sum()
            + out["pred_logits"].sum()
            + out["pred_depth"].sum()
        )

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # backbone conv1 gets gradient (trains through the whole stack)
    g_bb = grads["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    assert float(jnp.abs(g_bb).sum()) > 0
    # query embedding gets gradient
    g_q = grads["params"]["query_embed"]
    assert float(jnp.abs(g_q).sum()) > 0


@pytest.mark.slow
def test_eval_queries_are_first_group(model_and_params):
    """Eval uses query_embed[:50] — first group of the 550 training queries
    (reference monodetr.py:195-199)."""
    model, params, images, calibs, img_sizes, apply_eval, _ = model_and_params
    out_eval = apply_eval(params)
    out_train = jax.jit(
        lambda p: model.apply(p, images, calibs, img_sizes, train=True)
    )(params)
    # The first 50 training-mode queries see a different self-attn pool
    # (their own group only) — which is the SAME pool as eval (group 0 == 50
    # queries). Deterministic + no dropout => mathematically identical;
    # tolerances account for fp32 reassociation under different batch tilings
    # amplified by the inverse-sigmoid refinement roundtrips.
    np.testing.assert_allclose(
        np.asarray(out_eval["pred_boxes"]),
        np.asarray(out_train["pred_boxes"][:, :50]),
        rtol=1e-2, atol=5e-3,
    )
