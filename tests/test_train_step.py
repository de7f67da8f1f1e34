"""End-to-end training integration on synthetic KITTI at reduced resolution:
the jitted train step (forward + matching + losses + backward + reference
AdamW) decreases the loss; optimizer semantics match the reference's AdamW;
frozen parameters do not move; checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monodetr_tpu.data import KITTIDataset
from monodetr_tpu.data.loader import DataLoader
from monodetr_tpu.models import MonoDETR
from monodetr_tpu.models.criterion import SetCriterion
from monodetr_tpu.train import build_optimizer, lr_at_epoch, make_train_step
from monodetr_tpu.train.checkpoint import (
    get_checkpoint_state,
    load_checkpoint,
    save_checkpoint,
)
from tests.synthetic_kitti import make_synthetic_kitti

MODEL_CFG = {"num_classes": 3, "dec_layers": 3, "group_num": 11}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_train")
    make_synthetic_kitti(str(root), n_train=4, n_val=2)
    ds = KITTIDataset(
        "train",
        {
            "root_dir": str(root),
            "writelist": ["Car"],
            "resolution": [320, 96],
            "aug_pd": False, "aug_crop": False, "random_flip": 0.0,
        },
    )
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    model = MonoDETR()
    crit = SetCriterion(MODEL_CFG)

    batch, _ = next(iter(dl))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(
        lambda r: model.init(
            r, batch["images"], batch["calibs"], batch["img_sizes"], train=True
        )
    )(jax.random.PRNGKey(0))
    return model, crit, params, batch


@pytest.mark.slow
def test_train_step_decreases_loss(setup):
    model, crit, params, batch = setup
    # the default train step donates its inputs: work on copies so the
    # module-scoped fixture params survive for the other tests
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state, step_fn = build_optimizer({"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params)
    train_step = make_train_step(model, crit, step_fn)

    rng = jax.random.PRNGKey(1)
    losses_hist = []
    p, s = params, opt_state
    for i in range(8):
        rng, sub = jax.random.split(rng)
        p, s, losses = train_step(p, s, batch, jnp.float32(2e-4), sub)
        losses_hist.append(float(losses["loss_detr"]))
    assert np.isfinite(losses_hist).all()
    # overfitting two images: loss must drop substantially
    assert losses_hist[-1] < losses_hist[0] * 0.9, losses_hist


@pytest.mark.slow
def test_frozen_params_do_not_move(setup):
    model, crit, params, batch = setup
    p_in = jax.tree_util.tree_map(jnp.copy, params)
    opt_state, step_fn = build_optimizer({"type": "adamw", "lr": 1e-2, "weight_decay": 1e-4}, p_in)
    train_step = make_train_step(model, crit, step_fn)
    p, s, _ = train_step(p_in, opt_state, batch, jnp.float32(1e-2), jax.random.PRNGKey(2))

    before = params["params"]["backbone"]
    after = p["params"]["backbone"]
    # stem + layer1 + FrozenBN affines frozen
    np.testing.assert_array_equal(np.asarray(before["conv1"]["kernel"]), np.asarray(after["conv1"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(before["layer1_0"]["conv2"]["kernel"]), np.asarray(after["layer1_0"]["conv2"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(before["layer3_0"]["bn2"]["scale"]), np.asarray(after["layer3_0"]["bn2"]["scale"]))
    # layer2+ conv kernels DO move
    assert not np.array_equal(
        np.asarray(before["layer2_0"]["conv2"]["kernel"]),
        np.asarray(after["layer2_0"]["conv2"]["kernel"]),
    )


def test_ref_adamw_matches_torch_reference():
    """Update rule == reference optimizer_helper.AdamW (p -= step_size *
    (wd*p + m/(sqrt(v)+eps)), raw EMAs, bias-corrected step size)."""
    from monodetr_tpu.train.optimizer import ref_adamw

    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 4).astype(np.float32)
    grads = [rng.randn(5, 4).astype(np.float32) for _ in range(3)]

    # manual reference loop
    p_ref = p0.copy()
    m = np.zeros_like(p0)
    v = np.zeros_like(p0)
    lr, wd, b1, b2, eps = 1e-3, 1e-4, 0.9, 0.999, 1e-8
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step_size = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        p_ref = p_ref - step_size * (wd * p_ref + m / (np.sqrt(v) + eps))

    init, update = ref_adamw(wd)
    params = {"w": jnp.asarray(p0)}
    state = init(params)
    mask_t = {"w": True}
    for g in grads:
        upd, state = update({"w": jnp.asarray(g)}, state, params, lr, mask_t, mask_t)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), p_ref, rtol=1e-5, atol=1e-7)


def test_lr_schedule():
    cfg = {"decay_list": [125, 165], "decay_rate": 0.1, "warmup": False}
    assert lr_at_epoch(cfg, 2e-4, 0) == 2e-4
    assert lr_at_epoch(cfg, 2e-4, 124) == 2e-4
    np.testing.assert_allclose(lr_at_epoch(cfg, 2e-4, 125), 2e-5)
    np.testing.assert_allclose(lr_at_epoch(cfg, 2e-4, 170), 2e-6)
    cfg_w = dict(cfg, warmup=True)
    assert lr_at_epoch(cfg_w, 2e-4, 0) == 1e-5
    assert 1e-5 < lr_at_epoch(cfg_w, 2e-4, 3) < 2e-4
    assert lr_at_epoch(cfg_w, 2e-4, 5) == 2e-4


def test_checkpoint_roundtrip(setup, tmp_path):
    model, crit, params, batch = setup
    opt_state, _ = build_optimizer({"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params)
    state = get_checkpoint_state(params, opt_state, epoch=7, best_result=12.3, best_epoch=5)
    save_checkpoint(state, str(tmp_path / "checkpoint"))
    loaded = load_checkpoint(str(tmp_path / "checkpoint.pth"))
    assert loaded["epoch"] == 7
    assert loaded["best_result"] == 12.3
    orig = jax.tree_util.tree_leaves(params)
    back = jax.tree_util.tree_leaves(loaded["model_state"])
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), b)


@pytest.mark.slow
def test_train_step_accepts_rbg_rng(setup):
    """The trainer's `rng_impl: rbg` knob hands the train step a TYPED
    rbg key (raw uint32 keys silently re-wrap as threefry at the first
    split); one full step must run and stay finite."""
    model, crit, params, batch = setup
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state, step_fn = build_optimizer(
        {"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params)
    train_step = make_train_step(model, crit, step_fn)

    rng = jax.random.key(444, impl="rbg")
    rng, sub = jax.random.split(rng)
    _, _, losses = train_step(params, opt_state, batch, jnp.float32(2e-4), sub)
    assert np.isfinite(float(losses["loss_detr"]))
