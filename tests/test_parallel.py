"""Data-parallel tests on the virtual 8-device CPU mesh: the parallel train
step equals the single-device step numerically, and loss decreases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monodetr_tpu.models import MonoDETR
from monodetr_tpu.models.criterion import SetCriterion
from monodetr_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    shard_batch_fn,
)
from monodetr_tpu.train import build_optimizer, make_train_step

pytestmark = pytest.mark.slow  # interpret-mode Pallas / multi-device: minutes on CPU


def make_batch(rng, B, H=64, W=128, T=50):
    return {
        "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "calibs": jnp.tile(
            jnp.asarray(
                [[721.5, 0, 609.6, 44.9], [0, 721.5, 172.9, 0.2], [0, 0, 1, 0.003]],
                jnp.float32,
            )[None],
            (B, 1, 1),
        ),
        "img_sizes": jnp.tile(jnp.asarray([[1242.0, 375.0]], jnp.float32), (B, 1)),
        "labels": jnp.asarray(rng.randint(0, 3, (B, T)).astype(np.int32)),
        "boxes": jnp.asarray(
            np.concatenate([rng.rand(B, T, 2) * 0.8 + 0.1,
                            rng.rand(B, T, 2) * 0.2 + 0.02], -1).astype(np.float32)
        ),
        "boxes_3d": jnp.asarray(
            np.concatenate([rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.2 + 0.02],
                           -1).astype(np.float32)
        ),
        "depth": jnp.asarray((rng.rand(B, T, 1) * 50 + 5).astype(np.float32)),
        "size_3d": jnp.asarray((rng.rand(B, T, 3) + 0.5).astype(np.float32)),
        "heading_bin": jnp.asarray(rng.randint(0, 12, (B, T, 1)).astype(np.int32)),
        "heading_res": jnp.asarray((rng.randn(B, T, 1) * 0.2).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(B, T) > 0.8),
    }


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, jax.devices()
    model = MonoDETR()
    crit = SetCriterion({"num_classes": 3, "dec_layers": 3, "group_num": 11})
    rng = np.random.RandomState(0)
    batch = make_batch(rng, B=8)
    params = jax.jit(
        lambda r: model.init(
            r, batch["images"], batch["calibs"], batch["img_sizes"], train=True
        )
    )(jax.random.PRNGKey(0))
    return model, crit, params, batch


def test_parallel_equals_single_device(setup):
    model, crit, params, batch = setup
    opt_state, step_fn = build_optimizer(
        {"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params
    )
    mesh = make_mesh()
    pstep = make_parallel_train_step(model, crit, step_fn, mesh, donate=False)
    place = shard_batch_fn(mesh)
    sstep = make_train_step(model, crit, step_fn, donate=False)

    rng = jax.random.PRNGKey(1)
    p1, _, l1 = pstep(params, opt_state, place(batch), jnp.float32(2e-4), rng)
    p2, _, l2 = sstep(params, opt_state, batch, jnp.float32(2e-4), rng)

    np.testing.assert_allclose(
        float(l1["loss_detr"]), float(l2["loss_detr"]), rtol=1e-4
    )
    a = np.asarray(p1["params"]["query_embed"])
    b = np.asarray(p2["params"]["query_embed"])
    # SPMD partial-sum reassociation vs single-device reduction order
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_parallel_loss_decreases(setup):
    model, crit, params, batch = setup
    opt_state, step_fn = build_optimizer(
        {"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params
    )
    mesh = make_mesh()
    pstep = make_parallel_train_step(model, crit, step_fn, mesh, donate=False)
    place = shard_batch_fn(mesh)
    sharded = place(batch)
    p, s = params, opt_state
    hist = []
    for i in range(4):
        p, s, losses = pstep(p, s, sharded, jnp.float32(2e-4), jax.random.PRNGKey(i))
        hist.append(float(losses["loss_detr"]))
    assert hist[-1] < hist[0], hist
