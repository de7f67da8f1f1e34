"""DN component tests: noised query construction, attention-mask structure,
post-process split, reconstruction losses."""

import numpy as np
import jax
import jax.numpy as jnp

from monodetr_tpu.models.dn import (
    compute_dn_loss,
    dn_attn_mask,
    dn_post_process,
    prepare_for_dn,
)

B, T, S, C, HID = 2, 6, 3, 3, 32


def make_targets(rng):
    mask = np.zeros((B, T), bool)
    mask[0, :4] = True
    mask[1, :2] = True
    return {
        "labels": jnp.asarray(rng.randint(0, 3, (B, T)).astype(np.int32)),
        "boxes_3d": jnp.asarray(
            np.concatenate([rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.2 + 0.02], -1).astype(np.float32)
        ),
        "size_3d": jnp.asarray(rng.rand(B, T, 3).astype(np.float32)),
        "depth": jnp.asarray(rng.rand(B, T, 1).astype(np.float32) * 50),
        "heading_bin": jnp.asarray(rng.randint(0, 12, (B, T, 1)).astype(np.int32)),
        "heading_res": jnp.asarray(rng.randn(B, T, 1).astype(np.float32) * 0.1),
        "mask": jnp.asarray(mask),
    }


def test_prepare_for_dn_shapes_and_noise():
    rng = np.random.RandomState(0)
    targets = make_targets(rng)
    table = jnp.asarray(rng.randn(C + 1, HID - 1).astype(np.float32))
    q, ref, attn_mask, md = prepare_for_dn(
        jax.random.PRNGKey(0), targets, table, scalar=S, num_classes=C
    )
    assert q.shape == (B, S * T, HID)
    assert ref.shape == (B, S * T, 6)
    assert md["pad_size"] == S * T
    # invalid slots are zeroed
    valid = np.asarray(md["known_valid"])
    assert (np.asarray(q)[~valid] == 0).all()
    # dn indicator bit set on valid slots
    assert (np.asarray(q)[valid][:, -1] == 1.0).all()
    # noised boxes stay in [0, 1] after sigmoid
    s = jax.nn.sigmoid(jnp.asarray(ref))
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0


def test_dn_attn_mask_structure():
    pad, single, match = 6, 2, 4
    m = np.asarray(dn_attn_mask(pad, single, match))
    # match queries cannot see dn queries
    assert m[pad:, :pad].all()
    # match queries see each other
    assert not m[pad:, pad:].any()
    # dn group sees itself, not other groups
    assert not m[0, 1]
    assert m[0, 2] and m[0, 4]
    assert not m[2, 3] and m[2, 0]


def test_post_process_split():
    rng = np.random.RandomState(1)
    L, Q, pad = 3, 10, 4
    arrs = [jnp.asarray(rng.randn(L, B, Q, d).astype(np.float32)) for d in (3, 6, 3, 2, 24)]
    md = {"pad_size": pad}
    outs = dn_post_process(*arrs, md)
    assert outs[0].shape == (L, B, Q - pad, 3)
    assert md["output_known_lbs_bboxes"][0].shape == (L, B, pad, 3)
    np.testing.assert_array_equal(np.asarray(outs[1]), np.asarray(arrs[1][:, :, pad:]))


def test_compute_dn_loss_finite_and_zero_paths():
    rng = np.random.RandomState(2)
    targets = make_targets(rng)
    table = jnp.asarray(rng.randn(C + 1, HID - 1).astype(np.float32))
    q, ref, _, md = prepare_for_dn(
        jax.random.PRNGKey(0), targets, table, scalar=S, num_classes=C
    )
    pad = md["pad_size"]
    L = 3
    md["output_known_lbs_bboxes"] = (
        jnp.asarray(rng.randn(L, B, pad, 3).astype(np.float32)),
        jax.nn.sigmoid(jnp.asarray(rng.randn(L, B, pad, 6).astype(np.float32))),
        jnp.asarray(rng.randn(L, B, pad, 3).astype(np.float32)),
        jnp.asarray(rng.randn(L, B, pad, 2).astype(np.float32)),
        jnp.asarray(rng.randn(L, B, pad, 24).astype(np.float32)),
    )
    losses = compute_dn_loss(md, training=True, aux_num=2)
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert "tgt_loss_ce" in losses and "tgt_loss_ce_1" in losses
    # zero path (inference / no dn)
    z = compute_dn_loss(None, training=False, aux_num=2)
    assert all(float(v) == 0.0 for v in z.values())
