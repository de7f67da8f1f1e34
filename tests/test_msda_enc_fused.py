"""Fused-prologue encoder MSDA vs the composed oracle.

`ops/msda_enc_pallas.ms_deform_attn_enc_fused` folds the attention
prologue (per-head softmax over the 16 (level, point) lanes, the window
clamp, the static grid centers) and epilogue (softmax/clamp chain rule)
into the Pallas kernel.  The oracle composes the same math in plain jnp —
softmax + clip + `ms_deform_attn_windowed` (itself certified against the
exact gather formulation and torch grid_sample, test_msda_windowed.py /
test_msda.py) — and gradients come from jax AD through that chain.

The test shapes include widths that are not multiples of 8 (4 and 2), so
the width-padding path (pad queries clamp to the last real column with
attention 0) is exercised everywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodetr_tpu.ops.msda_enc_pallas import ms_deform_attn_enc_fused
from monodetr_tpu.ops.msda_pallas import _center_positions
from monodetr_tpu.ops.msda_windowed import ms_deform_attn_windowed

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

SHAPES = ((8, 16), (4, 8), (2, 4), (1, 2))
H, L, P, G = 8, 4, 4, 8
S = sum(h * w for h, w in SHAPES)


def oracle(value, off, logits, window=G):
    """Same math in plain jnp: softmax -> clip -> windowed sampling."""
    B = off.shape[0]
    att = jax.nn.softmax(
        logits.astype(jnp.float32).reshape(B, S, H, L * P), axis=-1
    ).reshape(B, S, H, L, P)
    lim = window / 2 - 1 - 1e-2
    offc = jnp.clip(off.astype(jnp.float32), -lim, lim)
    ox = offc[..., :128].reshape(B, S, H, L, P)
    oy = offc[..., 128:].reshape(B, S, H, L, P)
    centers = _center_positions(SHAPES)  # [S, L, 2] (x, y) level px
    fx = centers[None, :, None, :, None, 0] + ox
    fy = centers[None, :, None, :, None, 1] + oy
    sizes = jnp.asarray([[w, h] for h, w in SHAPES], jnp.float32)
    loc = jnp.stack([(fx + 0.5) / sizes[None, None, None, :, None, 0],
                     (fy + 0.5) / sizes[None, None, None, :, None, 1]], -1)
    return ms_deform_attn_windowed(value, SHAPES, loc, att, window)


def make_inputs(rng, B=1, D=4, beyond=False):
    value = rng.randn(B, S, H, D).astype(np.float32)
    lim = G / 2 - 1 - 1e-2
    if beyond:
        # mix of in-window and far-out-of-window offsets (clamped hard).
        # 0.05 rather than 0.0: at exactly grid-aligned sampling positions
        # bilinear has only a subgradient, and the kernel's tie choice (0,
        # same as ops/msda_pallas.py) differs from XLA AD's one-sided pick.
        off = rng.choice([-lim + 0.1, lim - 0.1, 0.05, lim + 1.7, -lim - 2.3],
                         size=(B, S, 256)).astype(np.float32)
    else:
        off = (rng.rand(B, S, 256).astype(np.float32) * 2 - 1) * (lim - 0.1)
    logits = (rng.randn(B, S, 128) * 0.7).astype(np.float32)
    return value, off, logits


@pytest.mark.parametrize("beyond", [False, True])
def test_fused_matches_oracle(beyond):
    rng = np.random.RandomState(20 if beyond else 21)
    value, off, logits = make_inputs(rng, beyond=beyond)
    want = np.asarray(oracle(jnp.asarray(value), jnp.asarray(off),
                             jnp.asarray(logits)))
    got = np.asarray(ms_deform_attn_enc_fused(
        jnp.asarray(value), SHAPES, jnp.asarray(off), jnp.asarray(logits), G))
    np.testing.assert_allclose(got, want.reshape(got.shape),
                               rtol=1e-4, atol=1e-5)


def test_fused_grads_match_oracle():
    rng = np.random.RandomState(22)
    value, off, logits = make_inputs(rng, B=2)
    g = rng.randn(2, S, H * 4).astype(np.float32)

    def loss_o(v, o, lg):
        return jnp.vdot(oracle(v, o, lg).reshape(2, S, -1), g)

    def loss_f(v, o, lg):
        return jnp.vdot(ms_deform_attn_enc_fused(v, SHAPES, o, lg, G), g)

    args = (jnp.asarray(value), jnp.asarray(off), jnp.asarray(logits))
    want = jax.grad(loss_o, argnums=(0, 1, 2))(*args)
    got = jax.grad(loss_f, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("value", "off", "logits"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def test_fused_offset_grads_zero_beyond_window():
    rng = np.random.RandomState(23)
    value, off, logits = make_inputs(rng, beyond=True)
    g = rng.randn(1, S, H * 4).astype(np.float32)

    def loss_f(o):
        return jnp.vdot(ms_deform_attn_enc_fused(
            jnp.asarray(value), SHAPES, o, jnp.asarray(logits), G), g)

    goff = np.asarray(jax.grad(loss_f)(jnp.asarray(off)))
    lim = G / 2 - 1 - 1e-2
    clamped = np.abs(off) > lim
    assert clamped.any()
    assert (goff[clamped] == 0).all()

    def loss_o(o):
        return jnp.vdot(oracle(jnp.asarray(value), o,
                               jnp.asarray(logits)).reshape(1, S, -1), g)

    want = np.asarray(jax.grad(loss_o)(jnp.asarray(off)))
    np.testing.assert_allclose(goff, want, rtol=2e-3, atol=2e-4)


def test_fused_bf16_inputs():
    """bf16 transport (the production dtype) stays close to the f32 oracle."""
    rng = np.random.RandomState(24)
    value, off, logits = make_inputs(rng)
    want = np.asarray(oracle(jnp.asarray(value), jnp.asarray(off),
                             jnp.asarray(logits)))
    got = np.asarray(ms_deform_attn_enc_fused(
        jnp.asarray(value, jnp.bfloat16), SHAPES,
        jnp.asarray(off, jnp.bfloat16), jnp.asarray(logits, jnp.bfloat16),
        G).astype(jnp.float32))
    np.testing.assert_allclose(got, want.reshape(got.shape),
                               rtol=0.05, atol=0.05)
