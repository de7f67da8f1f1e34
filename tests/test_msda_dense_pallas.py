"""Fused dense-hat MSDA kernel vs the exact XLA dense implementation.

Both claim bit-faithful reference semantics (ms_deform_attn_core_pytorch),
so they must agree with each other (and with the torch-golden-tested
ms_deform_attn_dense) on arbitrary inputs, including out-of-range sampling
locations, in forward and in all three gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodetr_tpu.ops.msda import ms_deform_attn_dense
from monodetr_tpu.ops.msda_dense_pallas import ms_deform_attn_dense_fused

SHAPES = ((12, 20), (6, 10), (3, 5), (2, 3))


def make_inputs(rng, B=2, H=4, D=8, Q=37, P=4, oob=False):
    S = sum(h * w for h, w in SHAPES)
    L = len(SHAPES)
    value = rng.randn(B, S, H, D).astype(np.float32)
    loc = rng.rand(B, Q, H, L, P, 2).astype(np.float32)
    if oob:
        loc = loc * 2.0 - 0.5  # spill beyond [0, 1] on both sides
    att = rng.rand(B, Q, H, L, P).astype(np.float32)
    att /= att.sum(axis=(-2, -1), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(att))


@pytest.mark.parametrize("oob", [False, True])
def test_forward_matches_dense(oob):
    rng = np.random.RandomState(0 if not oob else 1)
    value, loc, att = make_inputs(rng, oob=oob)
    ref = ms_deform_attn_dense(value, SHAPES, loc, att)
    out = ms_deform_attn_dense_fused(value, SHAPES, loc, att)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_dense():
    rng = np.random.RandomState(2)
    value, loc, att = make_inputs(rng, oob=True)
    g = jnp.asarray(rng.randn(*ms_deform_attn_dense(
        value, SHAPES, loc, att).shape).astype(np.float32))

    def loss(fn):
        return lambda v, l, a: jnp.sum(fn(v, SHAPES, l, a) * g)

    gr = jax.grad(loss(ms_deform_attn_dense), argnums=(0, 1, 2))(
        value, loc, att)
    gf = jax.grad(loss(ms_deform_attn_dense_fused), argnums=(0, 1, 2))(
        value, loc, att)
    for a, b, name in zip(gr, gf, ("value", "loc", "att")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=name)


def test_queries_pad_to_lane_boundary():
    # Q exactly at and just over a 128 multiple
    for q in (128, 129):
        rng = np.random.RandomState(q)
        value, loc, att = make_inputs(rng, Q=q)
        ref = ms_deform_attn_dense(value, SHAPES, loc, att)
        out = ms_deform_attn_dense_fused(value, SHAPES, loc, att)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
