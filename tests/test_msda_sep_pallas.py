"""Semi-separable MXU MSDA kernel vs the exact XLA dense implementation.

Both claim bit-faithful reference semantics (ms_deform_attn_core_pytorch),
so they must agree (the dense path is itself torch-golden-tested) on
arbitrary inputs, including out-of-range sampling locations, forward and
in all three gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodetr_tpu.ops.msda import ms_deform_attn_dense
from monodetr_tpu.ops.msda_sep_pallas import ms_deform_attn_sep

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
    out = ms_deform_attn_sep(value, SHAPES, loc, att)
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
    gs = jax.grad(loss(ms_deform_attn_sep), argnums=(0, 1, 2))(
        value, loc, att)
    for a, b, name in zip(gr, gs, ("value", "loc", "att")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=name)


def test_wide_level():
    """Production-aspect wide levels (level 0 is 48x160) at a second set
    of shapes, forward and all gradients."""
    shapes = ((8, 80), (4, 40))
    rng = np.random.RandomState(3)
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P, L = 1, 2, 8, 19, 4, 2
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Q, H, L, P, 2) * 1.4 - 0.2
                       ).astype(np.float32))
    att = rng.rand(B, Q, H, L, P).astype(np.float32)
    att = jnp.asarray(att / att.sum(axis=(-2, -1), keepdims=True))
    g = jnp.asarray(rng.randn(B, Q, H * D).astype(np.float32))

    def loss(fn):
        return lambda v, l, a: jnp.sum(fn(v, shapes, l, a) * g)

    out_r = ms_deform_attn_dense(value, shapes, loc, att)
    out_s = ms_deform_attn_sep(value, shapes, loc, att)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    gr = jax.grad(loss(ms_deform_attn_dense), argnums=(0, 1, 2))(
        value, loc, att)
    gs = jax.grad(loss(ms_deform_attn_sep), argnums=(0, 1, 2))(
        value, loc, att)
    for a, b, name in zip(gr, gs, ("value", "loc", "att")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=name)
