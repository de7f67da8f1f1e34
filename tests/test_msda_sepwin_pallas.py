"""Semi-separable windowed MSDA (ops/msda_sepwin_pallas) vs the windowed
oracle.

`ms_deform_attn_sepwin` must match `ms_deform_attn_windowed` (the pure-XLA
oracle, itself certified against the exact gather formulation and torch
grid_sample — see test_msda_windowed.py / test_msda.py) for outputs AND all
three gradients.  It shares the clamp/pack prologue with
`ms_deform_attn_pallas`; only the kernel compute structure differs
(x-major strips + per-point MXU matmuls vs banded VPU weight build).

On CPU the kernel runs in Pallas interpreter mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodetr_tpu.ops.msda_sepwin_pallas import ms_deform_attn_sepwin
from monodetr_tpu.ops.msda_windowed import ms_deform_attn_windowed

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

SHAPES = ((8, 16), (4, 8), (2, 4), (1, 2))
H, P, G = 8, 4, 8


def grid_refs(shapes):
    refs = []
    for h, w in shapes:
        ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                             indexing="ij")
        refs.append(np.stack([xs / w, ys / h], -1).reshape(-1, 2))
    return np.concatenate(refs, 0)


def make_inputs(rng, B=1, D=4, edge_heavy=False):
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    value = rng.randn(B, S, H, D).astype(np.float32)
    refs = grid_refs(SHAPES)

    lim = G / 2 - 1 - 1e-2
    if edge_heavy:
        off = rng.choice([-lim, lim, 0.0], size=(B, S, H, L, P, 2)).astype(
            np.float32)
    else:
        off = (rng.rand(B, S, H, L, P, 2).astype(np.float32) * 2 - 1) * lim

    norm = np.array([[w, h] for h, w in SHAPES], np.float32)
    loc = refs[None, :, None, None, None, :] + \
        off / norm[None, None, None, :, None, :]

    attn = rng.rand(B, S, H, L, P).astype(np.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    return value, loc.astype(np.float32), attn


@pytest.mark.parametrize("edge_heavy", [False, True])
def test_sepwin_matches_windowed(edge_heavy):
    rng = np.random.RandomState(20 if edge_heavy else 21)
    value, loc, attn = make_inputs(rng, edge_heavy=edge_heavy)

    want = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    got = np.asarray(ms_deform_attn_sepwin(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sepwin_out_of_window_clamps_like_windowed():
    rng = np.random.RandomState(22)
    value, loc, attn = make_inputs(rng)
    loc = loc + rng.choice([-0.5, 0.0, 0.7], size=loc.shape).astype(np.float32)

    want = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    got = np.asarray(ms_deform_attn_sepwin(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sepwin_grads_match_windowed():
    rng = np.random.RandomState(23)
    value, loc, attn = make_inputs(rng)

    def loss_w(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_windowed(v, SHAPES, l, a, G)))

    def loss_p(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_sepwin(v, SHAPES, l, a, G)))

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g_want = jax.grad(loss_w, argnums=(0, 1, 2))(*args)
    g_got = jax.grad(loss_p, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("value", "loc", "attn"), g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def test_sepwin_grads_with_batch():
    """RMW strip-gradient accumulation across tiles and batch entries."""
    rng = np.random.RandomState(24)
    value, loc, attn = make_inputs(rng, B=2, edge_heavy=True)

    def loss_w(v, a):
        return jnp.sum(
            ms_deform_attn_windowed(v, SHAPES, jnp.asarray(loc), a, G) ** 2)

    def loss_p(v, a):
        return jnp.sum(
            ms_deform_attn_sepwin(v, SHAPES, jnp.asarray(loc), a, G) ** 2)

    args = (jnp.asarray(value), jnp.asarray(attn))
    g_want = jax.grad(loss_w, argnums=(0, 1))(*args)
    g_got = jax.grad(loss_p, argnums=(0, 1))(*args)
    for name, a, b in zip(("value", "attn"), g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")
