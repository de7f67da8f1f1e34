"""Pallas windowed MSDA vs the pure-XLA windowed oracle.

`ops/msda_pallas.ms_deform_attn_pallas` must match
`ops/msda_windowed.ms_deform_attn_windowed` bit-for-tolerance: same window
clamp, same hat algebra, different execution strategy (tile DMAs + MXU
matmuls vs dense shifts).  The windowed oracle is itself certified against
the exact gather formulation (test_msda_windowed.py), which is golden-tested
against torch grid_sample (test_msda.py) — agreement here completes the
chain back to the CUDA reference semantics
(ms_deform_attn_func.py:41-61 in /root/reference).

On CPU the kernel runs in Pallas interpreter mode (see _interpret()).
The lane-packing contract requires H=8, L=4, P=4 (exactly 128 lanes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodetr_tpu.ops.msda_pallas import ms_deform_attn_pallas
from monodetr_tpu.ops.msda_windowed import ms_deform_attn_windowed

pytestmark = pytest.mark.slow  # interpret-mode Pallas / multi-device: minutes on CPU

SHAPES = ((8, 16), (4, 8), (2, 4), (1, 2))
H, P, G = 8, 4, 8  # lane packing: lv*32 + h*4 + p == 128 lanes


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
def test_pallas_matches_windowed(edge_heavy):
    rng = np.random.RandomState(10 if edge_heavy else 11)
    value, loc, attn = make_inputs(rng, edge_heavy=edge_heavy)

    want = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    got = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_out_of_window_clamps_like_windowed():
    """Locations far outside the window must clamp identically."""
    rng = np.random.RandomState(12)
    value, loc, attn = make_inputs(rng)
    loc = loc + rng.choice([-0.5, 0.0, 0.7], size=loc.shape).astype(np.float32)

    want = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    got = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn), G))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_grads_match_windowed():
    rng = np.random.RandomState(13)
    value, loc, attn = make_inputs(rng)

    def loss_w(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_windowed(v, SHAPES, l, a, G)))

    def loss_p(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas(v, SHAPES, l, a, G)))

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g_want = jax.grad(loss_w, argnums=(0, 1, 2))(*args)
    g_got = jax.grad(loss_p, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("value", "loc", "attn"), g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def test_pallas_grads_with_batch():
    """RMW strip-gradient accumulation across tiles and batch entries."""
    rng = np.random.RandomState(14)
    value, loc, attn = make_inputs(rng, B=2, edge_heavy=True)

    def loss_w(v, a):
        return jnp.sum(
            ms_deform_attn_windowed(v, SHAPES, jnp.asarray(loc), a, G) ** 2)

    def loss_p(v, a):
        return jnp.sum(
            ms_deform_attn_pallas(v, SHAPES, jnp.asarray(loc), a, G) ** 2)

    args = (jnp.asarray(value), jnp.asarray(attn))
    g_want = jax.grad(loss_w, argnums=(0, 1))(*args)
    g_got = jax.grad(loss_p, argnums=(0, 1))(*args)
    for name, a, b in zip(("value", "attn"), g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def test_pallas_loc_grads_near_and_beyond_window():
    """Location gradients near (but strictly inside) and beyond the clamp.

    Inside the window both paths propagate the bilinear-hat gradient;
    clamped samples get exactly zero in both.  Exact-boundary ties are
    excluded: the kernel's strict mask and jnp.clip's boundary subgradient
    legitimately differ there (measure-zero in training, where the offset
    init keeps points at 0.75*lim).
    """
    rng = np.random.RandomState(15)
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    value = rng.randn(1, S, H, 4).astype(np.float32)
    refs = grid_refs(SHAPES)
    lim = G / 2 - 1 - 1e-2
    mag = rng.choice([lim - 0.05, lim + 0.5], size=(1, S, H, L, P, 2))
    off = (mag * rng.choice([-1.0, 1.0], size=mag.shape)).astype(np.float32)
    norm = np.array([[w, h] for h, w in SHAPES], np.float32)
    loc = (refs[None, :, None, None, None, :] +
           off / norm[None, None, None, :, None, :]).astype(np.float32)
    attn = rng.rand(1, S, H, L, P).astype(np.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)

    def loss_w(l):
        return jnp.sum(jnp.sin(ms_deform_attn_windowed(
            jnp.asarray(value), SHAPES, l, jnp.asarray(attn), G)))

    def loss_p(l):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas(
            jnp.asarray(value), SHAPES, l, jnp.asarray(attn), G)))

    g_want = np.asarray(jax.grad(loss_w)(jnp.asarray(loc)))
    g_got = np.asarray(jax.grad(loss_p)(jnp.asarray(loc)))
    np.testing.assert_allclose(g_got, g_want, rtol=2e-3, atol=2e-4)
    # the clamped samples must contribute exactly zero
    clamped = np.abs(off) > lim
    assert (g_got[clamped] == 0).all()
