"""Windowed MSDA vs the exact gather formulation.

When every sampling location stays inside its G-window the two must agree to
float tolerance; the gather path is itself golden-tested against torch
grid_sample in test_msda.py, so agreement here certifies the windowed path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodetr_tpu.ops.msda import ms_deform_attn, level_start_indices
from monodetr_tpu.ops.msda_windowed import (clamp_offsets_to_window,
                                            ms_deform_attn_windowed)

SHAPES = ((8, 16), (4, 8), (2, 4), (1, 2))


def grid_refs(shapes):
    """Normalized pixel-center reference points, level-major [S, 2]."""
    refs = []
    for h, w in shapes:
        ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                             indexing="ij")
        refs.append(np.stack([xs / w, ys / h], -1).reshape(-1, 2))
    return np.concatenate(refs, 0)


def make_inputs(rng, B=2, H=4, D=8, P=4, window=8, edge_heavy=False):
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    value = rng.randn(B, S, H, D).astype(np.float32)
    refs = grid_refs(SHAPES)  # [S, 2]

    lim = window / 2 - 1 - 1e-2
    if edge_heavy:
        # offsets at the window boundary, many samples off-image
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
def test_windowed_matches_gather(edge_heavy):
    rng = np.random.RandomState(0 if not edge_heavy else 1)
    value, loc, attn = make_inputs(rng, edge_heavy=edge_heavy)

    want = np.asarray(ms_deform_attn(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn)))
    got = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        window=8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_windowed_grads_match_gather():
    rng = np.random.RandomState(2)
    value, loc, attn = make_inputs(rng, B=1, H=2, D=4)

    def loss_g(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn(v, SHAPES, l, a)))

    def loss_w(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_windowed(v, SHAPES, l, a, 8)))

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g_want = jax.grad(loss_g, argnums=(0, 2))(*args)
    g_got = jax.grad(loss_w, argnums=(0, 2))(*args)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_out_of_window_locations_are_clamped_not_wrong():
    """Locations beyond the window clamp to the edge; in particular they must
    not read unrelated pixels, and offsets passed through
    clamp_offsets_to_window are exact."""
    rng = np.random.RandomState(3)
    value, loc, attn = make_inputs(rng)
    # blow up some offsets far outside the window
    loc_wild = loc.copy()
    loc_wild[:, ::7] += 0.9

    got = np.asarray(ms_deform_attn_windowed(
        jnp.asarray(value), SHAPES, jnp.asarray(loc_wild), jnp.asarray(attn), 8))
    assert np.isfinite(got).all()

    # clamping the equivalent pixel offsets reproduces windowed output exactly
    refs = grid_refs(SHAPES)
    norm = np.array([[w, h] for h, w in SHAPES], np.float32)
    off_px = (loc_wild - refs[None, :, None, None, None, :]) * \
        norm[None, None, None, :, None, :]
    off_clamped = np.asarray(clamp_offsets_to_window(jnp.asarray(off_px), 8))
    loc_clamped = refs[None, :, None, None, None, :] + \
        off_clamped / norm[None, None, None, :, None, :]
    want = np.asarray(ms_deform_attn(
        jnp.asarray(value), SHAPES, jnp.asarray(loc_clamped.astype(np.float32)),
        jnp.asarray(attn)))
    # interior (non-wild) rows agree with the unclamped gather too
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
