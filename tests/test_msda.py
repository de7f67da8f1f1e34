"""MSDA op correctness: fused-gather path vs torch grid_sample oracle
(the exact math of `ms_deform_attn_core_pytorch`,
reference ops/functions/ms_deform_attn_func.py:41-61, restated with torch CPU
here as the golden), plus gradient checks — mirroring the reference's own
kernel-test strategy (ops/test.py: forward equivalence + gradcheck)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from monodetr_tpu.ops.msda import (
    ms_deform_attn,
    ms_deform_attn_dense,
    ms_deform_attn_reference,
    level_start_indices,
)

SHAPES = ((12, 16), (6, 8), (3, 4), (2, 2))


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Torch-CPU restatement of the deformable-attention core math."""
    value = torch.from_numpy(value)
    sampling_locations = torch.from_numpy(sampling_locations)
    attention_weights = torch.from_numpy(attention_weights)
    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for lid_, (H_, W_) in enumerate(spatial_shapes):
        value_l_ = (
            value_list[lid_].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
        )
        sampling_grid_l_ = sampling_grids[:, :, :, lid_].transpose(1, 2).flatten(0, 1)
        sampling_value_l_ = F.grid_sample(
            value_l_, sampling_grid_l_, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
        sampling_value_list.append(sampling_value_l_)
    attention_weights = attention_weights.transpose(1, 2).reshape(
        N_ * M_, 1, Lq_, L_ * P_
    )
    output = (
        (torch.stack(sampling_value_list, dim=-2).flatten(-2) * attention_weights)
        .sum(-1)
        .view(N_, M_ * D_, Lq_)
    )
    return output.transpose(1, 2).contiguous().numpy()


def make_inputs(rng, B=2, Q=7, H=4, D=8, P=3, oob=False):
    S = sum(h * w for h, w in SHAPES)
    L = len(SHAPES)
    value = rng.randn(B, S, H, D).astype(np.float32)
    lo, hi = (-0.3, 1.3) if oob else (0.05, 0.95)
    loc = rng.uniform(lo, hi, size=(B, Q, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Q, H, L * P).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(B, Q, H, L, P)
    return value, loc, w


@pytest.mark.parametrize("oob", [False, True])
def test_forward_matches_torch(rng, oob):
    value, loc, w = make_inputs(rng, oob=oob)
    want = torch_oracle(value, SHAPES, loc, w)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_jnp_reference_matches_fused(rng):
    value, loc, w = make_inputs(rng, oob=True)
    a = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w)))
    b = np.asarray(
        ms_deform_attn_reference(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("oob", [False, True])
def test_dense_forward_matches_torch(rng, oob):
    """The decoder's dense separable-hat formulation is bit-for-bit the same
    math as grid_sample(zeros, align_corners=False) — including OOB corners."""
    value, loc, w = make_inputs(rng, oob=oob)
    want = torch_oracle(value, SHAPES, loc, w)
    got = np.asarray(
        ms_deform_attn_dense(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dense_gradients_match_gather(rng):
    """Dense-path grads vs the exact gather path's grads (itself torch-checked)."""
    value, loc, w = make_inputs(rng, B=2, Q=5, H=2, D=8, P=2, oob=True)
    g_out = rng.randn(2, 5, 2 * 8).astype(np.float32)

    def f_gather(v, l, w_):
        return ms_deform_attn(v, SHAPES, l, w_)

    def f_dense(v, l, w_):
        return ms_deform_attn_dense(v, SHAPES, l, w_)

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    _, vjp_g = jax.vjp(f_gather, *args)
    _, vjp_d = jax.vjp(f_dense, *args)
    for a, b in zip(vjp_g(jnp.asarray(g_out)), vjp_d(jnp.asarray(g_out))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("channels", [8, 16, 32])
@pytest.mark.slow
def test_gradients_match_torch(rng, channels):
    """Grads of (value, loc, weights) vs torch autograd through grid_sample."""
    value, loc, w = make_inputs(rng, B=1, Q=5, H=2, D=channels, P=2)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)

    def torch_fwd(tv, tl, tw):
        N_, S_, M_, D_ = tv.shape
        _, Lq_, _, L_, P_, _ = tl.shape
        value_list = tv.split([h * w for h, w in SHAPES], dim=1)
        grids = 2 * tl - 1
        outs = []
        for lid_, (H_, W_) in enumerate(SHAPES):
            v = value_list[lid_].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
            g = grids[:, :, :, lid_].transpose(1, 2).flatten(0, 1)
            outs.append(F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False))
        aw = tw.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
        out = (torch.stack(outs, dim=-2).flatten(-2) * aw).sum(-1).view(N_, M_ * D_, Lq_)
        return out.transpose(1, 2)

    t_out = torch_fwd(tv, tl, tw)
    g_out = np.random.RandomState(1).randn(*t_out.shape).astype(np.float32)
    t_out.backward(torch.from_numpy(g_out))

    def jax_fwd(v, l, w_):
        return ms_deform_attn(v, SHAPES, l, w_)

    _, vjp = jax.vjp(jax_fwd, jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    gv, gl, gw = vjp(jnp.asarray(g_out.reshape(t_out.shape)))

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), rtol=1e-4, atol=1e-5)
    # loc grads only match where not on a floor() discontinuity; random
    # continuous coords are almost surely fine.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_level_start_indices():
    assert level_start_indices(SHAPES) == (0, 192, 240, 252)
