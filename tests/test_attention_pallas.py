"""Fused attention kernel (ops/attention_pallas.py) vs dense attention.

Interpret mode on CPU covers the deterministic path (forward + all three
grads, exact).  Dropout uses the on-core TPU PRNG, which interpret mode
cannot emulate — those properties (seed determinism, E[out] -> out,
mask-consistent backward) were validated on the real chip and are asserted
here only when a TPU is present.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodetr_tpu.ops.attention_pallas import fused_attention

SCALE = 1.0 / np.sqrt(32)


def dense(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * SCALE
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def make(rng, B=1, H=2, Tq=50, Tk=96, D=32):
    return (jnp.asarray(rng.randn(B, H, Tq, D).astype(np.float32)),
            jnp.asarray(rng.randn(B, H, Tk, D).astype(np.float32)),
            jnp.asarray(rng.randn(B, H, Tk, D).astype(np.float32)))


@pytest.mark.parametrize("tq", [50, 128, 130])  # non-multiples hit padding
def test_forward_matches_dense(rng, tq):
    q, k, v = make(rng, Tq=tq)
    out_f = fused_attention(q, k, v, jnp.int32(0), SCALE, 0.0)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(dense(q, k, v)), rtol=1e-5, atol=1e-5)


def test_grads_match_dense(rng):
    q, k, v = make(rng)
    g = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
    _, vjp_d = jax.vjp(dense, q, k, v)
    _, vjp_f = jax.vjp(
        lambda q, k, v: fused_attention(q, k, v, jnp.int32(0), SCALE, 0.0),
        q, k, v)
    for a, b in zip(vjp_d(g), vjp_f(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.devices()[0].platform == "cpu",
                    reason="on-core PRNG has no interpret-mode emulation")
def test_dropout_on_tpu(rng):
    q, k, v = make(rng, Tq=256, Tk=384)
    g = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
    seed = jnp.int32(7)

    a = fused_attention(q, k, v, seed, SCALE, 0.1)
    b = fused_attention(q, k, v, seed, SCALE, 0.1)
    assert bool(jnp.all(a == b))  # same seed -> same mask
    c = fused_attention(q, k, v, jnp.int32(8), SCALE, 0.1)
    assert not bool(jnp.all(a == c))

    # E[dropout(out)] -> out (inverted scaling is unbiased)
    outs = [fused_attention(q, k, v, jnp.int32(s), SCALE, 0.5)
            for s in range(40)]
    mean = sum(outs) / len(outs)
    d0 = fused_attention(q, k, v, jnp.int32(0), SCALE, 0.0)
    err = float(jnp.mean(jnp.abs(mean - d0)))
    assert err < 0.35 * float(jnp.mean(jnp.abs(d0)))

    # out is linear in v, so <g, out(v=dir)> == <grad_v, dir> EXACTLY iff
    # the backward regenerates the identical mask
    fv = lambda v_: jnp.vdot(g, fused_attention(q, k, v_, seed, SCALE, 0.1))
    gv = jax.grad(fv)(v)
    dirv = jnp.asarray(rng.randn(*v.shape).astype(np.float32))
    np.testing.assert_allclose(float(fv(dirv)), float(jnp.vdot(gv, dirv)),
                               rtol=1e-3)
