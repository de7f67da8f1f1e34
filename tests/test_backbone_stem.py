"""StemConv (space-to-depth 7x7/s2 stem) must be exactly the reference
conv: same parameter layout [7, 7, 3, 64], same outputs as
nn.Conv(64, (7,7), strides 2, padding 3) — the torchvision stem the
checkpoint converter targets (reference backbone.py:74-77)."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from monodetr_tpu.models.backbone import StemConv


def test_stem_conv_matches_reference_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 64, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.float32)
    ref = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                  use_bias=False).apply({"params": {"kernel": k}}, x)
    got = StemConv(64).apply({"params": {"kernel": k}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_conv_grads_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 32, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.float32)

    def loss(mod):
        def f(kk, xx):
            return jnp.sum(jnp.sin(mod.apply({"params": {"kernel": kk}}, xx)))
        return f

    ref = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                  use_bias=False)
    gk_r, gx_r = jax.grad(loss(ref), argnums=(0, 1))(k, x)
    gk_g, gx_g = jax.grad(loss(StemConv(64)), argnums=(0, 1))(k, x)
    np.testing.assert_allclose(np.asarray(gk_g), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
