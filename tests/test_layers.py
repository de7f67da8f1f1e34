"""MultiheadAttention: chunked-query path vs dense path.

The chunked path (triggered when Tq*Tk exceeds chunk_threshold) must be
numerically identical to the dense computation in deterministic mode — it is
the same math, only the probs tensor is built qc rows at a time and
rematerialized in backward.
"""

import numpy as np
import jax
import jax.numpy as jnp

from monodetr_tpu.models.layers import MultiheadAttention


def _mk(rng, B=2, Tq=48, Tk=96, C=32):
    q = jnp.asarray(rng.randn(B, Tq, C).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Tk, C).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Tk, C).astype(np.float32))
    return q, k, v


def test_chunked_matches_dense():
    rng = np.random.RandomState(0)
    q, k, v = _mk(rng)
    dense = MultiheadAttention(num_heads=4, chunk_threshold=0)
    chunked = MultiheadAttention(num_heads=4, chunk_threshold=256)  # qc=16

    params = dense.init(jax.random.PRNGKey(0), q, k, v)
    want = dense.apply(params, q, k, v, deterministic=True)
    got = chunked.apply(params, q, k, v, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_chunked_grads_match_dense():
    rng = np.random.RandomState(1)
    q, k, v = _mk(rng)
    dense = MultiheadAttention(num_heads=4, chunk_threshold=0)
    chunked = MultiheadAttention(num_heads=4, chunk_threshold=256)
    params = dense.init(jax.random.PRNGKey(0), q, k, v)

    def loss(m, p):
        return jnp.sum(m.apply(p, q, k, v, deterministic=True) ** 2)

    g_want = jax.grad(lambda p: loss(dense, p))(params)
    g_got = jax.grad(lambda p: loss(chunked, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_got, g_want)


def test_chunked_dropout_trains():
    """Train-mode chunked dropout: finite output, correct expectation scale."""
    rng = np.random.RandomState(2)
    q, k, v = _mk(rng, Tq=32, Tk=32)
    m = MultiheadAttention(num_heads=4, dropout=0.5, chunk_threshold=64)
    params = m.init(jax.random.PRNGKey(0), q, k, v)
    out = m.apply(params, q, k, v, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out)).all()
    # different chunk rngs -> not all chunks identical to deterministic
    det = m.apply(params, q, k, v, deterministic=True)
    assert not np.allclose(np.asarray(out), np.asarray(det))
