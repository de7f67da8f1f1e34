"""Pallas LAP kernel (ops/lap_pallas.py) vs the XLA solver and scipy.

Interpret mode on CPU; the kernel's TPU compile + timing is exercised by
bench.py / the verify drive (measured: 7.2 ms vs 59.6 ms for the vmapped
XLA solver at B=16 x G=11 x 50x50 on v5e).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from monodetr_tpu.models.matcher import BIG_COST, hungarian_match, lap_solve
from monodetr_tpu.ops.lap_pallas import lap_solve_pallas


@pytest.mark.parametrize("n,seed", [(8, 0), (16, 1), (50, 2)])
def test_matches_xla_solver_and_scipy(n, seed):
    rng = np.random.RandomState(seed)
    for trial in range(8):
        nreal = rng.randint(0, n + 1)
        C = (rng.rand(n, n) * 10).astype(np.float32)
        valid = np.zeros(n, bool)
        valid[:nreal] = True
        C[~valid] = BIG_COST
        a = np.asarray(lap_solve(jnp.asarray(C), jnp.asarray(valid)))
        b = np.asarray(
            lap_solve_pallas(jnp.asarray(C)[None], jnp.asarray(valid)[None])
        )[0]
        assert (a == b).all(), (trial, a, b)
        if nreal:
            ri, ci = linear_sum_assignment(C[:nreal])
            want = C[:nreal][ri, ci].sum()
            got = C[np.arange(nreal), b[:nreal]].sum()
            np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batched_and_all_invalid():
    rng = np.random.RandomState(3)
    P, n = 5, 10
    C = (rng.rand(P, n, n) * 5).astype(np.float32)
    valid = rng.rand(P, n) < 0.5
    valid[0] = False  # a whole problem with zero valid rows
    C[~valid] = BIG_COST
    got = np.asarray(lap_solve_pallas(jnp.asarray(C), jnp.asarray(valid)))
    for p in range(P):
        want = np.asarray(lap_solve(jnp.asarray(C[p]), jnp.asarray(valid[p])))
        assert (got[p] == want).all(), p
    assert (got[0] == -1).all()


def test_hungarian_match_impls_agree():
    """The full matcher entry point: pallas (interpret) == xla, including
    under an outer vmap (the criterion vmaps the matcher over layers)."""
    rng = np.random.RandomState(4)
    L, B, G, NQ, T, C = 2, 3, 2, 12, 7, 3
    outs = {
        "pred_logits": jnp.asarray(rng.randn(L, B, G * NQ, C).astype(np.float32)),
        "pred_boxes": jnp.asarray(
            (rng.rand(L, B, G * NQ, 6) * 0.8 + 0.1).astype(np.float32)),
    }
    tgts = {
        "labels": jnp.asarray(rng.randint(0, C, (B, T)).astype(np.int32)),
        "boxes_3d": jnp.asarray(np.concatenate(
            [rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.1 + 0.02], -1
        ).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(B, T) > 0.4),
    }

    def match(impl):
        return jax.vmap(
            lambda o: hungarian_match(o, tgts, group_num=G, impl=impl)
        )(outs)

    a = np.asarray(match("xla"))
    b = np.asarray(match("pallas"))
    assert (a == b).all()
