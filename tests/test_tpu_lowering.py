"""Cross-platform TPU lowering preflight for every Pallas kernel.

Interpret-mode tests validate semantics but skip Mosaic's lowering rules;
`jax.export.export(..., platforms=["tpu"])` runs the real TPU lowering
(including `_check_block_mappings`) on any host, no chip needed.  Round-2
regression: `ms_deform_attn_dense_fused` passed all interpret tests but
failed on the chip with an illegal (1, 512)-over-[NT, 512] coord block.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import monodetr_tpu.ops as ops_pkg
from monodetr_tpu.ops import (attention_pallas, lap_pallas,
                              msda_dense_pallas, msda_enc_pallas,
                              msda_pallas, msda_sep_pallas,
                              msda_sepwin_pallas)

PALLAS_MODULES = (attention_pallas, lap_pallas, msda_dense_pallas,
                  msda_enc_pallas, msda_pallas, msda_sep_pallas,
                  msda_sepwin_pallas)

SHAPES = ((48, 160), (24, 80), (12, 40), (6, 20))
S = sum(h * w for h, w in SHAPES)
B, H, D, L, P = 2, 8, 32, 4, 4


def test_every_pallas_op_module_is_preflighted():
    """Guard: any ops module calling pl.pallas_call must be in PALLAS_MODULES
    (and thus get a Mosaic-lowering preflight here); a new Pallas op added
    without one silently skips the exact check this file exists for."""
    ops_dir = os.path.dirname(ops_pkg.__file__)
    using_pallas = set()
    for fname in os.listdir(ops_dir):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(ops_dir, fname)) as f:
            if "pallas_call" in f.read():
                using_pallas.add(fname[:-3])
    covered = {m.__name__.rsplit(".", 1)[-1] for m in PALLAS_MODULES}
    assert using_pallas == covered, (
        "Pallas-using ops modules without a TPU-lowering preflight: "
        f"{sorted(using_pallas - covered)}; stale entries: "
        f"{sorted(covered - using_pallas)}"
    )


def _export_tpu(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exp.mlir_module()


@pytest.fixture(autouse=True)
def _no_interpret(monkeypatch):
    """Force the real Mosaic lowering path (not interpret) off-TPU."""
    for mod in PALLAS_MODULES:
        monkeypatch.setattr(mod, "_interpret", lambda: False)


def test_dense_fused_lowers_for_tpu():
    Q = 550
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, Q, H, L, P), jnp.float32)

    def loss(v, l, a):
        out = msda_dense_pallas.ms_deform_attn_dense_fused(v, SHAPES, l, a)
        return out.astype(jnp.float32).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), value, loc, att)


def test_sep_pallas_lowers_for_tpu():
    Q = 550
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, Q, H, L, P), jnp.float32)

    def loss(v, l, a):
        out = msda_sep_pallas.ms_deform_attn_sep(v, SHAPES, l, a)
        return out.astype(jnp.float32).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), value, loc, att)


def test_windowed_pallas_lowers_for_tpu():
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, S, H, L, P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, S, H, L, P), jnp.float32)

    def loss(v, l, a):
        out = msda_pallas.ms_deform_attn_pallas(v, SHAPES, l, a, 8)
        return out.astype(jnp.float32).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), value, loc, att)


def test_enc_fused_pallas_lowers_for_tpu():
    """Production shapes AND the shipped bf16 transport dtypes."""
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    off = jnp.asarray(rng.randn(B, S, 256), jnp.bfloat16)
    logits = jnp.asarray(rng.randn(B, S, 128), jnp.bfloat16)

    def loss(v, o, lg):
        out = msda_enc_pallas.ms_deform_attn_enc_fused(v, SHAPES, o, lg, 8)
        return out.astype(jnp.float32).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), value, off, logits)


def test_sepwin_pallas_lowers_for_tpu():
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, S, H, L, P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, S, H, L, P), jnp.float32)

    def loss(v, l, a):
        out = msda_sepwin_pallas.ms_deform_attn_sepwin(v, SHAPES, l, a, 8)
        return out.astype(jnp.float32).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), value, loc, att)


def test_flash_attention_lowers_for_tpu():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, 550, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, 1920, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, 1920, D), jnp.bfloat16)

    def loss(q, k, v):
        out = attention_pallas.fused_attention(
            q, k, v, jnp.int32(7), 1.0 / np.sqrt(D), 0.1)
        return out.astype(jnp.float32).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), q, k, v)


def test_lap_pallas_lowers_for_tpu():
    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.rand(16, 64, 64), jnp.float32)
    valid = jnp.ones((16, 64), bool).at[:, 17:].set(False)
    _export_tpu(lambda c, n: lap_pallas.lap_solve_pallas(c, n), cost, valid)
