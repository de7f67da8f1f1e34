"""Encoder-MSDA kernel microbench on the real TPU: times the windowed
Pallas kernel fwd and fwd+bwd at bench shapes (grid queries, the packed
entry), per query level and total.

Timing is value-fetch synchronized (block_until_ready does not wait through
the axon relay).  Usage: python tools/bench_enc_msda.py [--iters 20] [--window 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = ((48, 160), (24, 80), (12, 40), (6, 20))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monodetr_tpu.ops.msda_pallas import (center_lane_tables,
                                              ms_deform_attn_pallas_packed)

    B, H, D = args.batch, 8, 32
    S = sum(h * w for h, w in SHAPES)
    G = args.window
    lim = G / 2 - 1 - 1e-2
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    cx, cy = center_lane_tables(SHAPES)
    fx = jnp.asarray(cx)[None] + jnp.asarray(
        rng.uniform(-lim, lim, (B, S, 128)), jnp.float32)
    fy = jnp.asarray(cy)[None] + jnp.asarray(
        rng.uniform(-lim, lim, (B, S, 128)), jnp.float32)
    att = jnp.asarray(rng.rand(B, S, 128) / 16, jnp.float32)
    g = jnp.asarray(rng.randn(B, S, H * D), jnp.float32)

    fwd = jax.jit(lambda v, x, y, a: ms_deform_attn_pallas_packed(
        v, SHAPES, x, y, a, G))

    def loss(v, x, y, a):
        out = ms_deform_attn_pallas_packed(v, SHAPES, x, y, a, G)
        return jnp.vdot(out.astype(jnp.float32), g)

    fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    def timed(fn, *xs):
        r = fn(*xs)  # compile
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r)
                  .astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*xs)
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r)
                  .astype(jnp.float32))
        return (time.perf_counter() - t0) / args.iters * 1000

    t_f = timed(fwd, value, fx, fy, att)
    t_fb = timed(fwdbwd, value, fx, fy, att)
    print(f"G={G} B={B}: fwd {t_f:.2f} ms   fwd+bwd {t_fb:.2f} ms   "
          f"(bwd ~{t_fb - t_f:.2f})")


if __name__ == "__main__":
    main()
