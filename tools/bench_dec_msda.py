"""Decoder-MSDA kernel microbench on the real TPU: dense (XLA hat-matmul)
vs sep (semi-separable MXU Pallas) at bench shapes, fwd and fwd+bwd.

Timing is value-fetch synchronized (block_until_ready does not wait through
the axon relay).  Usage: python tools/bench_dec_msda.py [--iters 20]
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
    ap.add_argument("--queries", type=int, default=550)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monodetr_tpu.ops.msda import ms_deform_attn_dense
    from monodetr_tpu.ops.msda_sep_pallas import ms_deform_attn_sep

    B, H, D, L, P, Q = args.batch, 8, 32, 4, 4, args.queries
    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, Q, H, L, P) / (L * P), jnp.float32)
    g = jnp.asarray(rng.randn(B, Q, H * D), jnp.float32)

    def timed(fn, *xs):
        fn(*xs)  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*xs)
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        return (time.perf_counter() - t0) / args.iters * 1000

    for name, op in (("dense", ms_deform_attn_dense),
                     ("sep", ms_deform_attn_sep)):
        fwd = jax.jit(lambda v, l, a, op=op: jnp.sum(
            op(v, SHAPES, l, a).astype(jnp.float32) ** 2))
        grad = jax.jit(jax.grad(
            lambda v, l, a, op=op: jnp.sum(
                op(v, SHAPES, l, a).astype(jnp.float32) * g),
            argnums=(0, 1, 2)))
        t_f = timed(fwd, value, loc, att)
        t_g = timed(lambda v, l, a: grad(v, l, a)[0], value, loc, att)
        print(f"{name:6s}: fwd {t_f:7.2f} ms   fwd+bwd {t_g:7.2f} ms "
              f"(B{B} Q{Q}, x3 layers in the model)")


if __name__ == "__main__":
    main()
