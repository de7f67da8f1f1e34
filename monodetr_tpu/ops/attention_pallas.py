"""Fused multi-head attention Pallas kernel with in-kernel dropout.

The depth-encoder self-attention (1920 tokens) and the decoder's
depth-cross-attention (550 x 1920) were the step's second-largest cost
(~75 + ~42 ms at bs 16): XLA materializes the f32 logits and probs tensors
([B,H,Tq,Tk], up to ~470 MB per chunk) through HBM in both directions, and
the query-chunked remat formulation re-streams them in backward.

Here one kernel grid step computes a whole [BQ, Tk] attention tile in VMEM:
logits (MXU) -> row softmax (VPU) -> dropout (on-core PRNG) -> probs @ V
(MXU).  Logits and probs never exist in HBM, forward or backward.  HBM
traffic collapses to the q/k/v/out tiles (~tens of MB), putting the op near
the memory-bandwidth floor.

Dropout matches torch.nn.MultiheadAttention semantics (dropout applied to
the NORMALIZED attention probs, inverted scaling 1/(1-p)); the mask is a
pure function of (seed, grid position), so the backward kernel regenerates
the identical mask instead of storing it.  The custom VJP recomputes
logits/probs on the fly (flash-style): dV = Pd^T dO, dP = mask * dO V^T,
dS = P (dP - rowsum(dP P)), dQ = dS K, dK = dS^T Q, with dK/dV accumulated
across query tiles in VMEM scratch.

Reference: the torch MHA the reference uses for these two sites
(depth_predictor.py TransformerEncoderLayer self_attn,
depthaware_transformer.py:497 cross_attn_depth).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _softmax_rows(s):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _keep_mask(seed, bh, qi, nq, shape, p):
    """Deterministic per-(grid step) dropout keep-mask; P(keep) = 1 - p.

    prng_random_bits yields SIGNED int32 on this toolchain — bitcast to
    uint32 before thresholding (validated by the seed-averaged
    E[dropout(out)] == out test on TPU; a signed compare keeps everything
    at p=0.5)."""
    pltpu.prng_seed(seed + bh * nq + qi)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(p * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, p, nq):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    probs = _softmax_rows(s)
    if p > 0.0:
        keep = _keep_mask(seed_ref[0], bh, qi, nq, probs.shape, p)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - p)), 0.0)
    v = v_ref[0]
    o = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, p, nq):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    probs = _softmax_rows(s)
    if p > 0.0:
        keep = _keep_mask(seed_ref[0], bh, qi, nq, probs.shape, p)
        inv = 1.0 / (1.0 - p)
        probs_d = jnp.where(keep, probs * inv, 0.0)
    else:
        probs_d = probs

    # dV += Pd^T dO   [Tk, D]
    dv_c = jax.lax.dot_general(
        probs_d, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dPd = dO V^T    [BQ, Tk]
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if p > 0.0:
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        dp = dpd
    # softmax vjp
    ds = probs * (dp - jnp.sum(dp * probs, axis=1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk_c = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dk_acc[...] += dk_c
    dv_acc[...] += dv_c

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _block_q(tq):
    """Query tile size; Tq is padded UP to a multiple of this.  Grid-step
    count is the dominant cost at these shapes (each step's matmuls run at
    D=32 MXU utilization), so prefer the LARGEST tile among {256, 192,
    128} with the least padding: 1920 depth tokens tile exactly at 192
    (1280 steps vs 1920 at the old 128 fallback), the 550-query decoder
    pads to 576 at 192 (vs 640 at 128)."""
    if tq <= 128:
        return min(128, max(8, 1 << int(np.ceil(np.log2(max(1, tq))))))
    best = None
    for bq in (256, 192, 128):
        pad = -(-tq // bq) * bq - tq
        key = (pad, -bq)
        if best is None or key < best[0]:
            best = (key, bq)
    return best[1]


def _pad_q(x, tq_pad):
    if x.shape[2] == tq_pad:
        return x
    pad = tq_pad - x.shape[2]
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, seed, scale, dropout_p):
    """softmax(q k^T * scale) [dropout] v, fused in VMEM.

    q [B,H,Tq,D], k/v [B,H,Tk,D]; seed: int32 scalar (ignored when
    dropout_p == 0); scale, dropout_p: static floats.  Returns [B,H,Tq,D]
    in q.dtype.
    """
    out, _ = _fused_attention_fwd(q, k, v, seed, scale, dropout_p)
    return out


def _run_fwd(q, k, v, seed, scale, p):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    bq = _block_q(max(8, Tq))
    tq_pad = ((Tq + bq - 1) // bq) * bq
    nq = tq_pad // bq
    qp = _pad_q(q, tq_pad).reshape(B * H, tq_pad, D)
    kf = k.reshape(B * H, Tk, D)
    vf = v.reshape(B * H, Tk, D)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, p=p, nq=nq),
        grid=(B * H, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, Tk, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, Tk, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, D), q.dtype),
        # the default 16 MB scoped-vmem limit fails at the stress config
        # (7680 depth tokens -> [bq, Tk] f32 logits tiles > 16 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(seed_arr, qp, kf, vf)
    return out.reshape(B, H, tq_pad, D)[:, :, :Tq]


def _fused_attention_fwd(q, k, v, seed, scale, dropout_p):
    out = _run_fwd(q, k, v, seed, scale, dropout_p)
    return out, (q, k, v, seed)


def _fused_attention_bwd(scale, dropout_p, res, g):
    q, k, v, seed = res
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    bq = _block_q(max(8, Tq))
    tq_pad = ((Tq + bq - 1) // bq) * bq
    nq = tq_pad // bq
    qp = _pad_q(q, tq_pad).reshape(B * H, tq_pad, D)
    gp = _pad_q(g, tq_pad).reshape(B * H, tq_pad, D)
    kf = k.reshape(B * H, Tk, D)
    vf = v.reshape(B * H, Tk, D)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, p=dropout_p, nq=nq),
        grid=(B * H, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, Tk, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, Tk, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, Tk, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, Tk, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, tq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Tk, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Tk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tk, D), jnp.float32),
            pltpu.VMEM((Tk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(seed_arr, qp, kf, vf, gp)

    dq = dq.reshape(B, H, tq_pad, D)[:, :, :Tq]
    seed_ct = np.zeros(np.shape(seed), jax.dtypes.float0)  # int arg: no tangent
    return (dq, dk.reshape(B, H, Tk, D), dv.reshape(B, H, Tk, D), seed_ct)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
