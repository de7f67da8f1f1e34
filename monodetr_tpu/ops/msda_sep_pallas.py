"""Semi-separable MSDA for decoder-sized query counts (Pallas TPU).

Exact reference semantics (`ms_deform_attn_core_pytorch`,
ops/functions/ms_deform_attn_func.py:41-61 — bilinear, grid_sample zero
padding, align_corners=False), like ops/msda.py:ms_deform_attn_dense, but
restructured so the O(Q*S) dense work lands on the MXU instead of HBM/VPU:

    out[q, d] = sum_p a_p * sum_iy hy_p[q, iy] * R_p[q, iy, d]
    R_p[q, iy, d] = sum_ix hx_p[q, ix] * V[iy, ix, d]

The inner contraction R = hx @ V[W_l, H_l*D] is a pure matmul — the
bilinear hats factor per-axis, and only the x-axis hat needs the full
spatial extent.  The outer y-axis stage is rank H_l (<= 48) and is also
expressed as matmuls against constant 0/1 expand/tile matrices, so every
O(Q*S)-sized operand lives ONLY in VMEM and ALL heavy math is MXU:

  - the XLA dense path builds [B,H,Q,S_l] hat matrices in HBM (~2.2 GB at
    level 0, bs 16) forward and again backward (~128 ms / 3 layers);
  - a fused dense-hat Pallas kernel (ops/msda_dense_pallas.py) removes the
    HBM traffic but pays the same O(Q*S) as VPU hat evaluations (measured
    REGRESSION: 26.9 vs 31.8 img/s);
  - here the per-(b,h,p) cost is one [Qp,W_l]x[W_l,H_l*D] matmul plus
    rank-H_l epilogues.

Backward is scatter-free and rides the same factorization: with
M = (a*hy)_exp * g_exp (shared by dV and dfx),

    dV   += hx^T @ M                       (matmul)
    dfx   = rowsum(M * (ghx @ V))          (one extra hx-sized matmul)
    dhy   = (R * g_exp) @ ey^T             (rank-H_l epilogue)

so the whole backward is 3 large matmuls + rank-H_l epilogues per point —
no chunked x loop, no second (y-major) value layout.

Layout: ONE pallas_call per direction covering all L levels (static
per-level H_l, W_l inside the kernel), grid (B*H,); value pre-transposed
to x-major [BH, W_l, H_l*D] slabs.  Per-query operands ride as
[BH, L, P, Qp].  Per-level calls paid the per-step fixed cost 4x — the
coarse levels measured ~16 us/step of almost pure overhead (round 5).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import level_start_indices


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _expand_mat(n, D, dtype=np.float32):
    """E [n, n*D]: E[i, i*D + d] = 1 — `v @ E` tiles each column i across
    its D-lane group ("expand over the other axis")."""
    e = np.zeros((n, n * D), dtype)
    for i in range(n):
        e[i, i * D:(i + 1) * D] = 1.0
    return e


def _tile_mat(D, n, dtype=np.float32):
    """T [D, n*D]: T[d, i*D + d] = 1 — `g @ T` repeats g's D lanes n times
    (broadcast g across the spatial groups)."""
    t = np.zeros((D, n * D), dtype)
    for i in range(n):
        t[np.arange(D), i * D + np.arange(D)] = 1.0
    return t


def _fiota(n, m):
    """Column-index f32 iota [n, m] (tpu.iota is integer-only: build int32,
    then convert)."""
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), 1).astype(jnp.float32)


def _hat(f, j):
    """relu(1 - |f - j|) and its d/df on the support (sign convention:
    d hat / d f = -sign(f - j) where |f - j| < 1)."""
    d = f - j
    return jnp.maximum(0.0, 1.0 - jnp.abs(d)), jnp.where(
        jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _dotT(a, b):
    """a [M, K] x b [N, K] -> [M, N] (contract both last dims)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(fx_ref, fy_ref, att_ref, *refs, P, D, shapes):
    """ONE grid step = one (b, h): all L levels in a single launch.

    Per-level work is wildly unbalanced (level 0 is MXU-bound, levels 1-3
    are trivial), so per-level pallas_calls paid 4x the per-step fixed cost
    (measured ~14-16 us/step on the coarse levels = almost pure overhead);
    the merged kernel pays it once."""
    L = len(shapes)
    v_refs = refs[:L]
    ey_refs = refs[L:2 * L]
    ty_refs = refs[2 * L:3 * L]
    o_ref = refs[3 * L]
    Qp = fx_ref.shape[-1]

    acc = jnp.zeros((Qp, D), jnp.float32)
    for lv, (Hl, Wl) in enumerate(shapes):
        fx = fx_ref[0, lv]          # [P, Qp] f32, level-pixel coords
        fy = fy_ref[0, lv]
        att = att_ref[0, lv]
        v = v_refs[lv][0]           # [Wl, Hl*D]
        jx = _fiota(Qp, Wl)
        jy = _fiota(Qp, Hl)
        for p in range(P):
            hx, _ = _hat(fx[p][:, None], jx)            # [Qp, Wl]
            hy, _ = _hat(fy[p][:, None], jy)            # [Qp, Hl]
            ahy = att[p][:, None] * hy
            # R[q, iy*D+d] = sum_ix hx * V;  hy_exp spreads ahy over each
            # iy's D-lane group; the final contraction sums d across iy.
            R = jnp.dot(hx.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)  # [Qp, Hl*D]
            hy_exp = jnp.dot(ahy, ey_refs[lv][...],
                             preferred_element_type=jnp.float32)
            acc = acc + _dotT(hy_exp * R, ty_refs[lv][...])  # [Qp, D]
    o_ref[0] = acc


def _bwd_chunks(shapes, Qp, D):
    """Per-level query-chunk sizes for the backward.

    Mosaic sums the unrolled per-level value stacks (~5 live [Qp, Hl*D]
    f32 intermediates per level), so a 2x-resolution pyramid blows the
    64 MB scoped-vmem limit (observed 87 MB at the stress config).  Chunk
    the most expensive levels until the estimated stack fits 38 MB — just
    above the shipped bench shapes' ~37 MB, so the measured-good bench
    path stays byte-identical."""
    cq = [Qp] * len(shapes)

    def est():
        return sum(5 * c * Hl * D * 4 for c, (Hl, _) in zip(cq, shapes))

    for i in sorted(range(len(shapes)),
                    key=lambda i: -shapes[i][0]):
        if est() <= 38 * 1024 * 1024:
            break
        cq[i] = min(Qp, max(128,
                            (8 * 1024 * 1024 // (5 * shapes[i][0] * D * 4))
                            // 8 * 8))
    return tuple(cq)


def _bwd_kernel(fx_ref, fy_ref, att_ref, *refs, P, D, shapes, cqs):
    L = len(shapes)
    v_refs = refs[:L]
    g_ref = refs[L]
    ey_refs = refs[L + 1:2 * L + 1]
    ty_refs = refs[2 * L + 1:3 * L + 1]
    dv_refs = refs[3 * L + 1:4 * L + 1]
    dfx_ref, dfy_ref, datt_ref = refs[4 * L + 1:4 * L + 4]
    Qp = fx_ref.shape[-1]
    g = g_ref[0].astype(jnp.float32)    # [Qp, D]

    for lv, (Hl, Wl) in enumerate(shapes):
        fx = fx_ref[0, lv]
        fy = fy_ref[0, lv]
        att = att_ref[0, lv]
        vx = v_refs[lv][0]                  # [Wl, Hl*D]

        CQ = cqs[lv]
        dv = jnp.zeros((Wl, Hl * D), jnp.float32)
        for q0 in range(0, Qp, CQ):
            cq = min(CQ, Qp - q0)
            jx = _fiota(cq, Wl)
            jy = _fiota(cq, Hl)
            g_exp = jnp.dot(g[q0:q0 + cq], ty_refs[lv][...],
                            preferred_element_type=jnp.float32)  # [cq,Hl*D]
            for p in range(P):
                a = att[p][q0:q0 + cq][:, None]
                hx, ghx = _hat(fx[p][q0:q0 + cq][:, None], jx)
                hy, ghy = _hat(fy[p][q0:q0 + cq][:, None], jy)
                ahy = a * hy

                # ---- y-axis grads: dhy[q, iy] = sum_d g * R ----
                R = jnp.dot(hx.astype(vx.dtype), vx,
                            preferred_element_type=jnp.float32)  # [cq,Hl*D]
                dhy = _dotT(R * g_exp, ey_refs[lv][...])         # [cq, Hl]
                datt_ref[0, lv, p, q0:q0 + cq] = jnp.sum(hy * dhy, axis=1)
                dfy_ref[0, lv, p, q0:q0 + cq] = (
                    att[p][q0:q0 + cq] * jnp.sum(ghy * dhy, axis=1))

                # ---- shared middle M[q, iy*D+d] = a*hy[q,iy]*g[q,d] ----
                hy_exp = jnp.dot(ahy, ey_refs[lv][...],
                                 preferred_element_type=jnp.float32)
                M = hy_exp * g_exp                               # [cq,Hl*D]

                # ---- dV = hx^T @ M ----
                dv = dv + jax.lax.dot_general(
                    hx, M, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [Wl,Hl*D]

                # ---- x grad: dfx = rowsum(M * (ghx @ V)) — a is in M --
                Rg = jnp.dot(ghx.astype(vx.dtype), vx,
                             preferred_element_type=jnp.float32)
                dfx_ref[0, lv, p, q0:q0 + cq] = jnp.sum(M * Rg, axis=1)
        dv_refs[lv][0] = dv


def _layouts(value, spatial_shapes, sampling_locations, attention_weights):
    """Per-level x-major value slabs + per-level packed coords."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts = level_start_indices(spatial_shapes)
    Qp = ((Q + 127) // 128) * 128

    vx = []
    for lv, (h, w) in enumerate(spatial_shapes):
        m = value[:, starts[lv]:starts[lv] + h * w].reshape(B, h, w, H, D)
        vx.append(jnp.transpose(m, (0, 3, 2, 1, 4)).reshape(B * H, w, h * D))

    # [B, Q, H, L, P, 2] -> per level [BH, P, Qp] in level-pixel space
    loc = jnp.transpose(sampling_locations, (0, 2, 3, 4, 1, 5)).astype(
        jnp.float32)  # [B, H, L, P, Q, 2]
    loc = jnp.pad(loc, ((0, 0),) * 4 + ((0, Qp - Q), (0, 0)),
                  constant_values=-1e6)
    att = jnp.pad(
        jnp.transpose(attention_weights, (0, 2, 3, 4, 1)),
        ((0, 0),) * 4 + ((0, Qp - Q),)).astype(jnp.float32)
    wh = np.asarray([[w, h] for h, w in spatial_shapes], np.float32)
    fx = (loc[..., 0] * wh[None, None, :, None, None, 0]
          - 0.5).reshape(B * H, L, P, Qp)
    fy = (loc[..., 1] * wh[None, None, :, None, None, 1]
          - 0.5).reshape(B * H, L, P, Qp)
    att = att.reshape(B * H, L, P, Qp)
    return vx, fx, fy, att, Qp


def _consts(Hl, D):
    return jnp.asarray(_expand_mat(Hl, D)), jnp.asarray(_tile_mat(D, Hl))


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda bh: (0, 0))


def _fwd_impl(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    vx, fx, fy, att, Qp = _layouts(
        value, spatial_shapes, sampling_locations, attention_weights)

    consts = [_consts(Hl, D) for Hl, _ in spatial_shapes]
    qspec = pl.BlockSpec((1, L, P, Qp), lambda bh: (bh, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, P=P, D=D,
                          shapes=tuple(spatial_shapes)),
        grid=(B * H,),
        in_specs=[qspec, qspec, qspec]
        + [pl.BlockSpec((1, Wl, Hl * D), lambda bh: (bh, 0, 0))
           for Hl, Wl in spatial_shapes]
        + [_const_spec(ey.shape) for ey, _ in consts]
        + [_const_spec(ty.shape) for _, ty in consts],
        out_specs=pl.BlockSpec((1, Qp, D), lambda bh: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Qp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(fx, fy, att, *vx, *[ey for ey, _ in consts], *[ty for _, ty in consts])

    out = out.reshape(B, H, Qp, D)[:, :, :Q]
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D).astype(
        value.dtype)


def _bwd_impl(value, spatial_shapes, sampling_locations, attention_weights,
              gout):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    vx, fx, fy, att, Qp = _layouts(
        value, spatial_shapes, sampling_locations, attention_weights)

    g = gout.reshape(B, Q, H, D)
    g = jnp.transpose(g, (0, 2, 1, 3)).reshape(B * H, Q, D)
    g = jnp.pad(g, ((0, 0), (0, Qp - Q), (0, 0))).astype(jnp.float32)

    consts = [_consts(Hl, D) for Hl, _ in spatial_shapes]
    qspec = pl.BlockSpec((1, L, P, Qp), lambda bh: (bh, 0, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, P=P, D=D,
                          shapes=tuple(spatial_shapes),
                          cqs=_bwd_chunks(spatial_shapes, Qp, D)),
        grid=(B * H,),
        in_specs=[qspec, qspec, qspec]
        + [pl.BlockSpec((1, Wl, Hl * D), lambda bh: (bh, 0, 0))
           for Hl, Wl in spatial_shapes]
        + [pl.BlockSpec((1, Qp, D), lambda bh: (bh, 0, 0))]
        + [_const_spec(ey.shape) for ey, _ in consts]
        + [_const_spec(ty.shape) for _, ty in consts],
        out_specs=[
            pl.BlockSpec((1, Wl, Hl * D), lambda bh: (bh, 0, 0))
            for Hl, Wl in spatial_shapes]
        + [qspec, qspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Wl, Hl * D), jnp.float32)
            for Hl, Wl in spatial_shapes]
        + [jax.ShapeDtypeStruct((B * H, L, P, Qp), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(fx, fy, att, *vx, g, *[ey for ey, _ in consts],
      *[ty for _, ty in consts])
    dvs, (dfx, dfy, datt) = outs[:L], outs[L:]

    dv_rows = []
    for lv, (Hl, Wl) in enumerate(spatial_shapes):
        # dv [BH, Wl, Hl*D] -> [B, Hl*Wl, H, D] level rows
        m = dvs[lv].reshape(B, H, Wl, Hl, D)
        dv_rows.append(jnp.transpose(m, (0, 3, 2, 1, 4)).reshape(
            B, Hl * Wl, H, D))
    dvalue = jnp.concatenate(dv_rows, axis=1).astype(value.dtype)

    def unpack(x):  # [BH, L, P, Qp] -> [B, Q, H, L, P]
        x = x.reshape(B, H, L, P, Qp)[..., :Q]
        return jnp.transpose(x, (0, 4, 1, 2, 3))

    wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    gloc = jnp.stack([unpack(dfx), unpack(dfy)], axis=-1)
    gloc = (gloc * wh[None, None, None, :, None, :]).astype(
        sampling_locations.dtype)
    gattn = unpack(datt).astype(attention_weights.dtype)
    return dvalue, gloc, gattn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_sep(value, spatial_shapes, sampling_locations,
                       attention_weights):
    """Exact MSDA (reference semantics), semi-separable MXU Pallas kernel.

    Shapes as ops/msda.py:ms_deform_attn; use for decoder-sized Q."""
    return _fwd_impl(value, spatial_shapes, sampling_locations,
                     attention_weights)


def _fwd_rule(value, spatial_shapes, sampling_locations, attention_weights):
    out = _fwd_impl(value, spatial_shapes, sampling_locations,
                    attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd_rule(spatial_shapes, res, gout):
    value, sampling_locations, attention_weights = res
    return _bwd_impl(value, spatial_shapes, sampling_locations,
                     attention_weights, gout)


ms_deform_attn_sep.defvjp(_fwd_rule, _bwd_rule)
