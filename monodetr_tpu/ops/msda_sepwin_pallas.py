"""Semi-separable windowed MSDA for encoder grid queries (Pallas TPU).

Same clamped-window semantics as ops/msda_pallas.py (the production encoder
path; see its module docstring for the semantics contract vs the reference
CUDA op, ms_deform_im2col_cuda.cuh:238-300), but the per-tile compute is
restructured from VPU hat-product walls into MXU matmuls, following the
factorization proven out in the decoder kernel (ops/msda_sep_pallas.py):

    out[t, d] = sum_p a_p[t] * sum_iy hy_p[t, iy] * R_p[t, iy*D + d]
    R_p[t, iy*D + d] = sum_ix hx_p[ix, t] * stripx[ix, iy*D + d]

The inner x-contraction is a matmul against an x-major value strip; the
y-axis stage is rank-SHp and also rides the MXU via constant 0/1
expand/tile matrices (ey/ty).  Compared to the w3 formulation in
msda_pallas.py (banded [SH, SWp, T] weight build + one [SP, T]^T @ [SP, D]
matmul per head):

  * the [SH, SWp, T] 3-D broadcasts/reductions (the VPU wall and the
    Mosaic relayout soup) disappear — all O(strip * T) work is matmul;
  * backward needs no chunked reductions: with the shared factor
    M = (a*hy)_exp * g_exp,
        dV   += Hx @ M            (x-major, matmul, K = 4T)
        dfx   = rowsum(M * Rg),   Rg = Ghx^T @ stripx   (matmul)
        dhy   = (R * g_exp) @ ey^T                      (rank-SHp)

All four sampling points of a (level, head) are STACKED along the query
axis ("pt layout": columns/rows indexed p*T + t), so each (level, head)
costs ONE hat build per axis and one R-matmul with M = 4T = 512 — not four
M = 128 matmuls — and the dV matmul contracts K = 4T at full MXU depth.
Point results are folded back by three sublane adds (fwd) / four
lane-column writes (bwd).

Layout contract:
  * value maps are x-major per-head slabs [B, H, wv + 2*PAD, Hp4*D] with
    Hp4 = roundup4(hv + 2*PAD): a y-window [sy, sy+SHp) is then a LANE-dim
    slice [sy*D, (sy+SHp)*D) — sy quantized to 4 keeps the slice start a
    multiple of 128 lanes (D = 32), x starts stay quantized to 8 sublanes;
  * fx travels [B, NB, 32, 4T] (rows = lv*8+h, cols = p*T+t); fy/att and
    the per-sample gradient outputs travel [B, NB, 4T, 32] (the y-axis
    algebra is query-major); hosts permute to/from the packed [B, S, 128]
    layout with one XLA transpose each.

Wired as `msda_impl: "sepwin"`; A/B'd against `pallas` on-chip before any
default flip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import level_start_indices
from .msda_pallas import (PAD, _anchor0_fn, _blockify, _check_contract,
                          _pack, _strip_extent, _tile_for_level, _unblockify)

L_, H_, P_ = 4, 8, 4  # lane packing contract (checked by _check_contract)


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _q4(v):
    return (v // 4) * 4


def _q8(v):
    return (v // 8) * 8


def _r4(v):
    return -(-v // 4) * 4


def _geometry(spatial_shapes, lq, G):
    """Strip geometry per sampled level for query-level lq.

    SWp: x extent, start quantized down to 8 (8-sublane DMA alignment)
         -> 8 slack columns; SHp: y extent, start quantized down to 4
         (4*D = 128-lane DMA alignment) -> +3 slack, rounded up to 4.
    """
    hq, wq = spatial_shapes[lq]
    th, tw = _tile_for_level(hq, wq)
    geom = []
    for hv, wv in spatial_shapes:
        SH = _strip_extent(th, hq, hv, G)
        SW = _strip_extent(tw, wq, wv, G)
        geom.append({
            "SHp": _r4(SH + 3),
            "SWp": -(-SW // 8) * 8 + 8,
            "ay0": _anchor0_fn(th, hq, hv),
            "ax0": _anchor0_fn(tw, wq, wv),
        })
    return (th, tw), geom


def _check_pad_sep(spatial_shapes, G):
    """Quantized strips must stay inside the padded maps (static check)."""
    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, tw), geom = _geometry(spatial_shapes, lq, G)
        for lv, (hv, wv) in enumerate(spatial_shapes):
            g = geom[lv]
            ylo = _q4(g["ay0"](0) + PAD - G // 2)
            yhi = _q4(g["ay0"](hq // th - 1) + PAD - G // 2) + g["SHp"]
            assert 0 <= ylo and yhi <= _r4(hv + 2 * PAD), (lq, lv, ylo, yhi)
            xlo = _q8(g["ax0"](0) + PAD - G // 2)
            xhi = _q8(g["ax0"](wq // tw - 1) + PAD - G // 2) + g["SWp"]
            assert 0 <= xlo and xhi <= wv + 2 * PAD, (lq, lv, xlo, xhi)


def _expand_mat(n, D, dtype=np.float32):
    """E [n, n*D]: E[i, i*D + d] = 1 (spread a [., n] row over D-lane
    groups)."""
    e = np.zeros((n, n * D), dtype)
    for i in range(n):
        e[i, i * D:(i + 1) * D] = 1.0
    return e


def _tile_mat(D, n, dtype=np.float32):
    """T [D, n*D]: T[d, i*D + d] = 1 (repeat D lanes n times)."""
    t = np.zeros((D, n * D), dtype)
    for i in range(n):
        t[np.arange(D), i * D + np.arange(D)] = 1.0
    return t


def _dotT(a, b):
    """a [M, K] x b [N, K] -> [M, N]."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot0(a, b):
    """a [K, M] x b [K, N] -> [M, N] (contract leading dims)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _hat_and_grad(d):
    return (jnp.maximum(0.0, 1.0 - jnp.abs(d)),
            jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0))


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _fwd_kernel(fx_ref, fy_ref, att_ref, *refs, geom, nbx, H, D, G):
    """One query tile: L strip DMAs (x-major, all heads), then per
    (level, head) one stacked R-matmul + rank-SHp y epilogue."""
    L = len(geom)
    vx_refs = refs[:L]
    ey_refs = refs[L:2 * L]
    ty_refs = refs[2 * L:3 * L]
    out_ref = refs[3 * L]
    strip_refs = refs[3 * L + 1:4 * L + 1]
    sems = refs[4 * L + 1]

    b = pl.program_id(0)
    i = pl.program_id(1)
    by = i // nbx
    bx = i - by * nbx

    dmas = []
    for lv, g in enumerate(geom):
        sy = _q4(g["ay0"](by) + PAD - G // 2)
        sx = _q8(g["ax0"](bx) + PAD - G // 2)
        dma = pltpu.make_async_copy(
            vx_refs[lv].at[b, :, pl.ds(sx, g["SWp"]),
                           pl.ds(sy * D, g["SHp"] * D)],
            strip_refs[lv],
            sems.at[lv],
        )
        dma.start()
        dmas.append(dma)

    fxw = fx_ref[0, 0]    # [32, 4T] rows = lv*8+h, cols = p*T+t
    fyw = fy_ref[0, 0]    # [4T, 32]
    attw = att_ref[0, 0]  # [4T, 32]
    T = fxw.shape[1] // P_

    outs = [jnp.zeros((T, D), jnp.float32) for _ in range(H)]
    for lv, g in enumerate(geom):
        dmas[lv].wait()
        SHp, SWp = g["SHp"], g["SWp"]
        sy = _q4(g["ay0"](by) + PAD - G // 2) - PAD
        sx = _q8(g["ax0"](bx) + PAD - G // 2) - PAD
        jx = (jax.lax.broadcasted_iota(jnp.int32, (SWp, 1), 0)
              + sx).astype(jnp.float32)
        jy = (jax.lax.broadcasted_iota(jnp.int32, (1, SHp), 1)
              + sy).astype(jnp.float32)
        ey = ey_refs[lv][...]
        ty = ty_refs[lv][...]

        for h in range(H):
            stripx = strip_refs[lv][h]          # [SWp, SHp*D]
            mxu_dtype = (jnp.bfloat16 if stripx.dtype == jnp.bfloat16
                         else jnp.float32)
            rc = lv * H_ + h
            Hx = jnp.maximum(0.0, 1.0 - jnp.abs(fxw[rc:rc + 1] - jx))
            Hy = jnp.maximum(0.0, 1.0 - jnp.abs(fyw[:, rc:rc + 1] - jy))
            ahy = attw[:, rc:rc + 1] * Hy                 # [4T, SHp]
            R = _dot0(Hx.astype(mxu_dtype), stripx)       # [4T, SHp*D]
            hy_exp = jnp.dot(ahy, ey,
                             preferred_element_type=jnp.float32)
            Z = hy_exp * R                                # [4T, SHp*D]
            Z4 = (Z[0:T] + Z[T:2 * T]) + (Z[2 * T:3 * T] + Z[3 * T:4 * T])
            outs[h] = outs[h] + _dotT(Z4, ty)             # [T, D]

    out_ref[0, 0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(fx_ref, fy_ref, att_ref, gout_ref, *refs,
                geom, nbx, H, D, G):
    """Per query tile, per (level, head), over all 4 stacked points:

      R    = Hx^T @ stripx          -> dhy, gatt, gfy   (y epilogues)
      dV  += Hx @ M,  M = (a*hy)_exp * g_exp4           (K = 4T)
      gfx  = rowsum(M * (Ghx^T @ stripx))

    Strip gradients RMW straight into the aliased x-major f32 grad maps —
    the sequential TPU grid makes overlapping halos race-free (same
    contract as msda_pallas._bwd_kernel)."""
    L = len(geom)
    vx_refs = refs[:L]
    # refs[L:2L] are the aliased grad-map INPUT refs (same memory as the
    # outputs); only the outputs are touched.
    ey_refs = refs[2 * L:3 * L]
    ty_refs = refs[3 * L:4 * L]
    gfx_ref, gfy_ref, gatt_ref = refs[4 * L:4 * L + 3]
    gvx_refs = refs[4 * L + 3:5 * L + 3]
    strip_refs = refs[5 * L + 3:6 * L + 3]
    gstrip_refs = refs[6 * L + 3:7 * L + 3]
    sems = refs[7 * L + 3]
    gsems = refs[7 * L + 4]

    b = pl.program_id(0)
    i = pl.program_id(1)
    by = i // nbx
    bx = i - by * nbx

    def region(g, ref):
        sy = _q4(g["ay0"](by) + PAD - G // 2)
        sx = _q8(g["ax0"](bx) + PAD - G // 2)
        return ref.at[b, :, pl.ds(sx, g["SWp"]), pl.ds(sy * D, g["SHp"] * D)]

    v_dmas, gin_dmas = [], []
    for lv, g in enumerate(geom):
        dma = pltpu.make_async_copy(region(g, vx_refs[lv]), strip_refs[lv],
                                    sems.at[lv])
        dma.start()
        v_dmas.append(dma)
        gdma = pltpu.make_async_copy(region(g, gvx_refs[lv]),
                                     gstrip_refs[lv], gsems.at[lv])
        gdma.start()
        gin_dmas.append(gdma)

    fxw = fx_ref[0, 0]    # [32, 4T]
    fyw = fy_ref[0, 0]    # [4T, 32]
    attw = att_ref[0, 0]  # [4T, 32]
    gout = gout_ref[0, 0].astype(jnp.float32)  # [T, H*D]
    T = fxw.shape[1] // P_

    gout_dmas = []
    for lv, g in enumerate(geom):
        v_dmas[lv].wait()
        gin_dmas[lv].wait()
        SHp, SWp = g["SHp"], g["SWp"]
        sy = _q4(g["ay0"](by) + PAD - G // 2) - PAD
        sx = _q8(g["ax0"](bx) + PAD - G // 2) - PAD
        jx = (jax.lax.broadcasted_iota(jnp.int32, (SWp, 1), 0)
              + sx).astype(jnp.float32)
        jy = (jax.lax.broadcasted_iota(jnp.int32, (1, SHp), 1)
              + sy).astype(jnp.float32)
        ey = ey_refs[lv][...]
        ty = ty_refs[lv][...]

        for h in range(H):
            stripx = strip_refs[lv][h]          # [SWp, SHp*D]
            mxu_dtype = (jnp.bfloat16 if stripx.dtype == jnp.bfloat16
                         else jnp.float32)
            rc = lv * H_ + h
            g_h = gout[:, h * D:(h + 1) * D]    # [T, D]
            g4 = jnp.concatenate([g_h] * P_, axis=0)        # [4T, D]
            g_exp4 = jnp.dot(g4, ty,
                             preferred_element_type=jnp.float32)

            a = attw[:, rc:rc + 1]                          # [4T, 1]
            Hx, Ghx = _hat_and_grad(fxw[rc:rc + 1] - jx)    # [SWp, 4T]
            Hy, Ghy = _hat_and_grad(fyw[:, rc:rc + 1] - jy)  # [4T, SHp]
            ahy = a * Hy

            R = _dot0(Hx.astype(mxu_dtype), stripx)         # [4T, SHp*D]
            dhy = _dotT(R * g_exp4, ey)                     # [4T, SHp]
            gatt_ref[0, 0, :, rc:rc + 1] = jnp.sum(
                Hy * dhy, axis=1, keepdims=True)
            gfy_ref[0, 0, :, rc:rc + 1] = a * jnp.sum(
                Ghy * dhy, axis=1, keepdims=True)

            ahy_exp = jnp.dot(ahy, ey,
                              preferred_element_type=jnp.float32)
            M = ahy_exp * g_exp4                            # [4T, SHp*D]
            gstrip_refs[lv][h] = gstrip_refs[lv][h] + jax.lax.dot_general(
                Hx.astype(mxu_dtype), M.astype(mxu_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [SWp, SHp*D]

            Rg = _dot0(Ghx.astype(mxu_dtype), stripx)       # [4T, SHp*D]
            gfx_ref[0, 0, :, rc:rc + 1] = jnp.sum(
                M * Rg, axis=1, keepdims=True)
        gdma = pltpu.make_async_copy(gstrip_refs[lv], region(g, gvx_refs[lv]),
                                     gsems.at[lv])
        gdma.start()
        gout_dmas.append(gdma)

    for gdma in gout_dmas:
        gdma.wait()


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

def _pad_value_x(value, spatial_shapes):
    """[B, S, H, D] level-major rows -> x-major per-head PAD-haloed slabs
    [B, H, wv + 2*PAD, Hp4*D]."""
    B, S, H, D = value.shape
    starts = level_start_indices(spatial_shapes)
    vmaps = []
    for lv, (hv, wv) in enumerate(spatial_shapes):
        m = value[:, starts[lv]:starts[lv] + hv * wv].reshape(
            B, hv, wv, H, D)
        hp4 = _r4(hv + 2 * PAD)
        m = jnp.pad(m, ((0, 0), (PAD, hp4 - hv - PAD), (PAD, PAD),
                        (0, 0), (0, 0)))
        vmaps.append(jnp.transpose(m, (0, 3, 2, 1, 4)).reshape(
            B, H, wv + 2 * PAD, hp4 * D))
    return vmaps


def _to_pt_rows(x):
    """[B, NB, T, 128] (lane = lv*32 + h*4 + p) -> [B, NB, 32, 4T]
    (row = lv*8 + h, col = p*T + t)."""
    B, NB, T, _ = x.shape
    x = x.reshape(B, NB, T, L_, H_, P_)
    return jnp.transpose(x, (0, 1, 3, 4, 5, 2)).reshape(
        B, NB, L_ * H_, P_ * T)


def _to_pt_cols(x):
    """[B, NB, T, 128] -> [B, NB, 4T, 32] (row = p*T + t, col = lv*8 + h)."""
    B, NB, T, _ = x.shape
    x = x.reshape(B, NB, T, L_, H_, P_)
    return jnp.transpose(x, (0, 1, 5, 2, 3, 4)).reshape(
        B, NB, P_ * T, L_ * H_)


def _from_pt_cols(x):
    """[B, NB, 4T, 32] -> [B, NB, T, 128]."""
    B, NB, PT, _ = x.shape
    T = PT // P_
    x = x.reshape(B, NB, P_, T, L_, H_)
    return jnp.transpose(x, (0, 1, 3, 4, 5, 2)).reshape(B, NB, T, 128)


def _consts(geom, D):
    eys = [jnp.asarray(_expand_mat(g["SHp"], D)) for g in geom]
    tys = [jnp.asarray(_tile_mat(D, g["SHp"])) for g in geom]
    return eys, tys


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda b, i: (0, 0))


def _fwd_impl(value, spatial_shapes, fx, fy, att, window):
    B, S, H, D = value.shape
    G = window
    _check_pad_sep(spatial_shapes, G)
    starts = level_start_indices(spatial_shapes)
    L = len(spatial_shapes)
    vmaps = _pad_value_x(value, spatial_shapes)

    outs = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, tw), geom = _geometry(spatial_shapes, lq, G)
        s0, nq = starts[lq], hq * wq
        nbx = wq // tw
        NB = (hq // th) * nbx
        T = th * tw
        eys, tys = _consts(geom, D)

        def blk(x):
            return _blockify(x[:, s0:s0 + nq], hq, wq, th, tw)

        kernel = functools.partial(_fwd_kernel, geom=geom, nbx=nbx,
                                   H=H, D=D, G=G)
        out = pl.pallas_call(
            kernel,
            grid=(B, NB),
            in_specs=[pl.BlockSpec((1, 1, 32, P_ * T),
                                   lambda b, i: (b, i, 0, 0)),
                      pl.BlockSpec((1, 1, P_ * T, 32),
                                   lambda b, i: (b, i, 0, 0)),
                      pl.BlockSpec((1, 1, P_ * T, 32),
                                   lambda b, i: (b, i, 0, 0))]
            + [pl.BlockSpec(memory_space=pl.ANY)] * L
            + [_const_spec(e.shape) for e in eys]
            + [_const_spec(t.shape) for t in tys],
            out_specs=pl.BlockSpec((1, 1, T, H * D),
                                   lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NB, T, H * D), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((H, g["SWp"], g["SHp"] * D), value.dtype)
                for g in geom
            ] + [pltpu.SemaphoreType.DMA((L,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
            interpret=_interpret(),
        )(_to_pt_rows(blk(fx)), _to_pt_cols(blk(fy)), _to_pt_cols(blk(att)),
          *vmaps, *eys, *tys)
        outs.append(_unblockify(out, hq, wq, th, tw))

    return jnp.concatenate(outs, axis=1).astype(value.dtype)


def _bwd_impl(value, spatial_shapes, fx, fy, att, window, gout):
    B, S, H, D = value.shape
    G = window
    starts = level_start_indices(spatial_shapes)
    L = len(spatial_shapes)
    vmaps = _pad_value_x(value, spatial_shapes)
    gout = gout.reshape(B, S, H * D).astype(jnp.float32)

    gvmaps = [jnp.zeros(v.shape, jnp.float32) for v in vmaps]
    gfx = jnp.zeros((B, S, 128), jnp.float32)
    gfy = jnp.zeros((B, S, 128), jnp.float32)
    gatt = jnp.zeros((B, S, 128), jnp.float32)

    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, tw), geom = _geometry(spatial_shapes, lq, G)
        s0, nq = starts[lq], hq * wq
        nbx = wq // tw
        NB = (hq // th) * nbx
        T = th * tw
        eys, tys = _consts(geom, D)

        def blk(x):
            return _blockify(x[:, s0:s0 + nq], hq, wq, th, tw)

        ptspec = pl.BlockSpec((1, 1, P_ * T, 32), lambda b, i: (b, i, 0, 0))
        kernel = functools.partial(_bwd_kernel, geom=geom, nbx=nbx,
                                   H=H, D=D, G=G)
        gfx_b, gfy_b, gatt_b, *gvmaps = pl.pallas_call(
            kernel,
            grid=(B, NB),
            in_specs=[pl.BlockSpec((1, 1, 32, P_ * T),
                                   lambda b, i: (b, i, 0, 0)),
                      ptspec, ptspec,
                      pl.BlockSpec((1, 1, T, H * D),
                                   lambda b, i: (b, i, 0, 0))]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * L)
            + [_const_spec(e.shape) for e in eys]
            + [_const_spec(t.shape) for t in tys],
            out_specs=[ptspec] * 3 + [pl.BlockSpec(memory_space=pl.ANY)] * L,
            out_shape=[jax.ShapeDtypeStruct((B, NB, P_ * T, 32),
                                            jnp.float32)] * 3
            + [jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in vmaps],
            input_output_aliases={4 + L + lv: 3 + lv for lv in range(L)},
            scratch_shapes=[
                pltpu.VMEM((H, g["SWp"], g["SHp"] * D), value.dtype)
                for g in geom
            ] + [
                pltpu.VMEM((H, g["SWp"], g["SHp"] * D), jnp.float32)
                for g in geom
            ] + [pltpu.SemaphoreType.DMA((L,)), pltpu.SemaphoreType.DMA((L,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
            interpret=_interpret(),
        )(_to_pt_rows(blk(fx)), _to_pt_cols(blk(fy)), _to_pt_cols(blk(att)),
          blk(gout), *vmaps, *gvmaps, *eys, *tys)

        gfx = gfx.at[:, s0:s0 + nq].set(
            _unblockify(_from_pt_cols(gfx_b), hq, wq, th, tw))
        gfy = gfy.at[:, s0:s0 + nq].set(
            _unblockify(_from_pt_cols(gfy_b), hq, wq, th, tw))
        gatt = gatt.at[:, s0:s0 + nq].set(
            _unblockify(_from_pt_cols(gatt_b), hq, wq, th, tw))

    # grad value: x-major slabs -> level-major rows (halo stripped)
    gv_rows = []
    for lv, (hv, wv) in enumerate(spatial_shapes):
        hp4 = _r4(hv + 2 * PAD)
        m = gvmaps[lv].reshape(B, H, wv + 2 * PAD, hp4, D)
        core = m[:, :, PAD:PAD + wv, PAD:PAD + hv]
        gv_rows.append(jnp.transpose(core, (0, 3, 2, 1, 4)).reshape(
            B, hv * wv, H, D))
    gvalue = jnp.concatenate(gv_rows, axis=1).astype(value.dtype)
    return gvalue, gfx, gfy, gatt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def _msda_packed(value, spatial_shapes, fx, fy, att, window):
    return _fwd_impl(value, spatial_shapes, fx, fy, att, window)


def _fwd_rule(value, spatial_shapes, fx, fy, att, window):
    out = _fwd_impl(value, spatial_shapes, fx, fy, att, window)
    return out, (value, fx, fy, att)


def _bwd_rule(spatial_shapes, window, res, gout):
    value, fx, fy, att = res
    return _bwd_impl(value, spatial_shapes, fx, fy, att, window, gout)


_msda_packed.defvjp(_fwd_rule, _bwd_rule)


def ms_deform_attn_sepwin(value, spatial_shapes, sampling_locations,
                          attention_weights, window: int = 8):
    """Windowed MSDA for grid queries, semi-separable MXU formulation.

    Semantics identical to ms_deform_attn_pallas (clamped to +-(G/2-1) px
    around each query's static center per level); only the kernel compute
    structure differs.  The clamp/pack prologue stays outside the
    custom-vjp so AD chains through it (see msda_pallas._pack).
    """
    _check_contract(value, sampling_locations, spatial_shapes)
    fx, fy, att = _pack(spatial_shapes, sampling_locations,
                        attention_weights, window)
    return _msda_packed(value, tuple(spatial_shapes), fx, fy, att, window)
