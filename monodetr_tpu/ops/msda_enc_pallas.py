"""Fused-prologue windowed MSDA for encoder grid queries (Pallas TPU).

Same sampling math as ops/msda_pallas.py (the windowed kernel: positions
clamped to +-(G/2-1) px around each query's static center in every sampled
level), but the whole attention prologue/epilogue moves INSIDE the kernel:

  * inputs are the RAW bf16 projection outputs — sampling offsets
    [B, S, 256] (feature order [x-block | y-block], each (h, lv, p)) and
    attention LOGITS [B, S, 128] (the reference's natural (h, lv*P+p)
    feature order) — plus the projected value tokens;
  * softmax over each head's 16 (level, point) lanes, the window clamp,
    and the static grid centers are computed in VMEM per tile (softmax
    group sums ride the MXU via a block-diagonal ones matmul);
  * per-tile operands arrive as natural-layout [1, th, twp, C] blocks of
    [B, hq, wqp, C] arrays — no f32 [B, S, 128] pack arrays, no
    blockify/transpose relayout passes in XLA, bf16 transport everywhere
    except the f32 value-gradient maps;
  * the backward emits bf16 gradients for the offset/logit projections
    (chain rule through clamp + softmax applied in-kernel) and accumulates
    f32 value-map gradients with the same sequential-grid RMW strips as
    msda_pallas.

This matches the reference CUDA extension's one-launch structure — the
kernel consumes projection outputs directly and produces the attention
output in one pass per direction (ms_deform_attn_cuda.cu:20-80,
ms_deform_im2col_cuda.cuh:956-1026) — re-derived for the TPU memory
system (strip DMA + separable hat algebra + MXU, see msda_pallas.py).

Numerics match the `pallas` path bit-for-bit-ish: the projections already
run in bf16, so transporting their outputs in bf16 loses nothing; softmax
runs in f32 exactly as the module did in XLA.

Query-grid padding: levels whose width is not a multiple of 8 are padded
to wqp (pad queries get attention 0 and clamp their centers to the last
real column), so every [th, twp, C] block merges to [T, C] without a
Mosaic relayout.  Outputs are sliced back to the real grid.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import level_start_indices
from .msda_pallas import (PAD, VMEM_BUDGET, _anchor0_fn, _interpret,
                          _pad_value, _strip_extent, _STEP_FIXED_US,
                          _STEP_BETA_US)

H, L, P = 8, 4, 4  # lane = h*16 + lv*4 + p (hardcoded packing)


def offset_feature_perm():
    """Static permutation taking the sampling_offsets projection's
    reference feature order (h, lv, p, xy) — ms_deform_attn.py:107-114 —
    to [x-block | y-block] with each block in (h, lv, p) lane order."""
    idx = np.arange(H * L * P * 2).reshape(H, L, P, 2)
    flat = idx.reshape(-1, 2)  # already (h, lv, p) major
    return np.concatenate([flat[:, 0], flat[:, 1]])


# --------------------------------------------------------------------------
# geometry (padded-width variant of msda_pallas._geometry)
# --------------------------------------------------------------------------

def _fused_geometry(spatial_shapes, lq, G):
    """Choose (th, twp, wqp) with twp % 8 == 0 over the width-padded query
    grid, and per-sampled-level strip geometry.  Pad columns clamp to the
    last real column, so strip extents use the real-column span."""
    hq, wq = spatial_shapes[lq]

    def build(th, twp, wqp):
        nbx = wqp // twp
        geom = []
        for hv, wv in spatial_shapes:
            SH = _strip_extent(th, hq, hv, G)
            cspan = max(min(twp, wq - bx * twp) - 1 for bx in range(nbx))
            SW = -(-(cspan * wv) // wq) + G + 2
            ax0 = _anchor0_fn(twp, wq, wv)
            rho = max((ax0(bx) + PAD - G // 2) % 8 for bx in range(nbx))
            geom.append({
                "SH": SH,
                "SWp": -(-(SW + rho) // 8) * 8,
                "ay0": _anchor0_fn(th, hq, hv),
                "ax0": ax0,
            })
        return geom

    def vmem_est(geom, T):
        sp = [g["SH"] * g["SWp"] for g in geom]
        return sum(sp) * 256 * (4 + 4) + 2 * max(sp) * T * 4

    cands = []
    for th in range(1, min(hq, 16) + 1):
        if hq % th:
            continue
        for twp in range(8, min(-(-wq // 8) * 8, 64) + 1, 8):
            wqp = -(-wq // twp) * twp
            if wqp - wq >= twp:  # would create an all-pad tile
                continue
            if th * twp > 512:
                continue
            cands.append((th, twp, wqp))

    scored = []
    for th, twp, wqp in cands:
        geom = build(th, twp, wqp)
        T = th * twp
        tpad = max(128, -(-T // 128) * 128)
        nb = (hq // th) * (wqp // twp)
        sp_sum = sum(g["SH"] * g["SWp"] for g in geom)
        cost = nb * (_STEP_FIXED_US + _STEP_BETA_US * sp_sum * tpad)
        scored.append((cost, T, th, twp, wqp, geom))
    scored.sort(key=lambda c: (c[0], -c[1]))
    for _, T, th, twp, wqp, geom in scored:
        if vmem_est(geom, T) <= VMEM_BUDGET:
            return (th, twp, wqp), geom
    raise ValueError(
        f"no fused-MSDA tiling fits VMEM for level {lq} of {spatial_shapes}")


def _check_pad_fused(spatial_shapes, G):
    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, twp, wqp), geom = _fused_geometry(spatial_shapes, lq, G)
        for lv, (hv, wv) in enumerate(spatial_shapes):
            g = geom[lv]
            ys = [g["ay0"](by) + PAD - G // 2 for by in range(hq // th)]
            assert 0 <= min(ys) and max(ys) + g["SH"] <= hv + 2 * PAD, (
                "y", lq, lv, min(ys), max(ys) + g["SH"], hv)
            xs = [((g["ax0"](bx) + PAD - G // 2) // 8) * 8
                  for bx in range(wqp // twp)]
            assert 0 <= min(xs) and max(xs) + g["SWp"] <= wv + 2 * PAD, (
                "x", lq, lv, min(xs), max(xs) + g["SWp"], wv)


# --------------------------------------------------------------------------
# in-kernel prologue helpers
# --------------------------------------------------------------------------

def _head_mask():
    """[128, 128] f32: 1 where both lanes belong to the same head's
    16-lane (level, point) group — softmax group sums as one MXU matmul."""
    l1 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // 16
    l2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // 16
    return (l1 == l2).astype(jnp.float32)


def _softmax_att(logit, valid):
    """[T, 128] bf16 logits -> [T, 128] f32 per-head-softmax weights,
    zeroed on pad queries.  Subtracting the ROW max (over all 128 lanes)
    is exact for each 16-lane group's softmax and numerically safe."""
    z = logit.astype(jnp.float32)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z)
    s = jax.lax.dot_general(e, _head_mask(), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (e / s) * valid


def _centers(by, bx, th, twp, wq_real, hq, wq, spatial_shapes):
    """Per-sampled-level center rows cx/cy [1, T] (T on lanes) for the
    tile's queries; pad columns clamp to the last real column."""
    T = th * twp
    t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    ty = t // twp
    tx = t - ty * twp
    gy = by * th + ty
    gx = jnp.minimum(bx * twp + tx, wq_real - 1)
    rows = []
    for hv, wv in spatial_shapes:
        cy = (gy.astype(jnp.float32) + 0.5) * (hv / hq) - 0.5
        cx = (gx.astype(jnp.float32) + 0.5) * (wv / wq) - 0.5
        rows.append((cy, cx))
    return rows


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _make_strip_dma(v_ref, strip_ref, sem_ref, g, nbx, G, ii, bb, slot):
    """DMA descriptor for tile ii of batch bb into strip buffer `slot`
    (identical descriptors are used to start and to wait)."""
    by = ii // nbx
    bx = ii - by * nbx
    sy = g["ay0"](by) + PAD - G // 2
    sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8
    return pltpu.make_async_copy(
        v_ref.at[bb, pl.ds(sy, g["SH"]), pl.ds(sx, g["SWp"]), :],
        strip_ref.at[slot], sem_ref.at[slot])


def _next_step(i, b, B):
    wrap = b + 1 == B
    return jnp.where(wrap, i + 1, i), jnp.where(wrap, 0, b + 1)


def _fwd_kernel(off_ref, logit_ref, *refs, geom, nbx, D, G, lim,
                th, twp, wq_real, hq, wq, spatial_shapes, out_dtype, nbuf):
    """Grid (NB, B) — batch INNERMOST, so consecutive grid steps touch
    different batch items' value maps.  With nbuf=2 the next step's strips
    are prefetched during the current step's compute (double-buffered); the
    read-only value maps make this safe for any B."""
    Lg = len(geom)
    v_refs = refs[:Lg]
    out_ref = refs[Lg]
    strip_refs = refs[Lg + 1:2 * Lg + 1]  # each [nbuf, SH, SWp, C]
    sems = refs[2 * Lg + 1]               # DMA sems [nbuf, Lg]

    i = pl.program_id(0)
    b = pl.program_id(1)
    B = pl.num_programs(1)
    NB = pl.num_programs(0)
    by = i // nbx
    bx = i - by * nbx

    def dma(lv, ii, bb, slot):
        return _make_strip_dma(v_refs[lv], strip_refs[lv], sems.at[..., lv],
                               geom[lv], nbx, G, ii, bb, slot)

    if nbuf == 1:
        for lv in range(Lg):
            dma(lv, i, b, 0).start()
        slot = 0
    else:
        step = i * B + b
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            for lv in range(Lg):
                dma(lv, i, b, slot).start()

        @pl.when(step + 1 < NB * B)
        def _():
            ni, nb = _next_step(i, b, B)
            for lv in range(Lg):
                dma(lv, ni, nb, 1 - slot).start()

    T = th * twp
    off = off_ref[0].reshape(T, 2 * 128)
    logit = logit_ref[0].reshape(T, 128)
    # valid query mask: real column index < wq_real (pad queries -> att 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    txq = t - (t // twp) * twp
    valid = (bx * twp + txq < wq_real).astype(jnp.float32)
    att = _softmax_att(logit, valid)

    offc = jnp.clip(off.astype(jnp.float32), -lim, lim)
    # transpose to the hat-algebra orientation (per-sample rows on sublanes)
    attT = att.T                       # [128, T]
    oxT = offc[:, :128].T
    oyT = offc[:, 128:].T
    centers = _centers(by, bx, th, twp, wq_real, hq, wq, spatial_shapes)

    outs = [jnp.zeros((T, D), jnp.float32) for _ in range(H)]
    for lv, g in enumerate(geom):
        dma(lv, i, b, slot).wait()
        SH, SWp = g["SH"], g["SWp"]
        SP = SH * SWp
        strip = strip_refs[lv][slot].reshape(SP, H * D)
        mxu_dtype = (jnp.bfloat16 if strip.dtype == jnp.bfloat16
                     else jnp.float32)
        cy, cx = centers[lv]
        sy = g["ay0"](by) - G // 2
        sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8 - PAD
        jy_s = (jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0)
                + sy).astype(jnp.float32)
        jx_s = (jax.lax.broadcasted_iota(jnp.int32, (SWp, 1), 0)
                + sx).astype(jnp.float32)

        for h in range(H):
            w3 = jnp.zeros((SH, SWp, T), jnp.float32)
            for p in range(4):
                lane = h * 16 + lv * 4 + p
                fy = cy + oyT[lane:lane + 1]
                fx = cx + oxT[lane:lane + 1]
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - jy_s))
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - jx_s))
                hy = attT[lane:lane + 1] * hy
                w3 = w3 + hy[:, None, :] * hx[None, :, :]
            outs[h] = outs[h] + jax.lax.dot_general(
                w3.reshape(SP, T).astype(mxu_dtype),
                strip[:, h * D:(h + 1) * D].astype(mxu_dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    out_ref[0] = jnp.concatenate(outs, axis=-1).reshape(
        th, twp, H * D).astype(out_dtype)


def _gstrip_dma(gv_ref, gstrip_ref, sem_ref, g, nbx, G, ii, bb, slot,
                out=False):
    """RMW gradient-strip DMA: map->buffer (in) or buffer->map (out)."""
    by = ii // nbx
    bx = ii - by * nbx
    sy = g["ay0"](by) + PAD - G // 2
    sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8
    reg = gv_ref.at[bb, pl.ds(sy, g["SH"]), pl.ds(sx, g["SWp"]), :]
    buf = gstrip_ref.at[slot]
    if out:
        return pltpu.make_async_copy(buf, reg, sem_ref.at[slot])
    return pltpu.make_async_copy(reg, buf, sem_ref.at[slot])


def _bwd_kernel(off_ref, logit_ref, gout_ref, *refs, geom, nbx, D, G, lim,
                th, twp, wq_real, hq, wq, spatial_shapes, nbuf):
    """Grid (NB, B), batch innermost.  With nbuf=2 (requires B >= 2 so
    consecutive steps touch different batch items' grad maps):

      - the next step's value+grad strips are prefetched during compute;
      - each step's grad-strip write-back DMA stays in flight through the
        NEXT step (its buffer is only reused, and its region only re-read,
        after an explicit wait one step later) — the RMW chain for a given
        map region is ordered because overlapping tiles of the SAME batch
        item are B grid steps apart.
    """
    Lg = len(geom)
    v_refs = refs[:Lg]
    # refs[Lg:2Lg] are the aliased grad-map INPUT refs (same memory as the
    # outputs below; only the outputs are touched)
    goff_ref = refs[2 * Lg]
    glogit_ref = refs[2 * Lg + 1]
    gv_refs = refs[2 * Lg + 2:3 * Lg + 2]
    strip_refs = refs[3 * Lg + 2:4 * Lg + 2]    # [nbuf, SH, SWp, C]
    gstrip_refs = refs[4 * Lg + 2:5 * Lg + 2]   # [nbuf, SH, SWp, C] f32
    gfxT_ref = refs[5 * Lg + 2]      # [128, T] f32 scratch (per-lane rows)
    gfyT_ref = refs[5 * Lg + 3]
    gattT_ref = refs[5 * Lg + 4]
    sems = refs[5 * Lg + 5]          # v-strip DMA sems [nbuf, Lg]
    gsems_in = refs[5 * Lg + 6]      # grad-strip in [nbuf, Lg]
    gsems_out = refs[5 * Lg + 7]     # grad-strip out [nbuf, Lg]

    i = pl.program_id(0)
    b = pl.program_id(1)
    B = pl.num_programs(1)
    NB = pl.num_programs(0)
    by = i // nbx
    bx = i - by * nbx

    def dma_v(lv, ii, bb, slot):
        return _make_strip_dma(v_refs[lv], strip_refs[lv],
                               sems.at[..., lv], geom[lv], nbx, G,
                               ii, bb, slot)

    def dma_gin(lv, ii, bb, slot):
        return _gstrip_dma(gv_refs[lv], gstrip_refs[lv],
                           gsems_in.at[..., lv], geom[lv], nbx, G,
                           ii, bb, slot)

    def dma_gout(lv, ii, bb, slot):
        return _gstrip_dma(gv_refs[lv], gstrip_refs[lv],
                           gsems_out.at[..., lv], geom[lv], nbx, G,
                           ii, bb, slot, out=True)

    if nbuf == 1:
        slot = 0
        for lv in range(Lg):
            dma_v(lv, i, b, 0).start()
            dma_gin(lv, i, b, 0).start()
    else:
        step = i * B + b
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            for lv in range(Lg):
                dma_v(lv, i, b, slot).start()
                dma_gin(lv, i, b, slot).start()

        # the OTHER slot's write-back was issued at step-1; it must land
        # before that buffer is refilled (prefetch below) and before any
        # later read of its region (the next same-batch tile is B steps
        # away, so this wait over-satisfies the RMW ordering)
        @pl.when(step >= 1)
        def _():
            pi = jnp.where(b == 0, i - 1, i)
            pb = jnp.where(b == 0, B - 1, b - 1)
            for lv in range(Lg):
                dma_gout(lv, pi, pb, 1 - slot).wait()

        @pl.when(step + 1 < NB * B)
        def _():
            ni, nb = _next_step(i, b, B)
            for lv in range(Lg):
                dma_v(lv, ni, nb, 1 - slot).start()
                dma_gin(lv, ni, nb, 1 - slot).start()

    T = th * twp
    off = off_ref[0].reshape(T, 2 * 128)
    logit = logit_ref[0].reshape(T, 128)
    gout = gout_ref[0].reshape(T, H * D).astype(jnp.float32)
    t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    txq = t - (t // twp) * twp
    valid = (bx * twp + txq < wq_real).astype(jnp.float32)
    att = _softmax_att(logit, valid)

    off_f = off.astype(jnp.float32)
    offc = jnp.clip(off_f, -lim, lim)
    attT = att.T
    oxT = offc[:, :128].T
    oyT = offc[:, 128:].T
    centers = _centers(by, bx, th, twp, wq_real, hq, wq, spatial_shapes)

    for lv, g in enumerate(geom):
        dma_v(lv, i, b, slot).wait()
        dma_gin(lv, i, b, slot).wait()
        SH, SWp = g["SH"], g["SWp"]
        SP = SH * SWp
        strip = strip_refs[lv][slot].reshape(SP, H * D)
        mxu_dtype = (jnp.bfloat16 if strip.dtype == jnp.bfloat16
                     else jnp.float32)
        cy, cx = centers[lv]
        sy = g["ay0"](by) - G // 2
        sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8 - PAD
        jy_s = (jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0)
                + sy).astype(jnp.float32)
        jx_s = (jax.lax.broadcasted_iota(jnp.int32, (SWp, 1), 0)
                + sx).astype(jnp.float32)

        for h in range(H):
            gout_h = gout[:, h * D:(h + 1) * D]
            m = jax.lax.dot_general(
                strip[:, h * D:(h + 1) * D].astype(mxu_dtype),
                gout_h.astype(mxu_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [SP, T]
            M3 = m.reshape(SH, SWp, T)
            w3 = jnp.zeros((SH, SWp, T), jnp.float32)
            for p in range(4):
                lane = h * 16 + lv * 4 + p
                a = attT[lane:lane + 1]
                dy = cy + oyT[lane:lane + 1] - jy_s      # [SH, T]
                dx = cx + oxT[lane:lane + 1] - jx_s      # [SWp, T]
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
                dhx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0)
                dhy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
                R1 = jnp.sum(M3 * hx[None, :, :], axis=1)   # [SH, T]
                R2 = jnp.sum(M3 * dhx[None, :, :], axis=1)  # [SH, T]
                w3 = w3 + (a * hy)[:, None, :] * hx[None, :, :]
                # each lane is visited exactly once across the (lv, h, p)
                # loops, so plain row stores (no accumulation needed)
                gattT_ref[lane:lane + 1, :] = jnp.sum(hy * R1, axis=0,
                                                      keepdims=True)
                gfxT_ref[lane:lane + 1, :] = a * jnp.sum(hy * R2, axis=0,
                                                         keepdims=True)
                gfyT_ref[lane:lane + 1, :] = a * jnp.sum(dhy * R1, axis=0,
                                                         keepdims=True)
            gs_h = jax.lax.dot_general(
                w3.reshape(SP, T).astype(mxu_dtype),
                gout_h.astype(mxu_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [SP, D]
            gstrip_refs[lv][slot, :, :, h * D:(h + 1) * D] = (
                gstrip_refs[lv][slot, :, :, h * D:(h + 1) * D]
                + gs_h.reshape(SH, SWp, D))
        dma_gout(lv, i, b, slot).start()

    # epilogue: chain rule through clamp + softmax, back to [T, 128] layout
    gatt = gattT_ref[:].T                            # [T, 128]
    # softmax vjp within each head group: glogit = att*(g - sum(att*g))
    s2 = jax.lax.dot_general(att * gatt, _head_mask(),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    glogit = att * (gatt - s2)
    glogit_ref[0] = glogit.reshape(th, twp, 128).astype(glogit_ref.dtype)

    inside = (jnp.abs(off_f) < lim).astype(jnp.float32)  # clamp grad mask
    goff = jnp.concatenate([gfxT_ref[:].T, gfyT_ref[:].T], axis=-1) * inside
    goff_ref[0] = goff.reshape(th, twp, 2 * 128).astype(goff_ref.dtype)

    if nbuf == 1:
        for lv in range(Lg):
            dma_gout(lv, i, b, 0).wait()
    else:
        # own write-backs stay in flight through the next step (waited
        # there); only the FINAL grid step must drain its own
        @pl.when(i * B + b == NB * B - 1)
        def _():
            for lv in range(Lg):
                dma_gout(lv, i, b, slot).wait()


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

def _level_views(x, spatial_shapes, wqps):
    """[B, S, C] level-major -> per-level [B, hq, wqp, C] (width padded)."""
    B, S, C = x.shape
    starts = level_start_indices(spatial_shapes)
    views = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        v = x[:, starts[lq]:starts[lq] + hq * wq].reshape(B, hq, wq, C)
        if wqps[lq] != wq:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wqps[lq] - wq), (0, 0)))
        views.append(v)
    return views


def _nat_spec(th, twp, C, nbx):
    # grid is (NB, B) — batch innermost (see _fwd_kernel)
    return pl.BlockSpec((1, th, twp, C),
                        lambda i, b: (b, i // nbx, i % nbx, 0))


def _pick_nbuf(geom, T, B, itemsize, with_grads):
    """2 (double-buffered strips, prefetch + deferred write-back) when the
    doubled scratch fits — the backward additionally needs B >= 2 so
    consecutive grid steps touch different batch items' grad maps (see
    _bwd_kernel's RMW ordering argument).  The allowance is 24 MB, looser
    than the geometry's VMEM_BUDGET: the coarse query levels' big strips
    are exactly the DMA-heaviest tiles, and the chip's scoped-vmem
    capacity (>= 64 MB, measured via the other kernels' limits) has room."""
    if with_grads and B < 2:
        return 1
    sp = [g["SH"] * g["SWp"] for g in geom]
    per_buf = sum(sp) * 256 * (itemsize + (4 if with_grads else 0))
    est = 2 * per_buf + 2 * max(sp) * T * 4
    return 2 if est <= 24 * 1024 * 1024 else 1


def _geoms(spatial_shapes, G):
    return [_fused_geometry(spatial_shapes, lq, G)
            for lq in range(len(spatial_shapes))]


def _fwd_impl(value, spatial_shapes, off, logits, window):
    B, S, Hh, D = value.shape
    G = window
    _check_pad_fused(spatial_shapes, G)
    lim = G / 2 - 1 - 1e-2
    geos = _geoms(spatial_shapes, G)
    wqps = [g[0][2] for g in geos]
    vmaps = _pad_value(value, spatial_shapes)
    off_v = _level_views(off, spatial_shapes, wqps)
    log_v = _level_views(logits, spatial_shapes, wqps)

    outs = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, twp, wqp), geom = geos[lq]
        nbx = wqp // twp
        NB = (hq // th) * nbx
        nbuf = _pick_nbuf(geom, th * twp, B, value.dtype.itemsize, False)
        kernel = functools.partial(
            _fwd_kernel, geom=geom, nbx=nbx, D=D, G=G, lim=lim,
            th=th, twp=twp, wq_real=wq, hq=hq, wq=wq,
            spatial_shapes=spatial_shapes, out_dtype=value.dtype, nbuf=nbuf)
        out = pl.pallas_call(
            kernel,
            grid=(NB, B),
            in_specs=[_nat_spec(th, twp, 256, nbx),
                      _nat_spec(th, twp, 128, nbx)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(spatial_shapes),
            out_specs=_nat_spec(th, twp, Hh * D, nbx),
            out_shape=jax.ShapeDtypeStruct((B, hq, wqp, Hh * D), value.dtype),
            scratch_shapes=[
                pltpu.VMEM((nbuf, g["SH"], g["SWp"], Hh * D), value.dtype)
                for g in geom
            ] + [pltpu.SemaphoreType.DMA((nbuf, len(geom)))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=_interpret(),
        )(off_v[lq], log_v[lq], *vmaps)
        outs.append(out[:, :, :wq, :].reshape(B, hq * wq, Hh * D))

    return jnp.concatenate(outs, axis=1)


def _bwd_impl(value, spatial_shapes, off, logits, window, gout):
    B, S, Hh, D = value.shape
    G = window
    lim = G / 2 - 1 - 1e-2
    geos = _geoms(spatial_shapes, G)
    wqps = [g[0][2] for g in geos]
    vmaps = _pad_value(value, spatial_shapes)
    off_v = _level_views(off, spatial_shapes, wqps)
    log_v = _level_views(logits, spatial_shapes, wqps)
    gout_v = _level_views(gout.reshape(B, S, Hh * D), spatial_shapes, wqps)

    gvmaps = [jnp.zeros(v.shape, jnp.float32) for v in vmaps]
    goffs, glogits = [], []
    Lg = len(spatial_shapes)

    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, twp, wqp), geom = geos[lq]
        nbx = wqp // twp
        NB = (hq // th) * nbx
        nbuf = _pick_nbuf(geom, th * twp, B, value.dtype.itemsize, True)
        kernel = functools.partial(
            _bwd_kernel, geom=geom, nbx=nbx, D=D, G=G, lim=lim,
            th=th, twp=twp, wq_real=wq, hq=hq, wq=wq,
            spatial_shapes=spatial_shapes, nbuf=nbuf)
        goff_b, glog_b, *gvmaps = pl.pallas_call(
            kernel,
            grid=(NB, B),
            in_specs=[_nat_spec(th, twp, 256, nbx),
                      _nat_spec(th, twp, 128, nbx),
                      _nat_spec(th, twp, Hh * D, nbx)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * Lg),
            out_specs=[_nat_spec(th, twp, 256, nbx),
                       _nat_spec(th, twp, 128, nbx)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * Lg,
            out_shape=[jax.ShapeDtypeStruct((B, hq, wqp, 256), off.dtype),
                       jax.ShapeDtypeStruct((B, hq, wqp, 128), logits.dtype)]
            + [jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in vmaps],
            input_output_aliases={3 + Lg + lv: 2 + lv for lv in range(Lg)},
            scratch_shapes=[
                pltpu.VMEM((nbuf, g["SH"], g["SWp"], Hh * D), value.dtype)
                for g in geom
            ] + [
                pltpu.VMEM((nbuf, g["SH"], g["SWp"], Hh * D), jnp.float32)
                for g in geom
            ] + [pltpu.VMEM((128, th * twp), jnp.float32)] * 3
            + [pltpu.SemaphoreType.DMA((nbuf, Lg))] * 3,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=_interpret(),
        )(off_v[lq], log_v[lq], gout_v[lq], *vmaps, *gvmaps)
        goffs.append(goff_b[:, :, :wq, :].reshape(B, hq * wq, 256))
        glogits.append(glog_b[:, :, :wq, :].reshape(B, hq * wq, 128))

    gv_rows = []
    for lv, (hv, wv) in enumerate(spatial_shapes):
        core = gvmaps[lv][:, PAD:PAD + hv, PAD:PAD + wv, :]
        gv_rows.append(core.reshape(B, hv * wv, Hh, D))
    gvalue = jnp.concatenate(gv_rows, axis=1).astype(value.dtype)
    return (gvalue, jnp.concatenate(goffs, axis=1),
            jnp.concatenate(glogits, axis=1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def _msda_fused(value, spatial_shapes, off, logits, window):
    return _fwd_impl(value, spatial_shapes, off, logits, window)


def _fwd_rule(value, spatial_shapes, off, logits, window):
    out = _fwd_impl(value, spatial_shapes, off, logits, window)
    return out, (value, off, logits)


def _bwd_rule(spatial_shapes, window, res, gout):
    value, off, logits = res
    return _bwd_impl(value, spatial_shapes, off, logits, window, gout)


_msda_fused.defvjp(_fwd_rule, _bwd_rule)


def ms_deform_attn_enc_fused(value, spatial_shapes, off, logits,
                             window: int = 8):
    """Fused-prologue windowed MSDA for grid queries.

    value:  [B, S, H, D] projected value tokens (bf16 on the fast path)
    off:    [B, S, 256] raw sampling-offset projection output, feature
            order [x(h,lv,p) | y(h,lv,p)] (use offset_feature_perm() on the
            reference feature order), units = sampled-level pixels
    logits: [B, S, 128] raw attention logits, reference feature order
            (h, lv*P+p)
    Returns [B, S, H*D] in value.dtype.  Gradients flow to all three.

    Semantics == the `pallas` impl: softmax per head over (lv, p), sampling
    at center + clip(offset, +-(G/2-1-eps)) in every sampled level.
    """
    B, S, Hh, D = value.shape
    assert (Hh, off.shape[-1], logits.shape[-1]) == (H, 256, 128), (
        "fused MSDA hardcodes H=8, L=4, P=4 lane packing")
    assert S == sum(h * w for h, w in spatial_shapes)
    return _msda_fused(value, tuple(spatial_shapes), off, logits, window)
