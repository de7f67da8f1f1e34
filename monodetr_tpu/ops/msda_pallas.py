"""Pallas TPU kernel for windowed multi-scale deformable attention.

This is the production encoder-MSDA path.  Same math as
`msda_windowed.ms_deform_attn_windowed` (== the exact gather formulation
`msda.ms_deform_attn` whenever sampling offsets stay within the G-window),
restructured for the TPU memory system:

  * per query tile, ONE async DMA per sampled level brings the covering
    strip of the (pre-padded) value map into VMEM — no gathers, no scatter;
  * the banded bilinear+attention weight matrix W2[T_q, strip_px] is built
    in-register from int-iota coordinate vectors and hat functions
    relu(1 - |f - j|); the strip grid is a product (iy, ix), so the hats are
    evaluated separably on [SH, T] / [SWp, T] and expanded by one 3-D
    broadcast multiply — ~5x less VPU work than dense [SP, T] evaluation;
  * the sample-and-accumulate collapses into ONE MXU matmul per
    (head, level): out_h += W2_h @ strip_h.

The CUDA reference implements the same op as ~21M random-access bilinear
fetches per layer (ms_deform_im2col_cuda.cuh:238-300); on TPU that compute
shape is gather-issue-bound (~10 ns/row measured on v5e ⇒ ~0.4 s/layer).
This kernel replaces it with dense VPU hat algebra + MXU matmuls — the
structure XLA cannot derive on its own (a pure-XLA shift formulation
materializes the padded shift stack per window slot and OOMs in backward).

Layout contract (chosen so every Mosaic op is tile-aligned):
  * fx, fy, att are pre-blocked to [B, NB, T, 128] with lane index
    lv*32 + h*4 + p (L=4, H=8, P=4 ⇒ exactly 128 lanes);
  * value maps: per level [B, hv + 2*PAD, wv + 2*PAD, H*D], zero-padded so
    off-image bilinear corners read zeros (grid_sample 'zeros' semantics,
    ms_deform_attn_func.py:55);
  * strips are DMA'd as [SH, SWp, H*D] with SWp a multiple of 8 and
    flattened to [SH*SWp, H*D] (a trivial sublane merge).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import level_start_indices

PAD = 16  # HBM halo: window/2 + strip rounding + 8-alignment of x starts
# (must be a multiple of 8 so DMA-start residues are PAD-invariant;
# 16 is the minimum that satisfies the exact _check_pad bounds for
# G<=8 at power-of-two level ratios — 24 inflated the f32 grad-map
# zero-init/copy traffic ~23% for level-0)


def _interpret():
    """Run the kernels in interpreter mode off-TPU (the CPU test suite)."""
    return jax.devices()[0].platform == "cpu"


# --------------------------------------------------------------------------
# static geometry
# --------------------------------------------------------------------------

def _tile_for_level(hq, wq):
    """Default query tile (th, tw) per level (the conservative floor; the
    geometry search in _geometry prefers larger candidates from
    _tile_candidates when they fit the VMEM budget)."""
    th = max(2, min(8, hq // 3))
    tw = max(4, min(16, wq // 5))
    while hq % th:
        th -= 1
    while wq % tw:
        tw -= 1
    return th, tw


def _tile_candidates(hq, wq):
    """Candidate query tiles (unscored; _geometry ranks them by the
    measured cost model: per-grid-step fixed overhead + VPU/MXU work
    proportional to sum(strip px) * lane-padded T)."""
    cands = []
    for th in range(1, min(hq, 16) + 1):
        if hq % th:
            continue
        for tw in range(1, min(wq, 32) + 1):
            if wq % tw:
                continue
            if th * tw > 512:
                continue
            cands.append((th, tw))
    return cands


def _anchor0_fn(n_tile, nq, nv):
    """Tile index -> floor(center-sample position) of the tile's first query
    row, in sampled-level coords.  Works on python ints and traced int32."""
    if nv == nq:
        return lambda i: i * n_tile
    if nv < nq:  # coarser
        c = nq // nv
        fh = math.floor(0.5 - 0.5 * c)
        return lambda i: (i * n_tile + fh) // c
    m = nv // nq  # finer
    return lambda i: i * n_tile * m + m // 2 - 1


def _strip_extent(n_tile, nq, nv, G):
    """Max strip rows a tile's windows can touch along one axis (static)."""
    span = -(-((n_tile - 1) * nv) // nq)  # ceil((n_tile-1) * nv/nq)
    return span + G + 2


VMEM_BUDGET = 13 * 1024 * 1024  # conservative per-tile scratch target


# Per-grid-step cost model, calibrated on-chip (round 5): ~6 us fixed
# (pipeline/DMA/launch) + ~45 ps per [strip px, lane-padded T] element of
# the per-(head, point) hat passes (avg of measured fwd 24.5 ps and bwd
# 61 ps at the shipped shapes).  Tiles are ranked by
#   NB * (FIXED + BETA * sum(SP) * Tpad)
# — per-QUERY VPU/MXU work is sum(SP) (every query in a tile pays the whole
# strip), so smaller tiles do LESS compute but more fixed-cost steps.
# FIXED recalibrated after the round-5 strip-DMA pipelining: prefetch
# hides most of the per-step DMA wait, leaving ~3.5 us of launch/pipeline
# cost — which shifts the optimum toward smaller tiles (less per-query
# strip work at more steps); lq0/G6 flips (16,16) -> (8,16), -27% sum(SP).
_STEP_FIXED_US = 3.5
_STEP_BETA_US = 4.5e-5


def _geometry(spatial_shapes, lq, G):
    hq, wq = spatial_shapes[lq]

    def build(th, tw):
        geom = []
        for hv, wv in spatial_shapes:
            SH = _strip_extent(th, hq, hv, G)
            SW = _strip_extent(tw, wq, wv, G)
            # x starts are quantized down to a multiple of 8 (DMA slice
            # alignment on the sublane dim), which shifts the start left by
            # the start's residue mod 8.  Anchors are affine in the tile
            # index, so the residue SET per (query level, sampled level)
            # pair is static — size the strip for the worst residue that
            # actually occurs instead of the generic +7 (saves a whole
            # 8-column block on most cross-level strips).
            ax0 = _anchor0_fn(tw, wq, wv)
            rho = max((ax0(bx) + PAD - G // 2) % 8
                      for bx in range(max(1, wq // tw)))
            geom.append({
                "SH": SH,
                "SWp": -(-(SW + rho) // 8) * 8,
                "ay0": _anchor0_fn(th, hq, hv),
                "ax0": ax0,
            })
        return geom

    def vmem_est(geom, T):
        """Worst-case per-tile scratch: value+grad strips (f32) for every
        level plus two [SP, T] f32 weight/product buffers for the largest
        strip (w3/W2 and M3 in the backward kernel)."""
        sp = [g["SH"] * g["SWp"] for g in geom]
        return sum(sp) * 256 * (4 + 4) + 2 * max(sp) * T * 4

    # Rank all dividing tiles by the step-cost model and take the cheapest
    # whose strip scratch fits the VMEM budget (larger query levels at
    # larger pyramids pull proportionally larger cross-level strips; the
    # 2x-resolution stress config needs the budget gate).
    scored = []
    for th, tw in _tile_candidates(hq, wq):
        geom = build(th, tw)
        T = th * tw
        tpad = max(128, -(-T // 128) * 128)
        nb = (hq // th) * (wq // tw)
        sp_sum = sum(g["SH"] * g["SWp"] for g in geom)
        cost = nb * (_STEP_FIXED_US + _STEP_BETA_US * sp_sum * tpad)
        scored.append((cost, T, th, tw, geom))
    scored.sort(key=lambda c: (c[0], -c[1]))
    for _, T, th, tw, geom in scored:
        if vmem_est(geom, T) <= VMEM_BUDGET:
            return (th, tw), geom
    # fallback: the conservative floor, budget-shrunk the old way
    th, tw = _tile_for_level(hq, wq)
    geom = build(th, tw)
    while vmem_est(geom, th * tw) > VMEM_BUDGET and (th > 2 or tw > 4):
        if tw > 4:
            tw = max(4, tw // 2)
            while wq % tw:
                tw -= 1
        else:
            th = max(2, th // 2)
            while hq % th:
                th -= 1
        geom = build(th, tw)
    return (th, tw), geom


def _check_pad(spatial_shapes, G):
    """Every strip must stay inside the PAD halo (static check, exact:
    y starts are used unquantized; x starts are floored to multiples of 8
    and the strip extent covers the worst actual residue)."""
    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, tw), geom = _geometry(spatial_shapes, lq, G)
        for lv, (hv, wv) in enumerate(spatial_shapes):
            g = geom[lv]
            ys = [g["ay0"](by) + PAD - G // 2 for by in range(hq // th)]
            assert 0 <= min(ys) and max(ys) + g["SH"] <= hv + 2 * PAD, (
                "y", lq, lv, min(ys), max(ys) + g["SH"], hv)
            xs = [((g["ax0"](bx) + PAD - G // 2) // 8) * 8
                  for bx in range(wq // tw)]
            assert 0 <= min(xs) and max(xs) + g["SWp"] <= wv + 2 * PAD, (
                "x", lq, lv, min(xs), max(xs) + g["SWp"], wv)


def _center_positions(spatial_shapes):
    """Static center-sample positions f_center [S, L, 2] (x, y) in each
    sampled level's pixel coords (the encoder grid-query geometry)."""
    per_level = []
    sizes = [(w, h) for h, w in spatial_shapes]
    for hq, wq in spatial_shapes:
        ys, xs = np.meshgrid(np.arange(hq) + 0.5, np.arange(wq) + 0.5,
                             indexing="ij")
        ref = np.stack([xs / wq, ys / hq], -1).reshape(-1, 2)
        cs = np.stack([ref * np.array([wv, hv], np.float32) - 0.5
                       for wv, hv in sizes], 1)
        per_level.append(cs)
    return jnp.asarray(np.concatenate(per_level, 0).astype(np.float32))


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(fx_ref, fy_ref, att_ref, *refs, geom, nbx, H, D, G):
    """One query tile: L strip DMAs, then per (level, head) W2 build + dot."""
    L = len(geom)
    v_refs = refs[:L]
    out_ref = refs[L]
    strip_refs = refs[L + 1:2 * L + 1]
    sems = refs[2 * L + 1]

    b = pl.program_id(0)
    i = pl.program_id(1)
    by = i // nbx
    bx = i - by * nbx

    dmas = []
    for lv, g in enumerate(geom):
        sy = g["ay0"](by) + PAD - G // 2
        sx = g["ax0"](bx) + PAD - G // 2
        sx = (sx // 8) * 8  # sublane-dim DMA slices must be 8-aligned
        dma = pltpu.make_async_copy(
            v_refs[lv].at[b, pl.ds(sy, g["SH"]), pl.ds(sx, g["SWp"]), :],
            strip_refs[lv],
            sems.at[lv],
        )
        dma.start()
        dmas.append(dma)

    # f/att arrive TRANSPOSED [128, T]: per-sample rows are sublane slices
    # (free address arithmetic) instead of single-lane extracts, and T = 128
    # queries fill exactly one vreg of lanes for all the hat algebra.
    fx = fx_ref[0, 0]    # [128, T]
    fy = fy_ref[0, 0]
    att = att_ref[0, 0]
    T = fx.shape[1]

    outs = [jnp.zeros((T, D), jnp.float32) for _ in range(H)]
    for lv, g in enumerate(geom):
        dmas[lv].wait()
        SH, SWp = g["SH"], g["SWp"]
        SP = SH * SWp
        strip = strip_refs[lv][:].reshape(SP, H * D)
        mxu_dtype = (jnp.bfloat16 if strip.dtype == jnp.bfloat16
                     else jnp.float32)

        sy = g["ay0"](by) - G // 2
        sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8 - PAD
        # separable hat build: the strip grid is a product (iy, ix), so the
        # bilinear weights factor into per-axis hats evaluated on [SH, T]
        # and [SWp, T] and expanded by a 3-D broadcast multiply — ~5x less
        # VPU work than evaluating both hats densely on [SP, T]
        jy_s = (jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0)
                + sy).astype(jnp.float32)
        jx_s = (jax.lax.broadcasted_iota(jnp.int32, (SWp, 1), 0)
                + sx).astype(jnp.float32)

        for h in range(H):
            w3 = jnp.zeros((SH, SWp, T), jnp.float32)
            for p in range(4):
                lane = lv * 32 + h * 4 + p
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[lane:lane + 1] - jy_s))
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[lane:lane + 1] - jx_s))
                hy = att[lane:lane + 1] * hy
                w3 = w3 + hy[:, None, :] * hx[None, :, :]
            # out_h[i, d] = sum_j w2t[j, i] * strip[j, d]
            # (bf16 MXU operands when the values are bf16; f32 accumulate)
            outs[h] = outs[h] + jax.lax.dot_general(
                w3.reshape(SP, T).astype(mxu_dtype),
                strip[:, h * D:(h + 1) * D].astype(mxu_dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    out_ref[0, 0] = jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(fx_ref, fy_ref, att_ref, gout_ref, *refs,
                geom, nbx, H, D, G):
    """Per query tile: recompute W2 (flash-style) and emit

      M_h         = gout_h @ strip_hᵀ           (MXU, [T, SP])
      gatt        = Σ_j  hy·hx·M                (VPU lane reduce)
      gf{x,y}     = att · Σ_j hy·hx'·M          (VPU)
      grad strip  = W2ᵀ @ gout_h                (MXU, [SP, D])

    Strip gradients are accumulated straight into the (aliased, f32) grad
    maps with read-modify-write DMAs — safe because the TPU grid executes
    sequentially on the core, so overlapping halo regions of consecutive
    tiles never race.
    """
    L = len(geom)
    v_refs = refs[:L]
    # refs[L:2L] are the aliased grad-map INPUT refs — same memory as the
    # output refs below; only the outputs are used.
    gfx_ref, gfy_ref, gatt_ref = refs[2 * L:2 * L + 3]
    gv_refs = refs[2 * L + 3:3 * L + 3]      # aliased output grad maps (f32)
    strip_refs = refs[3 * L + 3:4 * L + 3]
    gstrip_refs = refs[4 * L + 3:5 * L + 3]
    sems = refs[5 * L + 3]
    gsems = refs[5 * L + 4]

    b = pl.program_id(0)
    i = pl.program_id(1)
    by = i // nbx
    bx = i - by * nbx

    def region(g, ref):
        sy = g["ay0"](by) + PAD - G // 2
        sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8
        return ref.at[b, pl.ds(sy, g["SH"]), pl.ds(sx, g["SWp"]), :]

    v_dmas, gin_dmas = [], []
    for lv, g in enumerate(geom):
        dma = pltpu.make_async_copy(region(g, v_refs[lv]), strip_refs[lv],
                                    sems.at[lv])
        dma.start()
        v_dmas.append(dma)
        gdma = pltpu.make_async_copy(region(g, gv_refs[lv]), gstrip_refs[lv],
                                     gsems.at[lv])
        gdma.start()
        gin_dmas.append(gdma)

    fx = fx_ref[0, 0]    # [128, T] (transposed lane packing, see fwd kernel)
    fy = fy_ref[0, 0]
    att = att_ref[0, 0]
    gout = gout_ref[0, 0].astype(jnp.float32)  # [T, H*D]
    T = fx.shape[1]

    gout_dmas = []
    for lv, g in enumerate(geom):
        v_dmas[lv].wait()
        gin_dmas[lv].wait()
        SH, SWp = g["SH"], g["SWp"]
        SP = SH * SWp
        strip = strip_refs[lv][:].reshape(SP, H * D)
        mxu_dtype = (jnp.bfloat16 if strip.dtype == jnp.bfloat16
                     else jnp.float32)

        sy = g["ay0"](by) - G // 2
        sx = ((g["ax0"](bx) + PAD - G // 2) // 8) * 8 - PAD
        # separable hats (see forward kernel): per-axis hats on [SH, T] and
        # [SWp, T]; reductions over the strip factor through the x axis
        # first (sum_j hy*hx*M = sum_iy hy * (sum_ix hx * M3)), cutting the
        # [SP, T]-sized VPU work ~2x
        jy_s = (jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0)
                + sy).astype(jnp.float32)
        jx_s = (jax.lax.broadcasted_iota(jnp.int32, (SWp, 1), 0)
                + sx).astype(jnp.float32)

        for h in range(H):
            gout_h = gout[:, h * D:(h + 1) * D]
            # m[j, i] = <strip[j], gout[i]>
            m = jax.lax.dot_general(
                strip[:, h * D:(h + 1) * D].astype(mxu_dtype),
                gout_h.astype(mxu_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [SP, T]
            M3 = m.reshape(SH, SWp, T)
            w3 = jnp.zeros((SH, SWp, T), jnp.float32)
            # per-sample grads go straight to the output refs as sublane rows
            # — holding them for a final concat keeps 128 [SP, T]-sized
            # chains alive and blows the scoped-VMEM budget
            for p in range(4):
                lane = lv * 32 + h * 4 + p
                a = att[lane:lane + 1]               # [1, T]
                dy = fy[lane:lane + 1] - jy_s        # [SH, T]
                dx = fx[lane:lane + 1] - jx_s        # [SWp, T]
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
                dhx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0)
                dhy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
                R1 = jnp.sum(M3 * hx[None, :, :], axis=1)   # [SH, T]
                R2 = jnp.sum(M3 * dhx[None, :, :], axis=1)  # [SH, T]
                w3 = w3 + (a * hy)[:, None, :] * hx[None, :, :]
                gatt_ref[0, 0, lane:lane + 1, :] = jnp.sum(
                    hy * R1, axis=0, keepdims=True)
                gfx_ref[0, 0, lane:lane + 1, :] = a * jnp.sum(
                    hy * R2, axis=0, keepdims=True)
                gfy_ref[0, 0, lane:lane + 1, :] = a * jnp.sum(
                    dhy * R1, axis=0, keepdims=True)
            gs_h = jax.lax.dot_general(
                w3.reshape(SP, T).astype(mxu_dtype),
                gout_h.astype(mxu_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [SP, D]
            gstrip_refs[lv][:, :, h * D:(h + 1) * D] = (
                gstrip_refs[lv][:, :, h * D:(h + 1) * D]
                + gs_h.reshape(SH, SWp, D))
        gdma = pltpu.make_async_copy(gstrip_refs[lv], region(g, gv_refs[lv]),
                                     gsems.at[lv])
        gdma.start()
        gout_dmas.append(gdma)

    for gdma in gout_dmas:
        gdma.wait()


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

def _blockify(x, hq, wq, th, tw):
    """[B, nq, C] (level-major rows) -> [B, NB, th*tw, C]."""
    B, nq, C = x.shape
    x = x.reshape(B, hq // th, th, wq // tw, tw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, (hq // th) * (wq // tw), th * tw, C)


def _unblockify(x, hq, wq, th, tw):
    B = x.shape[0]
    C = x.shape[-1]
    x = x.reshape(B, hq // th, wq // tw, th, tw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, hq * wq, C)


def _check_contract(value, sampling_locations, spatial_shapes):
    """The kernel hardcodes its lane packing and anchor algebra; reject any
    configuration it would silently get wrong."""
    H = value.shape[2]
    L, P = sampling_locations.shape[3], sampling_locations.shape[4]
    assert (H, L, P) == (8, 4, 4), (
        f"pallas MSDA lane packing is hardcoded to lane = lv*32 + h*4 + p "
        f"(H=8, L=4, P=4); got H={H}, L={L}, P={P} — use msda_impl='gather'")
    for ha, wa in spatial_shapes:
        for hb, wb in spatial_shapes:
            for a, b in ((ha, hb), (wa, wb)):
                r = max(a, b) // min(a, b)
                assert min(a, b) * r == max(a, b) and (r & (r - 1)) == 0, (
                    f"pallas MSDA anchor algebra needs power-of-two level "
                    f"ratios per axis; got sizes {a} vs {b}")


def _pad_value(value, spatial_shapes):
    """[B, S, H, D] level-major rows -> per-level PAD-haloed NHWC maps."""
    B, S, H, D = value.shape
    starts = level_start_indices(spatial_shapes)
    vmaps = []
    for lv, (hv, wv) in enumerate(spatial_shapes):
        m = value[:, starts[lv]:starts[lv] + hv * wv].reshape(B, hv, wv, H * D)
        vmaps.append(jnp.pad(m, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0))))
    return vmaps


def _pack(spatial_shapes, sampling_locations, attention_weights, G):
    """Normalized sampling locations -> clamped, lane-packed [B, S, 128]
    pixel coords + weights.

    Plain differentiable jnp ops OUTSIDE the custom-vjp boundary: JAX AD
    provides the chain rule back to (loc, att) — including the windowed
    clamp's gradient masking, which is exactly jnp.clip's VJP — and XLA
    fuses this elementwise chain into the offset/weight projection
    epilogues.  Keeping it inside the custom_vjp forced the inflated
    [B, S, H, L, P(, 2)] f32 arrays (~1.25 GB at bench shapes) to
    materialize in HBM as op inputs AND as saved residuals every layer."""
    B, S = sampling_locations.shape[:2]
    sizes = np.array([[w, h] for h, w in spatial_shapes], np.float32)
    f_raw = (sampling_locations.astype(jnp.float32)
             * sizes[None, None, None, :, None, :] - 0.5)
    centers = _center_positions(spatial_shapes)[None, :, None, :, None, :]
    lim = G / 2 - 1 - 1e-2
    f = jnp.clip(f_raw, centers - lim, centers + lim)

    def lanes(x):  # [B, S, H, L, P] -> [B, S, 128] lane order (lv, h, p)
        return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, S, 128)

    return lanes(f[..., 0]), lanes(f[..., 1]), lanes(
        attention_weights.astype(jnp.float32))


def _lane_spec(T):
    """Lane-packed coords travel transposed: [B, NB, 128, T]."""
    return pl.BlockSpec((1, 1, 128, T), lambda b, i: (b, i, 0, 0))


def _fwd_impl(value, spatial_shapes, fx, fy, att, window):
    B, S, H, D = value.shape
    G = window
    _check_pad(spatial_shapes, G)
    starts = level_start_indices(spatial_shapes)
    L = len(spatial_shapes)
    vmaps = _pad_value(value, spatial_shapes)

    outs = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        (th, tw), geom = _geometry(spatial_shapes, lq, G)
        s0, nq = starts[lq], hq * wq
        nbx = wq // tw
        NB = (hq // th) * nbx
        T = th * tw

        def blk(x):
            b = _blockify(x[:, s0:s0 + nq], hq, wq, th, tw)
            return jnp.transpose(b, (0, 1, 3, 2))  # [B, NB, 128, T]

        kernel = functools.partial(_fwd_kernel, geom=geom, nbx=nbx,
                                   H=H, D=D, G=G)
        out = pl.pallas_call(
            kernel,
            grid=(B, NB),
            in_specs=[_lane_spec(T)] * 3
            + [pl.BlockSpec(memory_space=pl.ANY)] * L,
            out_specs=pl.BlockSpec((1, 1, T, H * D), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NB, T, H * D), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((g["SH"], g["SWp"], H * D), value.dtype)
                for g in geom
            ] + [pltpu.SemaphoreType.DMA((L,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=_interpret(),
        )(blk(fx), blk(fy), blk(att), *vmaps)
        outs.append(_unblockify(out, hq, wq, th, tw))

    return jnp.concatenate(outs, axis=1).astype(value.dtype)


def _bwd_impl(value, spatial_shapes, fx, fy, att, window, gout):
    B, S, H, D = value.shape
    G = window
    starts = level_start_indices(spatial_shapes)
    L = len(spatial_shapes)
    vmaps = _pad_value(value, spatial_shapes)
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

        def blk(x):
            return _blockify(x[:, s0:s0 + nq], hq, wq, th, tw)

        def blkT(x):
            return jnp.transpose(blk(x), (0, 1, 3, 2))  # [B, NB, 128, T]

        kernel = functools.partial(_bwd_kernel, geom=geom, nbx=nbx,
                                   H=H, D=D, G=G)
        gfx_b, gfy_b, gatt_b, *gvmaps = pl.pallas_call(
            kernel,
            grid=(B, NB),
            in_specs=[_lane_spec(T)] * 3
            + [pl.BlockSpec((1, 1, T, H * D), lambda b, i: (b, i, 0, 0))]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * L),
            out_specs=[_lane_spec(T)] * 3
            + [pl.BlockSpec(memory_space=pl.ANY)] * L,
            out_shape=[jax.ShapeDtypeStruct((B, NB, 128, T), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in vmaps],
            input_output_aliases={4 + L + lv: 3 + lv for lv in range(L)},
            scratch_shapes=[
                pltpu.VMEM((g["SH"], g["SWp"], H * D), value.dtype)
                for g in geom
            ] + [
                pltpu.VMEM((g["SH"], g["SWp"], H * D), jnp.float32)
                for g in geom
            ] + [pltpu.SemaphoreType.DMA((L,)), pltpu.SemaphoreType.DMA((L,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=_interpret(),
        )(blkT(fx), blkT(fy), blkT(att), blk(gout), *vmaps, *gvmaps)

        def unblk(x):  # [B, NB, 128, T] -> [B, nq, 128]
            return _unblockify(jnp.transpose(x, (0, 1, 3, 2)), hq, wq, th, tw)

        gfx = gfx.at[:, s0:s0 + nq].set(unblk(gfx_b))
        gfy = gfy.at[:, s0:s0 + nq].set(unblk(gfy_b))
        gatt = gatt.at[:, s0:s0 + nq].set(unblk(gatt_b))

    # grad value: strip the PAD halo and re-flatten level-major
    gv_rows = []
    for lv, (hv, wv) in enumerate(spatial_shapes):
        core = gvmaps[lv][:, PAD:PAD + hv, PAD:PAD + wv, :]
        gv_rows.append(core.reshape(B, hv * wv, H, D))
    gvalue = jnp.concatenate(gv_rows, axis=1).astype(value.dtype)
    return gvalue, gfx, gfy, gatt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def _msda_packed(value, spatial_shapes, fx, fy, att, window):
    """Custom-vjp core over the COMPACT lane-packed operands (fx/fy/att
    [B, S, 128] f32): only these + value are saved as residuals, and the
    backward emits gradients in the same layout."""
    return _fwd_impl(value, spatial_shapes, fx, fy, att, window)


def _fwd_rule(value, spatial_shapes, fx, fy, att, window):
    out = _fwd_impl(value, spatial_shapes, fx, fy, att, window)
    return out, (value, fx, fy, att)


def _bwd_rule(spatial_shapes, window, res, gout):
    value, fx, fy, att = res
    return _bwd_impl(value, spatial_shapes, fx, fy, att, window, gout)


_msda_packed.defvjp(_fwd_rule, _bwd_rule)


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, window: int = 8):
    """Windowed MSDA for grid queries (Q == S): Pallas TPU implementation.

    Semantics match ms_deform_attn_windowed(value, ..., window): sampling
    positions are clamped to +-(G/2-1) pixels around each query's static
    center position in every sampled level.  Differentiable via a custom
    Pallas backward (W2 recompute + RMW strip-gradient accumulation); the
    clamp/pack prologue stays outside the custom-vjp so AD chains through
    it and XLA fuses it with the projection epilogues (see _pack).
    """
    _check_contract(value, sampling_locations, spatial_shapes)
    fx, fy, att = _pack(spatial_shapes, sampling_locations,
                        attention_weights, window)
    return _msda_packed(value, tuple(spatial_shapes), fx, fy, att, window)


def center_lane_tables(spatial_shapes):
    """Static per-lane center tables CX, CY [S, 128] (f32): the query's
    center-sample position in each sampled level's pixel coords, broadcast
    over the (head, point) lanes (lane = lv*32 + h*4 + p)."""
    centers = _center_positions(spatial_shapes)  # [S, L, 2]
    cx = jnp.repeat(centers[:, :, 0], 32, axis=1)
    cy = jnp.repeat(centers[:, :, 1], 32, axis=1)
    return cx, cy


def offset_lane_perm(n_heads=8, n_levels=4, n_points=4):
    """Static permutation taking the sampling_offsets projection's flat
    output (feature order (h, lv, p, xy), ms_deform_attn.py:107-114) to
    [x-lanes | y-lanes] in kernel lane order (lv, h, p)."""
    idx = np.arange(n_heads * n_levels * n_points * 2).reshape(
        n_heads, n_levels, n_points, 2)
    lanes = np.transpose(idx, (1, 0, 2, 3)).reshape(-1, 2)  # (lv, h, p)
    return np.concatenate([lanes[:, 0], lanes[:, 1]])


def ms_deform_attn_pallas_packed(value, spatial_shapes, fx, fy, att,
                                 window: int = 8):
    """Packed-operand entry: fx/fy/att are [B, S, 128] f32 in kernel lane
    order (lv*32 + h*4 + p), fx/fy in sampled-level pixel coords ALREADY
    clamped to +-(window/2-1) px around the static centers
    (center_lane_tables).  Skips the [B, S, H, L, P, 2] materialization of
    the loc-based entry: for grid queries the offset normalization and the
    level rescale cancel (loc*wh - 0.5 == center + offset_px), so callers
    can build the packed coords straight from the offset projection with
    per-lane affine math.  Gradients flow to value, fx, fy, att."""
    assert fx.shape == fy.shape == att.shape and fx.shape[-1] == 128
    return _msda_packed(value, tuple(spatial_shapes), fx.astype(jnp.float32),
                        fy.astype(jnp.float32), att.astype(jnp.float32),
                        window)
