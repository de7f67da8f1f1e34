"""Fused dense-hat MSDA for decoder-sized query counts (Pallas TPU).

Same exact semantics as ops/msda.py:ms_deform_attn_dense (reference
`ms_deform_attn_core_pytorch`, ops/functions/ms_deform_attn_func.py:41-61 —
bilinear with grid_sample zero padding, align_corners=False), but the
[B,H,Q,S_l] bilinear-weight matrices are built tile-by-tile in VMEM and
contracted with the value tile immediately: W never exists in HBM in either
direction.  The XLA dense path streams ~1 GB of W per layer (bs 16, level
0) forward and again in backward; here HBM traffic collapses to
query-metadata + value + output tiles.

Layout: value is transposed to [B*H, S, D] with each level padded to a
multiple of the S-tile; a scalar-prefetch tile->level map lets the
BlockSpec index maps pull the right level's sampling coordinates for each
tile.  Per-query arrays ride as [B*H, L, P, Qp] so Qp (not the tiny P) is
the lane axis.  Grid (B*H, NT): one grid step builds W_tile [Qp, ts] from
per-axis hat functions (VPU), then out += W_tile @ v_tile (MXU),
accumulating in VMEM scratch until the last tile.

Backward per tile: dW = g v^T and dv = W^T g are two MXU matmuls; datt,
dfx, dfy reduce dW against the (recomputed) hat factors and accumulate in
VMEM scratch across tiles.  No scatter anywhere.
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


_TS = 512  # S-tile rows; level sizes pad up to a multiple of this


def _plan(spatial_shapes):
    sizes = [h * w for h, w in spatial_shapes]
    padded = [((s + _TS - 1) // _TS) * _TS for s in sizes]
    lv_of_tile = []
    for lv, ps in enumerate(padded):
        lv_of_tile += [lv] * (ps // _TS)
    return sizes, padded, np.asarray(lv_of_tile, np.int32)


def _coords(spatial_shapes, padded):
    """ys, xs [NT, _TS] f32 pixel coordinates per tile row (pad rows get
    -1e6 so every hat evaluates to 0)."""
    ys_all, xs_all = [], []
    for (h, w), ps in zip(spatial_shapes, padded):
        s = np.arange(ps, dtype=np.int64)
        valid = s < h * w
        ys = np.where(valid, s // w, 0).astype(np.float32)
        xs = np.where(valid, s % w, 0).astype(np.float32)
        ys[~valid] = -1e6
        xs[~valid] = -1e6
        ys_all.append(ys)
        xs_all.append(xs)
    # [NT, 1, _TS]: the singleton sublane axis makes the per-tile block
    # shape (1, 1, _TS) legal on Mosaic (last two block dims must equal the
    # array dims or be 8/128-multiples; (1, _TS) over [NT, _TS] is not)
    ys = np.concatenate(ys_all).reshape(-1, 1, _TS)
    xs = np.concatenate(xs_all).reshape(-1, 1, _TS)
    return ys, xs


def _hat_pair(fx, fy, att, ys, xs, p):
    """One point's (hy, hx, a): hy/hx [Qp, ts], a [Qp, 1].

    Evaluated per-p at each use site (NOT collected into a list): keeping
    all P pairs alive at once put 8 [Qp, ts] f32 arrays on the Mosaic
    stack simultaneously and blew the scoped-VMEM limit at decoder shapes
    (28.6 MB > 16 MB, observed on-chip)."""
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[p][:, None] - ys[None, :]))
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[p][:, None] - xs[None, :]))
    return hy, hx, att[p][:, None]


def _fwd_kernel(lv_ref, fx_ref, fy_ref, att_ref, ys_ref, xs_ref, v_ref,
                o_ref, acc, *, P, NT):
    it = pl.program_id(1)
    fx = fx_ref[0, 0]          # [P, Qp] f32
    fy = fy_ref[0, 0]
    att = att_ref[0, 0]
    ys = ys_ref[0, 0]          # [ts]
    xs = xs_ref[0, 0]
    v = v_ref[0]               # [ts, D]

    w = None
    for p in range(P):
        hy, hx, a = _hat_pair(fx, fy, att, ys, xs, p)
        term = a * hy * hx
        w = term if w is None else w + term

    @pl.when(it == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(it == NT - 1)
    def _():
        o_ref[0] = acc[...]


def _bwd_kernel(lv_ref, fx_ref, fy_ref, att_ref, ys_ref, xs_ref, v_ref,
                g_ref, dv_ref, dfx_ref, dfy_ref, datt_ref,
                dfx_acc, dfy_acc, datt_acc, *, P, L, NT):
    it = pl.program_id(1)
    lv = lv_ref[it]
    fx = fx_ref[0, 0]
    fy = fy_ref[0, 0]
    att = att_ref[0, 0]
    ys = ys_ref[0, 0]
    xs = xs_ref[0, 0]
    v = v_ref[0].astype(jnp.float32)     # [ts, D]
    g = g_ref[0]                         # [Qp, D] f32

    w = None
    for p in range(P):
        hy, hx, a = _hat_pair(fx, fy, att, ys, xs, p)
        term = a * hy * hx
        w = term if w is None else w + term

    # dv = W^T g  [ts, D]
    dv_ref[0] = jax.lax.dot_general(
        w, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dW = g v^T  [Qp, ts]
    dw = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(it == 0)
    def _():
        dfx_acc[...] = jnp.zeros_like(dfx_acc)
        dfy_acc[...] = jnp.zeros_like(dfy_acc)
        datt_acc[...] = jnp.zeros_like(datt_acc)

    for p in range(P):
        hy, hx, a = _hat_pair(fx, fy, att, ys, xs, p)
        dy = fy[p][:, None] - ys[None, :]
        dx = fx[p][:, None] - xs[None, :]
        # d hat(d)/dd = -sign(d) on |d| < 1 (0 outside; boundary measure-0)
        ghy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
        ghx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0)
        # factor through t = dw·hx / u = dw·hy so each grad is one extra
        # multiply-reduce (live f32 [Qp, ts] peak: dw, hy, hx, ghy/ghx, t/u)
        t = dw * hx
        da = jnp.sum(t * hy, axis=1)                        # [Qp]
        dfyv = a[:, 0] * jnp.sum(t * ghy, axis=1)
        dfxv = a[:, 0] * jnp.sum((dw * hy) * ghx, axis=1)
        # tile belongs to one level: predicated accumulate (lv is a
        # dynamic scalar; Mosaic dislikes dynamic writes, so unroll L)
        for l in range(L):
            @pl.when(lv == l)
            def _(l=l, p=p, da=da, dfyv=dfyv, dfxv=dfxv):
                datt_acc[l, p, :] += da
                dfy_acc[l, p, :] += dfyv
                dfx_acc[l, p, :] += dfxv

    @pl.when(it == NT - 1)
    def _():
        dfx_ref[0] = dfx_acc[...]
        dfy_ref[0] = dfy_acc[...]
        datt_ref[0] = datt_acc[...]


def _layouts(value, spatial_shapes, sampling_locations, attention_weights):
    """Common input re-layouts for both directions."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts = level_start_indices(spatial_shapes)
    sizes, padded, lv_of_tile = _plan(spatial_shapes)
    NT = len(lv_of_tile)
    Qp = ((Q + 127) // 128) * 128

    # value [B,S,H,D] -> [B*H, S_pad, D], levels padded to _TS multiples
    v_t = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * H, S, D)
    chunks = []
    for lv in range(L):
        c = v_t[:, starts[lv]:starts[lv] + sizes[lv]]
        pad = padded[lv] - sizes[lv]
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad), (0, 0)))
        chunks.append(c)
    v_pad = jnp.concatenate(chunks, axis=1)

    # sampling coords -> per-level pixel space  [B*H, L, P, Qp]
    loc = jnp.transpose(sampling_locations, (0, 2, 3, 4, 1, 5)).astype(
        jnp.float32)  # [B, H, L, P, Q, 2]
    wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    f = loc * wh[None, None, :, None, None, :] - 0.5
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    fx = f[..., 0].reshape(B * H, L, P, Qp)
    fy = f[..., 1].reshape(B * H, L, P, Qp)
    att = jnp.pad(
        jnp.transpose(attention_weights, (0, 2, 3, 4, 1)),
        ((0, 0), (0, 0), (0, 0), (0, 0), (0, Qp - Q)),
    ).astype(jnp.float32).reshape(B * H, L, P, Qp)

    ys, xs = _coords(spatial_shapes, padded)
    return (v_pad, fx, fy, att, jnp.asarray(ys), jnp.asarray(xs),
            jnp.asarray(lv_of_tile), NT, Qp, padded, sizes)


def _common_specs(L, P, Qp, D):
    qspec = pl.BlockSpec((1, 1, P, Qp), lambda bh, it, s: (bh, s[it], 0, 0))
    cspec = pl.BlockSpec((1, 1, _TS), lambda bh, it, s: (it, 0, 0))
    vspec = pl.BlockSpec((1, _TS, D), lambda bh, it, s: (bh, it, 0))
    return qspec, cspec, vspec


def _fwd_impl(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    (v_pad, fx, fy, att, ys, xs, lv_of_tile, NT, Qp, _padded,
     _sizes) = _layouts(value, spatial_shapes, sampling_locations,
                        attention_weights)
    qspec, cspec, vspec = _common_specs(L, P, Qp, D)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, P=P, NT=NT),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, NT),
            in_specs=[qspec, qspec, qspec, cspec, cspec, vspec],
            out_specs=pl.BlockSpec((1, Qp, D), lambda bh, it, s: (bh, 0, 0)),
            scratch_shapes=[pltpu.VMEM((Qp, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Qp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret(),
    )(lv_of_tile, fx, fy, att, ys, xs, v_pad)

    out = out.reshape(B, H, Qp, D)[:, :, :Q]
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D).astype(
        value.dtype)


def _bwd_impl(value, spatial_shapes, sampling_locations, attention_weights,
              gout):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    (v_pad, fx, fy, att, ys, xs, lv_of_tile, NT, Qp, padded,
     sizes) = _layouts(value, spatial_shapes, sampling_locations,
                       attention_weights)
    qspec, cspec, vspec = _common_specs(L, P, Qp, D)

    g = gout.reshape(B, Q, H, D)
    g = jnp.transpose(g, (0, 2, 1, 3)).reshape(B * H, Q, D)
    g = jnp.pad(g, ((0, 0), (0, Qp - Q), (0, 0))).astype(jnp.float32)

    lspec = pl.BlockSpec((1, L, P, Qp), lambda bh, it, s: (bh, 0, 0, 0))
    dv, dfx, dfy, datt = pl.pallas_call(
        functools.partial(_bwd_kernel, P=P, L=L, NT=NT),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, NT),
            in_specs=[qspec, qspec, qspec, cspec, cspec, vspec,
                      pl.BlockSpec((1, Qp, D), lambda bh, it, s: (bh, 0, 0))],
            out_specs=[vspec, lspec, lspec, lspec],
            scratch_shapes=[pltpu.VMEM((L, P, Qp), jnp.float32)] * 3,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(v_pad.shape, jnp.float32),
            jax.ShapeDtypeStruct((B * H, L, P, Qp), jnp.float32),
            jax.ShapeDtypeStruct((B * H, L, P, Qp), jnp.float32),
            jax.ShapeDtypeStruct((B * H, L, P, Qp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret(),
    )(lv_of_tile, fx, fy, att, ys, xs, v_pad, g)

    # dv [B*H, S_pad, D] -> [B, S, H, D]
    off = 0
    rows = []
    for lv in range(L):
        rows.append(dv[:, off:off + sizes[lv]])
        off += padded[lv]
    dv = jnp.concatenate(rows, axis=1).reshape(B, H, S, D)
    dvalue = jnp.transpose(dv, (0, 2, 1, 3)).astype(value.dtype)

    def unpack(x):  # [B*H, L, P, Qp] -> [B, Q, H, L, P]
        x = x.reshape(B, H, L, P, Qp)[..., :Q]
        return jnp.transpose(x, (0, 4, 1, 2, 3))

    # chain f = loc * size - 0.5
    wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    gloc = jnp.stack([unpack(dfx), unpack(dfy)], axis=-1)
    gloc = (gloc * wh[None, None, None, :, None, :]).astype(
        sampling_locations.dtype)
    gattn = unpack(datt).astype(attention_weights.dtype)
    return dvalue, gloc, gattn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_dense_fused(value, spatial_shapes, sampling_locations,
                               attention_weights):
    """Exact MSDA (reference semantics), fused dense-hat Pallas kernel.

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


ms_deform_attn_dense_fused.defvjp(_fwd_rule, _bwd_rule)
