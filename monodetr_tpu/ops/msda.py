"""Multi-scale deformable attention (MSDA) for TPU.

The reference implements this op as a CUDA extension
(`lib/models/monodetr/ops/src/ms_deform_im2col_cuda.cuh`): for every query,
head, level and point it bilinearly samples the value map and accumulates with
softmax attention weights; the backward scatter-adds into grad_value.

On TPU the natural formulation is *one fused gather*: we precompute the four
bilinear corner indices and weights for every (query, head, level, point) and
issue a single `take_along_axis` over the flattened multi-level value tensor,
followed by an elementwise multiply-reduce.  XLA compiles this to a native TPU
gather along the sublane dimension fused with the weighting; autodiff of the
gather produces exactly the scatter-add the CUDA backward hand-writes
(ms_deform_im2col_cuda.cuh:845-922).  A Pallas kernel for the hottest
configuration lives in `msda_pallas.py` and is validated against this
implementation.

Numerical contract (matches `ms_deform_attn_core_pytorch`,
ops/functions/ms_deform_attn_func.py:41-61):
  - sampling grid = 2 * loc - 1, grid_sample align_corners=False, zero padding
    => pixel coords fx = loc_x * W - 0.5, fy = loc_y * H - 0.5.
  - out-of-bounds corners contribute zero.

Shapes (all static under jit):
  value:       [B, S, H, D]   S = sum_l h_l * w_l
  spatial_shapes: static tuple ((h0, w0), ...) — *python* ints, not traced
  sampling_locations: [B, Q, H, L, P, 2] in [0, 1] (x, y)
  attention_weights:  [B, Q, H, L, P] (softmaxed over L*P by the caller)
  returns:     [B, Q, H * D]
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _corner_indices_and_weights(sampling_locations, spatial_shapes, level_starts):
    """Compute flattened gather indices and bilinear weights.

    Returns (idx [B, Q, H, L, P, 4] int32 into [0, S), w [B, Q, H, L, P, 4]).
    Out-of-bounds corners get weight 0 and a clamped (valid) index.
    """
    shapes = np.asarray(spatial_shapes, dtype=np.int32)  # [L, 2] (h, w)
    hs = shapes[:, 0][None, None, None, :, None]
    ws = shapes[:, 1][None, None, None, :, None]
    starts = np.asarray(level_starts, dtype=np.int32)[None, None, None, :, None]

    x = sampling_locations[..., 0]
    y = sampling_locations[..., 1]
    fx = x * ws - 0.5
    fy = y * hs - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    lx = fx - x0
    ly = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < ws) & (yi >= 0) & (yi < hs)
        xi_c = jnp.clip(xi, 0, ws - 1)
        yi_c = jnp.clip(yi, 0, hs - 1)
        idx = starts + yi_c * ws + xi_c
        return idx, jnp.where(valid, w, 0.0)

    i00, w00 = corner(x0i, y0i, (1 - lx) * (1 - ly))
    i01, w01 = corner(x0i + 1, y0i, lx * (1 - ly))
    i10, w10 = corner(x0i, y0i + 1, (1 - lx) * ly)
    i11, w11 = corner(x0i + 1, y0i + 1, lx * ly)

    idx = jnp.stack([i00, i01, i10, i11], axis=-1)
    w = jnp.stack([w00, w01, w10, w11], axis=-1)
    return idx, w


def level_start_indices(spatial_shapes):
    sizes = [h * w for h, w in spatial_shapes]
    return tuple(np.cumsum([0] + sizes[:-1]).tolist())


def _patch_base_and_weights(sampling_locations, spatial_shapes, level_starts):
    """Base (top-left, clamped) patch indices and 4 patch-slot weights.

    TPU gathers pay per ROW, not per byte (measured ~13 ns/row regardless of
    32 vs 512 channels), so instead of 4 corner rows per sample we gather ONE
    row of a precomputed 2x2-pixel patch map and carry 4 slot weights.  The
    base index is clamped to [0, w-2] x [0, h-2]; corner weights are remapped
    onto the patch slots (a corner outside the image keeps weight 0, a
    clamped edge corner lands on slot 1).

    Returns (idx [B, Q, H, L, P] int32 into [0, S), w [B, Q, H, L, P, 4]).
    """
    shapes = np.asarray(spatial_shapes, dtype=np.int32)
    hs = shapes[:, 0][None, None, None, :, None]
    ws = shapes[:, 1][None, None, None, :, None]
    starts = np.asarray(level_starts, dtype=np.int32)[None, None, None, :, None]

    x = sampling_locations[..., 0]
    y = sampling_locations[..., 1]
    fx = x * ws - 0.5
    fy = y * hs - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    lx = fx - x0
    ly = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    bx = jnp.clip(x0i, 0, np.maximum(ws - 2, 0))
    by = jnp.clip(y0i, 0, np.maximum(hs - 2, 0))

    def axis_slot_weights(c0, b, l, size):
        """corner weights (1-l at c0, l at c0+1) -> patch slots (b, b+1)."""
        w_c0 = jnp.where((c0 >= 0) & (c0 < size), 1.0 - l, 0.0)
        w_c1 = jnp.where((c0 + 1 >= 0) & (c0 + 1 < size), l, 0.0)
        off = c0 - b  # in {-1, 0, 1}
        slot0 = jnp.where(off == 0, w_c0, 0.0) + jnp.where(off == -1, w_c1, 0.0)
        slot1 = jnp.where(off == 1, w_c0, 0.0) + jnp.where(off == 0, w_c1, 0.0)
        return slot0, slot1

    wx0, wx1 = axis_slot_weights(x0i, bx, lx, ws)
    wy0, wy1 = axis_slot_weights(y0i, by, ly, hs)

    # slot order matches the patch-map channel order: (y0x0, y0x1, y1x0, y1x1)
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    idx = starts + by * ws + bx
    return idx, w


def build_patch_map(value, spatial_shapes):
    """[B, S, H, D] -> [B, S, H, 4, D]: each row carries its 2x2 pixel patch
    (self, right, down, down-right), zero-padded at the bottom/right edges."""
    B, S, H, D = value.shape
    starts = level_start_indices(spatial_shapes)
    patches = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lid]:starts[lid] + h * w].reshape(B, h, w, H, D)
        vp = jnp.pad(v, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
        patch = jnp.stack(
            [vp[:, :h, :w], vp[:, :h, 1:w + 1],
             vp[:, 1:h + 1, :w], vp[:, 1:h + 1, 1:w + 1]],
            axis=4,
        )  # [B, h, w, H, 4, D]
        patches.append(patch.reshape(B, h * w, H, 4, D))
    return jnp.concatenate(patches, axis=1)


def ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights,
                   chunk: int = 1024):
    """Patched-gather MSDA forward; differentiable via XLA autodiff.

    Two TPU-measured facts shape this implementation:
      - gathers cost ~13 ns per ROW independent of row width up to ~512 B, so
        the four bilinear corners are fetched as ONE row of a precomputed
        2x2-patch map (4x fewer rows than a per-corner gather: 1.2 s -> ~0.3 s
        per encoder layer at batch 16);
      - the gathered tensor for encoder self-attention would be huge
        (Q = 10200), so the query axis runs in `chunk` pieces under `lax.map`
        + rematerialization; the backward recomputes the gather and
        scatter-adds grad_value — the same strategy as the reference CUDA
        col2im kernel (ms_deform_im2col_cuda.cuh:845-922).

    `spatial_shapes` must be a static (python) sequence of (h, w) pairs.
    """
    B, S, H, D = value.shape
    Bq, Q, Hq, L, P, _ = sampling_locations.shape
    assert H == Hq and len(spatial_shapes) == L
    K = L * P  # one patch row per point

    starts = level_start_indices(spatial_shapes)
    idx, w = _patch_base_and_weights(sampling_locations, spatial_shapes, starts)
    # fold attention weights into the 4 patch-slot weights: [B, Q, H, L, P, 4]
    w = w * attention_weights[..., None]

    patch = build_patch_map(value, spatial_shapes)  # [B, S, H, 4, D]
    patch_t = jnp.transpose(patch, (0, 2, 1, 3, 4)).reshape(B, H, S, 4 * D)
    idx_t = jnp.transpose(idx, (0, 2, 1, 3, 4)).reshape(B, H, Q, K)
    # fold the 4 patch slots into the contraction axis: a trailing dim of 4
    # would be lane-padded 32x by the TPU tiler (observed 320 MB -> 10 GB on
    # this tensor's gradient)
    w_t = jnp.transpose(w, (0, 2, 1, 3, 4, 5)).reshape(B, H, Q, K * 4)

    # NOTE(perf, v5e): the take_along_axis VJP lowers to a while-loop of
    # dynamic-update-slices over the B*H batch dims (~46 ms/decoder-layer).
    # A flat single-table scatter-add custom_vjp microbenches at ~20 ms on
    # identical shapes but regresses the FULL train step 20x (15 s/step,
    # jax 0.9.0) — some interaction with surrounding fusions; don't retry
    # without re-measuring the whole step.
    def gather_chunk(idx_c, w_c):
        """idx [B, H, q, K], w [B, H, q, K*4] -> [B, H, q, D]"""
        q = idx_c.shape[2]
        g = jnp.take_along_axis(
            patch_t, idx_c.reshape(B, H, q * K)[..., None], axis=2
        ).reshape(B, H, q, K * 4, D)
        return jnp.einsum("bhqk,bhqkd->bhqd", w_c, g)

    if Q <= chunk:
        out = gather_chunk(idx_t, w_t)
    else:
        n = -(-Q // chunk)
        pad = n * chunk - Q
        idx_p = jnp.pad(idx_t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        w_p = jnp.pad(w_t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        idx_c = idx_p.reshape(B, H, n, chunk, K).transpose(2, 0, 1, 3, 4)
        w_c = w_p.reshape(B, H, n, chunk, K * 4).transpose(2, 0, 1, 3, 4)
        out = jax.lax.map(
            jax.checkpoint(lambda args: gather_chunk(*args)), (idx_c, w_c)
        )  # [n, B, H, chunk, D]
        out = out.transpose(1, 2, 0, 3, 4).reshape(B, H, n * chunk, D)[:, :, :Q]

    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D)


def ms_deform_attn_dense(value, spatial_shapes, sampling_locations,
                         attention_weights):
    """Exact MSDA as dense separable-hat matmuls — the TPU decoder path.

    For small query counts (decoder cross-attention: Q <= ~550) the
    gather/scatter formulation is issue-bound (~13 ns/row x B*Q*H*L*P rows
    forward, and a far worse while+DUS scatter backward).  Instead, evaluate
    the bilinear interpolation DENSELY: the weight a sample places on grid
    pixel (y, x) factors into per-axis hat functions relu(1 - |f - j|), so

        W[b,q,h,y,x] = sum_p att * hat_y(fy - y) * hat_x(fx - x)
        out[b,q,h,:] = sum_l W_l[b,q,h,:,:] . value_l[b,:,:,h,:]

    Both contractions are MXU matmuls; there is no gather and the backward
    is two more matmuls (grad_W = gout @ v^T, grad_v = W^T @ gout) plus the
    hat chain — no scatter at all.  Semantics are EXACTLY the reference
    `ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func.py:41-61):
    a corner outside the image has no grid point, reproducing grid_sample's
    zero padding; align_corners=False pixel mapping fx = x*W - 0.5.

    Each level is wrapped in jax.checkpoint so the [B, Q, H, h*w] weight
    matrices (~1 GB bf16 at level 0, bs 16) are rebuilt in backward instead
    of living across the whole step.

    Shapes as ms_deform_attn.  Cost scales with Q * S — use only for
    decoder-sized Q.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    starts = level_start_indices(spatial_shapes)
    compute_dtype = value.dtype

    def level_out(v_l, f_l, a_l, h, w):
        # v_l [B, h*w, H, D]; f_l [B, Q, H, P, 2] in [0,1]; a_l [B, Q, H, P]
        # Everything is laid out (b, h)-major so W comes out of the hat
        # fusion already in the [B, H, Q, S] layout the batched matmul wants
        # (a [B, Q, H, S] W costs a ~1 GB relayout copy per layer, measured
        # 5.3 ms each on v5e).
        fx = jnp.transpose(f_l[..., 0], (0, 2, 1, 3)).astype(jnp.float32) * w - 0.5
        fy = jnp.transpose(f_l[..., 1], (0, 2, 1, 3)).astype(jnp.float32) * h - 0.5
        att = jnp.transpose(a_l, (0, 2, 1, 3)).astype(jnp.float32)
        iy = jnp.arange(h, dtype=jnp.float32)
        ix = jnp.arange(w, dtype=jnp.float32)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[..., None] - iy))  # [B,H,Q,P,h]
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[..., None] - ix))  # [B,H,Q,P,w]
        hy = (hy * att[..., None]).astype(compute_dtype)
        hx = hx.astype(compute_dtype)
        # sum_p outer(hy_p, hx_p) as P fused broadcast FMAs: an einsum with
        # the tiny P=4 contraction lowers to a slow TPU convolution (~2.7 ms
        # vs ~1.3 ms for the fused elementwise form)
        wmat = hy[:, :, :, 0, :, None] * hx[:, :, :, 0, None, :]
        for p in range(1, hy.shape[3]):
            wmat = wmat + hy[:, :, :, p, :, None] * hx[:, :, :, p, None, :]
        wmat = wmat.reshape(B, H, Q, h * w)
        v_t = jnp.transpose(v_l, (0, 2, 1, 3))  # [B, H, S_l, D]
        out = jnp.einsum("bhqs,bhsd->bhqd", wmat, v_t,
                         preferred_element_type=jnp.float32)
        return jnp.transpose(out, (0, 2, 1, 3))  # [B, Q, H, D]

    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lid, (h, w) in enumerate(spatial_shapes):
        v_l = value[:, starts[lid]:starts[lid] + h * w]
        out = out + jax.checkpoint(
            functools.partial(level_out, h=h, w=w)
        )(v_l, sampling_locations[:, :, :, lid], attention_weights[:, :, :, lid])
    return out.reshape(B, Q, H * D).astype(value.dtype)


def ms_deform_attn_reference(value, spatial_shapes, sampling_locations,
                             attention_weights):
    """Slow per-level oracle mirroring `ms_deform_attn_core_pytorch`
    (ops/functions/ms_deform_attn_func.py:41-61) via explicit grid-sampling.

    Used only in tests as the correctness oracle for the fused path and the
    Pallas kernel.
    """
    from .utils import grid_sample_bilinear

    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    starts = level_start_indices(spatial_shapes)

    out = jnp.zeros((B, Q, H, D), value.dtype)
    for lid, (h, w) in enumerate(spatial_shapes):
        v_l = value[:, starts[lid]:starts[lid] + h * w]  # [B, h*w, H, D]
        v_l = v_l.reshape(B, h, w, H, D)
        grid = 2 * sampling_locations[:, :, :, lid] - 1  # [B, Q, H, P, 2]

        def sample_one(img, coords):  # img [h, w, H*D], coords [Q, H, P, 2]
            return grid_sample_bilinear(img, coords, align_corners=False)

        sampled = jax.vmap(sample_one)(
            v_l.reshape(B, h, w, H * D), grid
        )  # [B, Q, H, P, H*D]
        sampled = sampled.reshape(B, Q, H, P, H, D)
        # keep each head's own channels: diag over the two head axes
        sampled = jnp.einsum("bqhphd->bqhpd", sampled)
        out = out + jnp.einsum("bqhp,bqhpd->bqhd",
                               attention_weights[:, :, :, lid], sampled)
    return out.reshape(B, Q, H * D)
