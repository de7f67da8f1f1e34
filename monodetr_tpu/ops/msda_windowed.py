"""Windowed multi-scale deformable attention — the TPU-fast encoder path.

Why this exists.  The exact MSDA formulation (`msda.ms_deform_attn`) is a
row-gather: B·H·Q·L·P rows per layer (~21M at the reference recipe), and TPU
gathers are issue-bound at ~10 ns/row regardless of locality (measured on
v5e), putting a ~0.4 s/layer floor on the encoder.  The CUDA reference
(ms_deform_im2col_cuda.cuh) pays nothing for random access; a TPU-native
design must remove the randomness instead.

The observation: encoder queries ARE the multi-level pixel grid
(depthaware_transformer.py:357-384 — reference points = per-level pixel
centers), so each query's samples live near a *statically known* anchor in
every sampled level.  If sampling offsets are bounded by a G-pixel window
(they are initialized within ±P pixels, ms_deform_attn.py:106-120, and are
clamped to the window in this mode), the whole op becomes dense:

  out[b, q, h, :] = sum_{l', gy, gx}  c[b, q, h, l', gy, gx] * V_l'[b, Ay(q)+gy, Ax(q)+gx, h, :]

where (Ay, Ax) is the static per-query window anchor and the coefficient
tensor c is built from hat functions (relu(1 - |rel - g|) — the bilinear
interpolation weights evaluated densely over the window) folded with the
softmax attention weights.  Every V read is a *static shift* of a padded
(and, for cross-level sampling, repeated or strided) feature map: no gather,
no scatter in the backward — XLA autodiff emits transposed shifts and
segment reductions, all bandwidth-bound VPU work.

Anchor algebra (x axis; y identical).  Query pixel x at level l samples
level l' (sizes W_l, W_l'; ratios are powers of two):
  f_center = (x + 0.5) * W_l'/W_l - 0.5
  - same level:              floor(f_center) = x
  - coarser by c = 2^k:      floor(f_center) = floor((x + floor(0.5 - 0.5c)) / c)
      realized on repeat(V, c) at level-l resolution:
      V_l'[floor(f) + g] = Vrep[x + floor(0.5-0.5c) + g*c]          (static shift)
  - finer by m = 2^k:        floor(f_center) = x*m + m/2 - 1
      realized as a stride-m slice of V_l' at static offset.        (static shift)
The window start is A(x) = floor(f_center(x)) - (G/2 - 1); sampling positions
f (including learned offsets) are clamped to [A, A + G - 1 - eps] so both
bilinear corners stay inside the window.  Out-of-image corners contribute
zero exactly as grid_sample(padding='zeros') does — the maps are zero-padded
and the hat weight multiplies a zero value.

Semantics: identical to `ms_deform_attn` whenever every sampling location
lies inside its window (tests enforce this); locations outside are clamped to
the window edge (the documented "windowed deformable attention" deviation —
offsets are also clamped in the module so training never sees the cliff).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .msda import level_start_indices


def _is_pow2(x):
    return x > 0 and (x & (x - 1)) == 0


def _anchor_floor(n_q, c_down, m_up):
    """floor(f_center) for each query position 0..n_q-1 (numpy, static)."""
    x = np.arange(n_q, dtype=np.int64)
    if c_down == 1 and m_up == 1:
        return x
    if c_down > 1:
        fh = math.floor(0.5 - 0.5 * c_down)
        return (x + fh) // c_down
    return x * m_up + m_up // 2 - 1


def ms_deform_attn_windowed(value, spatial_shapes, sampling_locations,
                            attention_weights, window: int = 8):
    """Windowed MSDA for grid queries (Q == S, level-major query order).

    value:               [B, S, H, D]
    spatial_shapes:      static ((h, w), ...) — power-of-two size ratios
    sampling_locations:  [B, S, H, L, P, 2] normalized (x, y)
    attention_weights:   [B, S, H, L, P]
    window:              G (even); offsets are clamped to the G-window.

    Returns [B, S, H * D].
    """
    B, S, H, D = value.shape
    Bq, Q, Hq, L, P, _ = sampling_locations.shape
    assert Q == S, "windowed MSDA requires grid queries (encoder self-attn)"
    assert H == Hq and len(spatial_shapes) == L
    G = window
    assert G % 2 == 0 and G >= 4
    half = G // 2 - 1  # window extends [-half, G-1-half] around the anchor

    starts = level_start_indices(spatial_shapes)
    compute_dtype = value.dtype

    # per-level value maps [B, h, w, H*D]
    vmaps = [
        value[:, starts[l]:starts[l] + h * w].reshape(B, h, w, H * D)
        for l, (h, w) in enumerate(spatial_shapes)
    ]

    outs = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        s0 = starts[lq]
        nq = hq * wq
        # this level's samples: [B, hq, wq, H, L, P, 2] / weights [..., P]
        loc = sampling_locations[:, s0:s0 + nq].reshape(B, hq, wq, H, L, P, 2)
        att = attention_weights[:, s0:s0 + nq].reshape(B, hq, wq, H, L, P)

        out_l = jnp.zeros((B, hq, wq, H, D), jnp.float32)
        for lv, (hv, wv) in enumerate(spatial_shapes):
            ry, rx = hq // hv if hq >= hv else 1, wq // wv if wq >= wv else 1
            my, mx = hv // hq if hv > hq else 1, wv // wq if wv > wq else 1
            assert _is_pow2(max(ry, 1)) and _is_pow2(max(my, 1))

            # static anchors (floor of the center-sample position)
            ax = _anchor_floor(wq, rx, mx) - half  # [wq] window starts
            ay = _anchor_floor(hq, ry, my) - half  # [hq]

            # dense sampling positions in level-lv pixel coords, clamped to
            # +-lim pixels around the static center-sample position — the
            # same bound clamp_offsets_to_window applies, so
            # windowed(x) == gather(clamp_offsets(x)) exactly.
            lim = G / 2 - 1 - 1e-2
            fcx = ((np.arange(wq) + 0.5) * wv / wq - 0.5).astype(np.float32)
            fcy = ((np.arange(hq) + 0.5) * hv / hq - 0.5).astype(np.float32)
            fx = loc[..., lv, :, 0] * wv - 0.5  # [B, hq, wq, H, P]
            fy = loc[..., lv, :, 1] * hv - 0.5
            fx = jnp.clip(fx, (fcx - lim)[None, None, :, None, None],
                          (fcx + lim)[None, None, :, None, None])
            fy = jnp.clip(fy, (fcy - lim)[None, :, None, None, None],
                          (fcy + lim)[None, :, None, None, None])

            # hat (bilinear) weights over the window, folded with attention
            gi = jnp.arange(G, dtype=jnp.float32)
            relx = fx - ax[None, None, :, None, None]
            rely = fy - ay[None, :, None, None, None]
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(relx[..., None] - gi))
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(rely[..., None] - gi))
            hy = hy * att[..., lv, :, None]  # fold attn into the y hat
            # [B, hq, wq, H, P, G]

            # aligned, padded source map at level-lq resolution
            v = vmaps[lv]
            if ry > 1 or rx > 1:  # sampled level is coarser: repeat up
                v = jnp.repeat(jnp.repeat(v, ry, axis=1), rx, axis=2)
                sy0 = math.floor(0.5 - 0.5 * ry) - half * ry
                sx0 = math.floor(0.5 - 0.5 * rx) - half * rx
                stepy, stepx = ry, rx
                # shift for window slot g: s0 + g*step
            else:  # same or finer: stride-m slice
                # floor(f_center) = x*m + m/2 - 1 for m >= 2, = x for m == 1
                sy0 = (my // 2 - 1 if my > 1 else 0) - half
                sx0 = (mx // 2 - 1 if mx > 1 else 0) - half
                stepy, stepx = 1, 1
                # finer: absolute index = y*my + sy0 + g; realized by slicing
                # the padded map with stride my starting at pad + sy0 + g.

            pady = abs(sy0) + G * max(stepy, my) + max(stepy, my)
            padx = abs(sx0) + G * max(stepx, mx) + max(stepx, mx)
            vpad = jnp.pad(v, ((0, 0), (pady, pady), (padx, padx), (0, 0)))

            hD = H * D

            def window_slice(gy, gx):
                oy = pady + sy0 + gy * stepy
                ox = padx + sx0 + gx * stepx
                if my > 1 or mx > 1:
                    sl = jax.lax.slice(
                        vpad,
                        (0, oy, ox, 0),
                        (B, oy + (hq - 1) * my + 1, ox + (wq - 1) * mx + 1, hD),
                        (1, my, mx, 1),
                    )
                else:
                    sl = jax.lax.slice(
                        vpad, (0, oy, ox, 0), (B, oy + hq, ox + wq, hD))
                return sl.reshape(B, hq, wq, H, D)

            for gy in range(G):
                # coefficient row: fold P into the x hats  [B, hq, wq, H, G]
                cgy = jnp.einsum("bywhp,bywhpg->bywhg", hy[..., gy], hx)
                cgy = cgy.astype(jnp.float32)
                for gx in range(G):
                    m = window_slice(gy, gx).astype(jnp.float32)
                    out_l = out_l + cgy[..., gx, None] * m

        outs.append(out_l.reshape(B, nq, H * D))

    return jnp.concatenate(outs, axis=1).astype(compute_dtype)


def clamp_offsets_to_window(offsets_px, window: int = 8):
    """Clamp per-level pixel offsets into the windowed-attention range.

    The center sample sits at the anchor cell; corners of a sample at
    offset o stay inside [A, A+G-1] iff o in (-(G/2 - 1), G/2 - 1).  Used by
    the MSDA module when msda_impl == 'windowed' so training never produces
    samples the kernel would clamp discontinuously.
    """
    lim = window / 2 - 1 - 1e-2
    return jnp.clip(offsets_px, -lim, lim)
