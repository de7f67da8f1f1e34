"""MSDeformAttn flax module: learned sampling offsets + attention weights
around the fused-gather op.

Parity with reference ops/modules/ms_deform_attn.py:69-162, including the
characteristic initialization (ring-of-directions offset bias, zero attention
weights, ms_deform_attn.py:106-120) which is load-bearing for convergence.
"""

import math
from typing import Sequence, Tuple

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.msda import ms_deform_attn


def _offset_bias_init(n_heads, n_levels, n_points, max_radius=None):
    """Ring of unit directions scaled by point index (ms_deform_attn.py:107-114).

    max_radius rescales the ring so the OUTERMOST point sits at that radius
    (in pixels).  The reference init puts point p at radius p+1 (up to
    n_points px); the windowed kernels clamp sampling to +-(window/2-1) px,
    and a bias initialized OUTSIDE the window would be clamped from step 0
    with exactly-zero location gradient — those points could never train.
    """
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    if max_radius is not None:
        grid *= max_radius / n_points
    return grid.reshape(-1)


class _PermutedOutDense(nn.Module):
    """nn.Dense-compatible projection whose OUTPUT features are permuted by
    a static perm applied to the params (kernel columns / bias) rather than
    the activations: the stored param layout stays reference-compatible
    (checkpoint import/export unchanged) while the matmul emits the
    kernel-friendly feature order at zero runtime cost."""

    features: int
    perm: Any
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        perm = jnp.asarray(np.asarray(self.perm), jnp.int32)
        k = jnp.take(k, perm, axis=1).astype(self.dtype)
        b = jnp.take(b, perm, axis=0).astype(self.dtype)
        return jnp.dot(x.astype(self.dtype), k) + b


class MSDeformAttn(nn.Module):
    """impl selects the sampling kernel:
      - "gather": exact reference semantics (arbitrary offsets), XLA fused
        row-gather — the parity path;
      - "fused": windowed TPU kernel with the whole attention prologue and
        epilogue inside the kernel (ops/msda_enc_pallas.py): consumes the
        raw bf16 offset/logit projections in natural layout, does softmax/
        clamp/centers in VMEM, emits bf16 projection grads — no f32 pack
        arrays or blockify relayouts in XLA.  Same windowed semantics as
        "pallas"; the encoder fast path;
      - "pallas": windowed TPU kernel (ops/msda_pallas.py), offsets clamped
        to +-(window/2-1) px — the fast path for encoder self-attention
        (requires grid queries, i.e. Q == S and 2-D reference points);
      - "dense": exact semantics via dense separable-hat MXU matmuls
        (ops/msda.ms_deform_attn_dense) — the fast path for decoder-sized
        query counts (cost scales with Q * S; no gather, no scatter);
      - "dense_fused": same exact semantics, weight tiles built in VMEM by
        a Pallas kernel (ops/msda_dense_pallas.py) — no HBM W traffic;
        XLA dense fallback on CPU;
      - "sep": same exact semantics, semi-separable MXU Pallas kernel
        (ops/msda_sep_pallas.py) — the per-axis hat factorization turns the
        O(Q*S) work into matmuls with no HBM W traffic and no dense VPU
        hat wall; XLA dense fallback on CPU;
      - "windowed": pure-XLA shift formulation of the same windowed math
        (oracle/testing; slow at scale).
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32
    impl: str = "gather"
    window: int = 8

    @nn.compact
    def __call__(self, query, reference_points, value_tokens, spatial_shapes):
        """
        query:            [B, Q, C]
        reference_points: [B, Q, L, 2] (normalized centers) or [B, Q, L, 6]
                          (cxcylrtb reference boxes)
        value_tokens:     [B, S, C] flattened multi-level memory
        spatial_shapes:   static ((h, w), ...) of length n_levels
        """
        B, Q, _ = query.shape
        S = value_tokens.shape[1]
        H, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // H

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value_tokens)
        value = value.reshape(B, S, H, D)

        # windowed kernels: fit the init ring inside the clamp window with
        # margin (0.75 * lim) so every point starts with a live location
        # gradient; exact-semantics gather keeps the reference radii
        max_r = None
        if self.impl in ("pallas", "fused", "sepwin", "windowed"):
            max_r = 0.75 * (self.window / 2 - 1)

        if self.impl == "fused":
            # GRID-CENTERS ASSUMPTION: like "pallas" below, this path
            # derives sampling centers from spatial_shapes alone and never
            # reads reference_points — valid because the encoder's
            # reference points ARE the static per-level pixel-center grid
            # (depthaware_transformer.py:357-384) and this model has no
            # padding masks.  Non-grid callers must use 'gather'/'windowed'.
            assert reference_points.shape[-1] == 2 and Q == S, (
                "fused MSDA needs grid queries (encoder self-attention)")
            from ..ops.msda_enc_pallas import (ms_deform_attn_enc_fused,
                                               offset_feature_perm)

            off = _PermutedOutDense(
                H * L * P * 2, offset_feature_perm(), dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                    _offset_bias_init(H, L, P, max_r), dtype),
                name="sampling_offsets",
            )(query)
            logits = nn.Dense(
                H * L * P, dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="attention_weights",
            )(query)
            out = ms_deform_attn_enc_fused(
                value, tuple(spatial_shapes), off, logits, self.window
            ).astype(self.dtype)
            out = checkpoint_name(out, "msda_sampled")
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name="output_proj")(out)
        # Offset/weight projections run in the module compute dtype (bf16 on
        # the TPU fast path): an f32 matmul costs ~6x bf16 on the MXU, and
        # the quantities only need coarse precision — offsets are <= a few
        # px (bf16 grain at 4 px is ~0.015 px) and the weight logits feed a
        # softmax.  Params stay f32 (flax param_dtype default); positional
        # math downstream is promoted back to f32.  Exception: 'gather' is
        # the exact-reference-parity path, so its projections stay f32
        # (bit-parity-grade goldens and clamp A/Bs run through it).
        proj_dtype = jnp.float32 if self.impl == "gather" else self.dtype
        offsets_flat = nn.Dense(
            H * L * P * 2,
            dtype=proj_dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_bias_init(H, L, P, max_r), dtype
            ),
            name="sampling_offsets",
        )(query).astype(jnp.float32)

        attn = nn.Dense(
            H * L * P,
            dtype=proj_dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(
            B, Q, H, L, P)

        if self.impl == "pallas":
            # packed fast path: for grid queries the offset normalization
            # and the level rescale cancel (loc * (w,h) - 0.5 == center +
            # offset_px), so the window clamp is per-lane affine math on
            # [B, S, 128] — the inflated [B, S, H, L, P, 2] f32 arrays of
            # the loc-based route (~210 MB each at bench shapes, several
            # HBM passes per layer per direction) never materialize.
            # GRID-CENTERS ASSUMPTION: this path derives sampling centers
            # from spatial_shapes alone and never reads reference_points —
            # valid because the encoder's reference points ARE the static
            # per-level pixel-center grid (depthaware_transformer.py:357-384)
            # and this model has no padding masks (valid_ratios == 1, so the
            # x valid_ratios rescale is identity).  Any future caller with
            # Q == S but non-grid refs (e.g. if padding masks are added)
            # MUST use impl='windowed'/'gather' instead; the shape assert
            # below cannot catch that case.
            assert reference_points.shape[-1] == 2 and Q == S, (
                "pallas MSDA needs grid queries (encoder self-attention)")
            from ..ops.msda_pallas import (center_lane_tables,
                                           ms_deform_attn_pallas_packed,
                                           offset_lane_perm)

            lim = self.window / 2 - 1 - 1e-2
            cx, cy = center_lane_tables(tuple(spatial_shapes))
            offp = offsets_flat[..., offset_lane_perm(H, L, P)]
            fx = jnp.clip(cx[None] + offp[..., :128],
                          cx[None] - lim, cx[None] + lim)
            fy = jnp.clip(cy[None] + offp[..., 128:],
                          cy[None] - lim, cy[None] + lim)
            att_l = jnp.transpose(attn, (0, 1, 3, 2, 4)).reshape(B, Q, 128)
            out = ms_deform_attn_pallas_packed(
                value, tuple(spatial_shapes), fx, fy, att_l, self.window
            ).astype(self.dtype)
            out = checkpoint_name(out, "msda_sampled")
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name="output_proj")(out)

        offsets = offsets_flat.reshape(B, Q, H, L, P, 2)

        if reference_points.shape[-1] == 2:
            # offsets normalized by each level's (w, h)
            norm = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], jnp.float32
            )  # [L, 2]
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / norm[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 6:
            # cxcylrtb boxes: offsets scaled by half the box extent
            # (ms_deform_attn.py:153-155): (l+r, t+b) / 2.
            wh = (
                reference_points[:, :, None, :, None, 2::2]
                + reference_points[:, :, None, :, None, 3::2]
            ) * 0.5
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / self.n_points * wh
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 6")

        if self.impl == "sepwin":
            # same clamped-window semantics as "pallas"; semi-separable MXU
            # kernel (ops/msda_sepwin_pallas.py)
            assert reference_points.shape[-1] == 2 and Q == S, (
                "sepwin MSDA needs grid queries (encoder self-attention)")
            from ..ops.msda_sepwin_pallas import ms_deform_attn_sepwin

            out = ms_deform_attn_sepwin(
                value, tuple(spatial_shapes), loc,
                attn.astype(jnp.float32), self.window
            ).astype(self.dtype)
        elif self.impl == "dense":
            from ..ops.msda import ms_deform_attn_dense

            out = ms_deform_attn_dense(
                value, tuple(spatial_shapes), loc, attn.astype(self.dtype)
            ).astype(self.dtype)
        elif self.impl == "dense_fused":
            # same exact semantics as "dense", but the [B,H,Q,S_l] weight
            # matrices are built tile-wise in VMEM (never in HBM); falls
            # back to the XLA dense path off-TPU (interpret-mode pallas is
            # too slow for full-model CPU tests)
            if jax.devices()[0].platform == "cpu":
                from ..ops.msda import ms_deform_attn_dense

                out = ms_deform_attn_dense(
                    value, tuple(spatial_shapes), loc, attn.astype(self.dtype)
                ).astype(self.dtype)
            else:
                from ..ops.msda_dense_pallas import ms_deform_attn_dense_fused

                out = ms_deform_attn_dense_fused(
                    value, tuple(spatial_shapes), loc,
                    attn.astype(jnp.float32)
                ).astype(self.dtype)
        elif self.impl == "sep":
            # exact semantics; XLA dense fallback off-TPU (interpret-mode
            # pallas is too slow for full-model CPU tests)
            if jax.devices()[0].platform == "cpu":
                from ..ops.msda import ms_deform_attn_dense

                out = ms_deform_attn_dense(
                    value, tuple(spatial_shapes), loc, attn.astype(self.dtype)
                ).astype(self.dtype)
            else:
                from ..ops.msda_sep_pallas import ms_deform_attn_sep

                out = ms_deform_attn_sep(
                    value, tuple(spatial_shapes), loc,
                    attn.astype(jnp.float32)
                ).astype(self.dtype)
        elif self.impl == "windowed":
            assert reference_points.shape[-1] == 2 and Q == S
            from ..ops.msda_windowed import ms_deform_attn_windowed

            out = ms_deform_attn_windowed(
                value, tuple(spatial_shapes), loc,
                attn.astype(self.dtype), self.window)
        else:
            out = ms_deform_attn(
                value, tuple(spatial_shapes), loc, attn.astype(self.dtype)
            )
        # Named so the encoder's remat policy can SAVE the sampled output:
        # re-running the sampling kernel during backward costs far more than
        # the [B, S, H*D] buffer it saves (transformer.py enc remat policy).
        out = checkpoint_name(out, "msda_sampled")
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
