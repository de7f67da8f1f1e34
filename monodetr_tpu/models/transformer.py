"""Depth-aware transformer: visual encoder over multi-scale tokens +
depth-guided decoder with iterative 6-D box refinement.

Parity with reference depthaware_transformer.py (standard config path:
with_box_refine=True, two_stage/use_dab/use_dn/two_stage_dino all False —
configs/monodetr.yaml:50-55), redesigned for XLA:

  - fixed input shape => padding masks / valid_ratios are identically 1 and
    are eliminated (reference computes them at :190-197, they multiply
    reference points by 1.0);
  - group-wise self-attention (train: 550 queries = 11 groups x 50,
    :480-498) is a reshape to [B*groups, 50, C] batched attention — no
    python-level splits;
  - iterative refinement keeps the reference's stop-gradient placement: the
    refined reference entering the next layer is detached (:613), the
    per-layer output coordinates are not.

Faithfully reproduced quirk: in decoder self-attention the value is the raw
`tgt`, NOT `sa_v_proj(tgt)` — the reference computes the projection and then
overwrites it (depthaware_transformer.py:471 vs :477).  sa_v_proj therefore
exists in checkpoints but is dead; we do not create it.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.utils import inverse_sigmoid
from .layers import FFN, MLP, MultiheadAttention
from .msda_module import MSDeformAttn


def encoder_reference_points(spatial_shapes):
    """Per-level pixel-center grids, normalized — reference :364-376 with
    valid_ratios == 1.  Returns [S, 2] (x, y)."""
    pts = []
    for (h, w) in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return np.concatenate(pts, axis=0)


class VisualEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 256
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, deterministic=True):
        src2 = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        return FFN(self.d_ffn, self.dropout, dtype=self.dtype, name="ffn")(src, deterministic)


class DepthAwareDecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 256
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    group_num: int = 11
    num_queries: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 depth_embed, train: bool, deterministic=True):
        B = tgt.shape[0]

        # (1) depth cross-attention: raw tgt queries x depth tokens (:456-462)
        tgt2 = MultiheadAttention(
            self.n_heads, self.dropout, dtype=self.dtype, name="cross_attn_depth"
        )(tgt, depth_embed, depth_embed, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_depth")(tgt)

        # (2) group-wise self-attention (:465-503)
        qk = tgt + query_pos
        q = nn.Dense(self.d_model, dtype=self.dtype, name="sa_qcontent_proj")(qk) + nn.Dense(
            self.d_model, dtype=self.dtype, name="sa_qpos_proj"
        )(qk)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="sa_kcontent_proj")(qk) + nn.Dense(
            self.d_model, dtype=self.dtype, name="sa_kpos_proj"
        )(qk)
        v = tgt  # reference overwrites sa_v_proj output with raw tgt (:477)

        if train:
            g, nq = self.group_num, self.num_queries
            def regroup(x):
                return x.reshape(B, g, nq, self.d_model).reshape(B * g, nq, self.d_model)
            tgt2 = MultiheadAttention(
                self.n_heads, self.dropout, dtype=self.dtype, name="self_attn"
            )(regroup(q), regroup(k), regroup(v), deterministic=deterministic)
            tgt2 = tgt2.reshape(B, g * nq, self.d_model)
        else:
            tgt2 = MultiheadAttention(
                self.n_heads, self.dropout, dtype=self.dtype, name="self_attn"
            )(q, k, v, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        # (3) deformable cross-attention into encoder memory (:506-508)
        tgt2 = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, reference_points, src, spatial_shapes)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        # (4) FFN
        return FFN(self.d_ffn, self.dropout, dtype=self.dtype, name="ffn")(tgt, deterministic)


class DepthAwareTransformer(nn.Module):
    """Encoder + decoder + query/reference machinery.

    The per-layer prediction heads (bbox/dim) are passed in as callables from
    MonoDETR (the reference shares the very same modules between decoder
    refinement and output decoding, monodetr.py:124-133); here the decoder
    *returns* hidden states and pre-update references per layer and MonoDETR
    applies the heads — mathematically identical, single application.
    """

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    dim_feedforward: int = 256
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    group_num: int = 11
    num_queries: int = 50
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, srcs, pos_embeds, query_embed, depth_embed,
                 bbox_heads, dim_heads, train: bool, deterministic=True):
        """
        srcs/pos_embeds: lists of [B, h, w, C] per level
        query_embed: [Qtot, 2*C] (already sliced to the right query count)
        depth_embed: [B, S16, C] depth tokens
        bbox_heads/dim_heads: per-decoder-layer callables C -> 6 / C -> 3
        Returns (hs [Ldec, B, Q, C], init_reference [B, Q, 6?2],
                 refs_in [Ldec, B, Q, ...] pre-update references per layer,
                 inter_dims [Ldec, B, Q, 3]).
        """
        B = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model),
        )
        src_flat = jnp.concatenate(
            [s.reshape(B, -1, self.d_model) for s in srcs], axis=1
        ).astype(self.dtype)
        pos_flat = jnp.concatenate(
            [
                p.reshape(B, -1, self.d_model) + level_embed[l][None, None, :]
                for l, p in enumerate(pos_embeds)
            ],
            axis=1,
        ).astype(self.dtype)

        # ---- encoder ----
        enc_ref = jnp.asarray(encoder_reference_points(spatial_shapes))
        enc_ref = jnp.broadcast_to(
            enc_ref[None, :, None, :],
            (B, enc_ref.shape[0], self.num_feature_levels, 2),
        )
        memory = src_flat
        enc_cls = nn.remat(VisualEncoderLayer, static_argnums=(4, 5)) \
            if self.remat else VisualEncoderLayer
        for i in range(self.num_encoder_layers):
            memory = enc_cls(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.nhead, self.enc_n_points,
                dtype=self.dtype,
                name=f"encoder_layer_{i}",
            )(memory, pos_flat, enc_ref, spatial_shapes, deterministic)

        # ---- decoder prep (:283-287) ----
        query_embed = query_embed.astype(self.dtype)
        query_pos, tgt = jnp.split(query_embed, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)
        reference_points = nn.sigmoid(
            nn.Dense(2, dtype=jnp.float32, name="reference_points")(query_pos)
        )
        init_reference = reference_points

        # ---- decoder ----
        hs_list, refs_in_list, dims_list = [], [], []
        for lid in range(self.num_decoder_layers):
            ref_dim = reference_points.shape[-1]
            ref_input = jnp.broadcast_to(
                reference_points[:, :, None, :],
                reference_points.shape[:2] + (self.num_feature_levels, ref_dim),
            )
            tgt = DepthAwareDecoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.nhead, self.dec_n_points,
                self.group_num, self.num_queries, dtype=self.dtype,
                name=f"decoder_layer_{lid}",
            )(tgt, query_pos, ref_input, memory, spatial_shapes, depth_embed,
              train, deterministic)

            hs_list.append(tgt)
            refs_in_list.append(reference_points)
            dims_list.append(dim_heads[lid](tgt).astype(jnp.float32))

            # iterative refinement with detach (:601-613)
            tmp = bbox_heads[lid](tgt).astype(jnp.float32)
            reference_points = reference_points.astype(jnp.float32)
            if ref_dim == 6:
                new_ref = nn.sigmoid(tmp + inverse_sigmoid(reference_points))
            else:
                new_ref = tmp.at[..., :2].add(inverse_sigmoid(reference_points))
                new_ref = nn.sigmoid(new_ref)
            reference_points = jax.lax.stop_gradient(new_ref)

        return (
            jnp.stack(hs_list),
            init_reference,
            refs_in_list,
            jnp.stack(dims_list),
        )
