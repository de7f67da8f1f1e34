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


def gen_sineembed_for_position(pos):
    """Sine embedding of normalized positions [B, Q, d] (d = 2 or 6) ->
    [B, Q, 128*d] — reference depthaware_transformer.py:29-65 (order:
    pos_y, pos_x, then l, r, t, b for 6-D)."""
    scale = 2 * np.pi
    dim_t = np.arange(128, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / 128)
    dim_t = jnp.asarray(dim_t)

    def embed(coord):  # [B, Q] -> [B, Q, 128]
        p = coord[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(p.shape[:-1] + (128,))

    parts = [embed(pos[..., 1]), embed(pos[..., 0])]  # y, x
    for i in range(2, pos.shape[-1]):
        parts.append(embed(pos[..., i]))
    return jnp.concatenate(parts, axis=-1)


def get_proposal_pos_embed(proposals):
    """[B, Q, 4] unactivated proposals -> [B, Q, 512] sine embedding
    (reference :139-152: sigmoid applied inside)."""
    dim_t = np.arange(128, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / 128)
    dim_t = jnp.asarray(dim_t)
    p = jax.nn.sigmoid(proposals) * (2 * np.pi)
    pos = p[..., None] / dim_t  # [B, Q, 4, 128]
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)  # [B, Q, 4, 64, 2]
    return pos.reshape(pos.shape[:2] + (-1,))


def encoder_output_proposals(spatial_shapes):
    """Static per-level box proposals [S, 6] (cx, cy, l, r, t, b) in logit
    space + validity mask — reference gen_encoder_output_proposals
    (:154-188) with valid_ratios == 1 (all-valid masks)."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        wh = np.full((h * w, 4), 0.05 * (2.0 ** lvl), np.float32)
        props.append(
            np.concatenate([gx.reshape(-1, 1), gy.reshape(-1, 1), wh], axis=1)
        )
    proposals = np.concatenate(props, axis=0)  # [S, 6]
    valid = ((proposals > 0.01) & (proposals < 0.99)).all(-1)
    unact = np.log(proposals / (1 - proposals))
    unact = np.where(valid[:, None], unact, np.inf).astype(np.float32)
    return unact, valid


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
    msda_impl: str = "gather"
    msda_window: int = 8  # windowed-impl clamp extent (G)

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, deterministic=True):
        src2 = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, impl=self.msda_impl, window=self.msda_window,
            name="self_attn",
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
    # decoder cross-attn MSDA kernel: "dense" is EXACT reference semantics
    # (ops/msda.ms_deform_attn_dense) restructured as MXU matmuls — strictly
    # faster than "gather" at decoder query counts on TPU.
    msda_impl: str = "dense"

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

        # group-wise only when the query count actually factors into
        # group_num x num_queries (the reference hard-codes 50 and would
        # crash otherwise, :481-489 — e.g. two_stage training)
        if train and tgt.shape[1] == self.group_num * self.num_queries:
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
            dtype=self.dtype, impl=self.msda_impl, name="cross_attn",
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
    two_stage: bool = False
    use_dab: bool = False
    two_stage_dino: bool = False
    two_stage_num_proposals: int = 50
    dtype: Any = jnp.float32
    remat: bool = False
    msda_impl: str = "gather"  # encoder self-attn kernel (see MSDeformAttn)
    msda_window: int = 8  # clamp window G for windowed encoder impls
    dec_msda_impl: str = "sep"  # decoder cross-attn kernel (exact; MXU Pallas)

    @nn.compact
    def __call__(self, srcs, pos_embeds, query_embed, depth_embed,
                 bbox_heads, dim_heads, train: bool, deterministic=True,
                 class_heads=None):
        """
        srcs/pos_embeds: lists of [B, h, w, C] per level
        query_embed: [Qtot, 2*C] (standard path, already sliced) or
                     [Qtot, C+6] (use_dab) or None (two_stage / dino)
        depth_embed: [B, S16, C] depth tokens
        bbox_heads/dim_heads: per-decoder-layer callables C -> 6 / C -> 3
        (len dec_layers + 1 when two_stage: the extra head scores encoder
        proposals, reference monodetr.py:123)
        Returns (hs [Ldec, B, Q, C], init_reference, refs_in per layer,
                 inter_dims [Ldec, B, Q, 3], enc_outputs_class,
                 enc_outputs_coord_unact) — last two None unless two_stage.
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
        # remat the encoder layer EXCEPT the deformable-sampling output:
        # re-running the sampling kernel in backward costs ~40 ms/layer on
        # v5e while the saved buffer is only [B, S, H*D] bf16 (~100 MB);
        # the cheap dense ops (projections, FFN, norms) still rematerialize.
        enc_cls = nn.remat(
            VisualEncoderLayer, static_argnums=(4, 5),
            policy=jax.checkpoint_policies.save_only_these_names(
                "msda_sampled"),
        ) if self.remat else VisualEncoderLayer
        for i in range(self.num_encoder_layers):
            memory = enc_cls(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.nhead, self.enc_n_points,
                dtype=self.dtype, msda_impl=self.msda_impl,
                msda_window=self.msda_window,
                name=f"encoder_layer_{i}",
            )(memory, pos_flat, enc_ref, spatial_shapes, deterministic)

        # ---- decoder prep ----
        enc_outputs_class = enc_outputs_coord_unact = None
        per_layer_query_pos = False  # DAB/DINO recompute query_pos per layer

        if self.two_stage:
            # encoder proposals -> top-k references + query embedding
            # (reference :234-254; note the enc_output projection is applied
            # TWICE there — :187 inside gen_encoder_output_proposals and
            # again at :236-237 — reproduced faithfully)
            prop_unact, prop_valid = encoder_output_proposals(spatial_shapes)
            prop_unact = jnp.asarray(prop_unact)[None]  # [1, S, 6]
            mem = jnp.where(
                jnp.asarray(prop_valid)[None, :, None], memory, 0.0
            ).astype(jnp.float32)
            enc_proj = nn.Dense(self.d_model, name="enc_output")
            enc_norm = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")
            output_memory = enc_norm(enc_proj(mem))
            output_memory = enc_norm(enc_proj(output_memory))
            enc_outputs_class = class_heads[-1](output_memory).astype(jnp.float32)
            enc_outputs_coord_unact = (
                bbox_heads[-1](output_memory).astype(jnp.float32) + prop_unact
            )
            topk = min(self.two_stage_num_proposals, enc_outputs_class.shape[1])
            _, topk_idx = jax.lax.top_k(enc_outputs_class[..., 0], topk)
            topk_coords_unact = jnp.take_along_axis(
                enc_outputs_coord_unact, topk_idx[..., None], axis=1
            )
            topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)
            reference_points = jax.nn.sigmoid(topk_coords_unact)
            # 4-D (cx, cy, l+r, t+b) sine embedding -> (query_pos, tgt)
            coords4 = jnp.concatenate(
                [
                    topk_coords_unact[..., 0:2],
                    topk_coords_unact[..., 2::2] + topk_coords_unact[..., 3::2],
                ],
                axis=-1,
            )
            pos_trans_out = nn.LayerNorm(epsilon=1e-5, name="pos_trans_norm")(
                nn.Dense(2 * self.d_model, name="pos_trans")(
                    get_proposal_pos_embed(coords4)
                )
            ).astype(self.dtype)
            query_pos, tgt = jnp.split(pos_trans_out, 2, axis=2)
        elif self.use_dab:
            query_embed = query_embed.astype(jnp.float32)
            tgt = jnp.broadcast_to(
                query_embed[None, :, : self.d_model], (B,) + query_embed[:, : self.d_model].shape
            ).astype(self.dtype)
            reference_points = jax.nn.sigmoid(query_embed[None, :, self.d_model:])
            reference_points = jnp.broadcast_to(
                reference_points, (B,) + query_embed[:, self.d_model:].shape
            )
            query_pos = None
            per_layer_query_pos = True
        elif self.two_stage_dino:
            prop_unact, prop_valid = encoder_output_proposals(spatial_shapes)
            prop_unact = jnp.asarray(prop_unact)[None]
            mem = jnp.where(
                jnp.asarray(prop_valid)[None, :, None], memory, 0.0
            ).astype(jnp.float32)
            output_memory = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(
                nn.Dense(self.d_model, name="enc_output")(mem)
            )
            enc_cls = nn.Dense(3, name="enc_out_class_embed")(output_memory)
            enc_coord_unact = (
                MLP(self.d_model, 6, 3, name="enc_out_bbox_embed")(output_memory)
                + prop_unact
            )
            topk = self.two_stage_num_proposals * (self.group_num if train else 1)
            # tiny test resolutions can have fewer tokens than proposals
            topk = min(topk, enc_cls.shape[1])
            _, topk_idx = jax.lax.top_k(enc_cls.max(-1), topk)
            refpoint_unact = jnp.take_along_axis(
                enc_coord_unact, topk_idx[..., None], axis=1
            )
            reference_points = jax.lax.stop_gradient(refpoint_unact)
            tgt_table = self.param(
                "tgt_embed", nn.initializers.normal(1.0),
                (self.two_stage_num_proposals * self.group_num, self.d_model),
            )
            n_q = topk
            tgt = jnp.broadcast_to(
                tgt_table[None, :n_q].astype(self.dtype), (B, n_q, self.d_model)
            )
            # dino enters the decoder with unactivated refs (:559-560)
            reference_points = jax.nn.sigmoid(reference_points)
            query_pos = None
            per_layer_query_pos = True
        else:
            # standard path (:283-287)
            query_embed = query_embed.astype(self.dtype)
            query_pos, tgt = jnp.split(query_embed, 2, axis=1)
            query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
            tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)
            reference_points = nn.sigmoid(
                nn.Dense(2, dtype=jnp.float32,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="reference_points")(
                    query_pos
                )
            )
        init_reference = reference_points

        if per_layer_query_pos:
            ref_point_head = MLP(
                self.d_model, self.d_model, 2, dtype=self.dtype,
                name="ref_point_head",
            )
            query_scale = MLP(
                self.d_model, self.d_model, 2, dtype=self.dtype,
                name="query_scale",
            )

        # ---- decoder ----
        hs_list, refs_in_list, dims_list = [], [], []
        for lid in range(self.num_decoder_layers):
            ref_dim = reference_points.shape[-1]
            ref_input = jnp.broadcast_to(
                reference_points[:, :, None, :],
                reference_points.shape[:2] + (self.num_feature_levels, ref_dim),
            )
            if per_layer_query_pos:
                # DAB/DINO: query_pos from the sine embedding of the current
                # reference (reference :572-588)
                sine = gen_sineembed_for_position(ref_input[:, :, 0, :])
                raw_query_pos = ref_point_head(sine.astype(self.dtype))
                scale = query_scale(tgt) if lid != 0 else 1.0
                query_pos = scale * raw_query_pos
            tgt = DepthAwareDecoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.nhead, self.dec_n_points,
                self.group_num, self.num_queries, dtype=self.dtype,
                msda_impl=self.dec_msda_impl,
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
            enc_outputs_class,
            enc_outputs_coord_unact,
        )
