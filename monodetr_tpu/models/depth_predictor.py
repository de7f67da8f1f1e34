"""Foreground depth predictor + depth encoder.

Parity with reference depth_predictor/depth_predictor.py:
  - fuse levels 1/8, 1/16, 1/32 onto the 1/16 grid (proj/upsample/downsample,
    :62-70), 2x conv-GN-ReLU head, classifier to num_bins+1 logits (:47),
  - LID bin expectation -> weighted depth map (:76-77),
  - one vanilla post-norm transformer encoder layer over the flattened 1/16
    map -> depth embedding (:49-52, 85-86),
  - learned 1-D depth positional table (floor(depth_max)+1 entries)
    bilinearly interpolated at the predicted depth and added (:54, 88-104).

Everything is NHWC / [B, T, C]; masks are dropped (always all-valid).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.utils import interpolate_1d_embed, lid_bin_values
from .layers import ConvGN, MultiheadAttention


class DepthEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (depth_predictor/transformer.py:36-65)."""

    nhead: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, deterministic=True):
        q = k = src + pos
        src2 = MultiheadAttention(self.nhead, self.dropout, dtype=self.dtype, name="self_attn")(
            q, k, src, deterministic=deterministic
        )
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(src.shape[-1], dtype=self.dtype, name="linear2")(h)
        src = src + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class DepthPredictor(nn.Module):
    d_model: int = 256
    num_depth_bins: int = 80
    depth_min: float = 1e-3
    depth_max: float = 60.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, srcs, pos_16, deterministic=True):
        """srcs: list of projected features [B, h, w, C] for levels
        1/8, 1/16, 1/32 (and 1/64, unused); pos_16: [B, h16, w16, C].

        Returns (depth_logits [B, h16, w16, bins+1],
                 depth_embed_tokens [B, h16*w16, C],
                 weighted_depth [B, h16, w16],
                 depth_pos_embed_ip tokens [B, h16*w16, C]).
        """
        f8, f16, f32 = srcs[0], srcs[1], srcs[2]
        B, h16, w16, C = f16.shape

        src_16 = ConvGN(self.d_model, kernel=1, dtype=self.dtype, name="proj")(f16)
        up32 = jax.image.resize(
            f32, (B, h16, w16, f32.shape[-1]), method="bilinear"
        )
        src_32 = ConvGN(self.d_model, kernel=1, dtype=self.dtype, name="upsample")(up32)
        src_8 = ConvGN(self.d_model, kernel=3, stride=2, dtype=self.dtype, name="downsample")(f8)
        src = (src_8 + src_16 + src_32) / 3

        src = ConvGN(self.d_model, kernel=3, dtype=self.dtype, name="depth_head_0")(src)
        src = nn.relu(src)
        src = ConvGN(self.d_model, kernel=3, dtype=self.dtype, name="depth_head_1")(src)
        src = nn.relu(src)

        depth_logits = nn.Conv(
            self.num_depth_bins + 1, (1, 1), dtype=self.dtype, name="depth_classifier"
        )(src).astype(jnp.float32)

        bin_values = jnp.asarray(
            lid_bin_values(self.num_depth_bins, self.depth_min, self.depth_max)
        )
        depth_probs = nn.softmax(depth_logits, axis=-1)
        weighted_depth = (depth_probs * bin_values).sum(-1)  # [B, h16, w16]

        tokens = src.reshape(B, h16 * w16, C)
        pos_tokens = pos_16.reshape(B, h16 * w16, C)
        depth_embed = DepthEncoderLayer(dtype=self.dtype, name="depth_encoder")(
            tokens, pos_tokens, deterministic=deterministic
        )

        # learned 1-D depth positional embedding, lerped at predicted depth
        table = self.param(
            "depth_pos_embed",
            nn.initializers.normal(1.0),
            (int(self.depth_max) + 1, 256),
        )
        d = jnp.clip(weighted_depth, 0.0, self.depth_max)
        depth_pos_embed_ip = interpolate_1d_embed(d, table).reshape(B, h16 * w16, C)
        depth_pos_embed_ip = depth_pos_embed_ip.astype(self.dtype)
        depth_embed = depth_embed + depth_pos_embed_ip

        return depth_logits, depth_embed, weighted_depth, depth_pos_embed_ip
