"""Positional encodings.

Sine encoding is a compile-time constant here: input shapes are fixed
(384x1280 warp, kitti_dataset.py:32 in the reference), masks are always
all-valid (backbone.py:88), so the reference's cumsum-over-not-mask
(position_encoding.py:41-55) reduces to a static table we precompute in
numpy.  The learned 50x50 variant keeps parameters.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.utils import sine_position_encoding


def sine_pos_table(h, w, hidden_dim):
    """[h, w, hidden_dim] static sine position table (normalize=True)."""
    return jnp.asarray(sine_position_encoding(h, w, num_pos_feats=hidden_dim // 2))


class LearnedPositionEmbedding(nn.Module):
    """50x50 learned grid, bilinearly interpolated — reference
    position_encoding.py:59-86."""

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, h, w):
        row = self.param("row_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats))

        def interp(table, coord):
            floor_c = jnp.floor(coord)
            delta = (coord - floor_c)[:, None]
            f = floor_c.astype(jnp.int32)
            c = jnp.clip(f + 1, None, 49)
            return table[f] * (1 - delta) + table[c] * delta

        i = jnp.arange(w) / w * 49
        j = jnp.arange(h) / h * 49
        x_emb = interp(col, i)  # [w, F]
        y_emb = interp(row, j)  # [h, F]
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_emb[None, :, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(y_emb[:, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return pos
