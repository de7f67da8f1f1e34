"""ResNet-50/101 backbone with frozen batch-norm, NHWC, for TPU.

Capability parity with reference `lib/models/monodetr/backbone.py`:
  - torchvision-style ResNet bottleneck stacks (stem 7x7/2 + maxpool,
    layers 1-4 with strides 1/2/2/2), returning layer2/3/4 features at
    strides 8/16/32 with 512/1024/2048 channels (backbone.py:74-77).
  - FrozenBatchNorm2d (backbone.py:27-64): batch statistics and affine
    parameters fixed.  We fold (weight, bias, running_mean, running_var)
    into a single per-channel (scale, bias) at conversion time —
    scale = w / sqrt(rv + eps), bias = b - rm * scale — which is exactly
    the compute the reference does every forward (backbone.py:62-64).
  - Optional dilation of the last stage (stride 32 -> 16, backbone.py:101,106).
  - Frozen-parameter policy (backbone.py:71-73): the stem + layer1 never
    train; all FrozenBN scales/biases never train.  On TPU this is enforced
    by the optimizer mask (train/optimizer.py), not by the module.

Weight transfer from torchvision/reference checkpoints is handled by
`tools/convert_checkpoint.py`.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, computed as a 4x4/s1 conv on space-to-depth(2)
    input (the MLPerf-ResNet TPU stem transform).

    A 3-input-channel 7x7 conv leaves the MXU almost empty (K = 3 per tap);
    packing 2x2 pixel patches into channels gives an EXACTLY equivalent
    conv with 12 input channels and a 4x4 kernel:
        out[i,j] = sum_{u,v} W[u,v] x[2i+u-3, 2j+v-3]
                 = sum_{p,q,a,b} W8[2p+a, 2q+b] X[i+p-2, j+q-2, (a,b,:)]
    with W8 = W zero-padded by one row/col at the top-left.  The parameter
    keeps the reference's [7, 7, 3, 64] layout (checkpoint converters and
    from-scratch init are unchanged); the rearrangement happens at trace
    time on the weight (fused/constant-sized, never on activations)."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, bias=None):
        """Optional (scale, bias): a FrozenBN affine folded into the kernel
        (see FoldedConv) — applied in f32 on the weight, never on the
        activations."""
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            (7, 7, cin, self.features),
        )
        if scale is not None:
            k = k * scale[None, None, None, :]
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * cin, self.features)

        B, H, W, C = x.shape
        assert H % 2 == 0 and W % 2 == 0, "stem needs even input dims"
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        import jax.lax as lax

        out = lax.conv_general_dilated(
            xs.astype(self.dtype), k4.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


class FrozenBN(nn.Module):
    """Per-channel affine with constant (non-trained) scale/bias.

    With fold=True the call takes the channel COUNT and returns the raw
    (scale, bias) f32 params so the caller can fold them into the adjacent
    conv's weights (see FoldedConv) instead of running a separate
    elementwise pass over the activations.  Param paths/shapes are identical
    either way (checkpoint converters and the optimizer freeze mask match by
    the module name, e.g. `bn1/scale`)."""

    fold: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fold:
            # fold mode takes the CHANNEL COUNT (the caller folds scale/bias
            # into its conv weights), not an activation array
            assert isinstance(x, int), (
                "FrozenBN(fold=True) expects a channel count; pass the "
                "activation array only with fold=False")
        c = x if self.fold else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.fold:
            return scale, bias
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class FoldedConv(nn.Module):
    """nn.Conv(use_bias=False) with a FrozenBN affine folded into the kernel
    at trace time: conv(x, k * scale) + bias.

    The reference applies FrozenBN as an elementwise scale+bias on the
    activations every forward (backbone.py:62-64); since the affine is
    constant, it commutes into the conv weights — the multiply rides the
    (tiny) [kh, kw, cin, cout] kernel instead of a full-size VPU pass over
    [B, H, W, C] in forward AND the matching scale of the output gradient in
    backward.  Folding happens in f32 before the bf16 cast, so it is also
    (slightly) more precise than the post-conv bf16 affine it replaces.
    Param path matches nn.Conv (`<name>/kernel`, lecun_normal init)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Sequence[int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, scale, bias):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
        )
        k = (k * scale[None, None, None, :]).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k,
            tuple(self.strides),
            self.padding if isinstance(self.padding, str)
            else tuple(tuple(p) for p in self.padding),
            rhs_dilation=tuple(self.kernel_dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce -> 3x3 -> 1x1 expand (x4), residual."""

    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        s, b = FrozenBN(fold=True, name="bn1")(self.features)
        out = FoldedConv(self.features, (1, 1), dtype=self.dtype,
                         name="conv1")(x, s, b)
        out = nn.relu(out)
        s, b = FrozenBN(fold=True, name="bn2")(self.features)
        out = FoldedConv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            dtype=self.dtype,
            name="conv2",
        )(out, s, b)
        out = nn.relu(out)
        s, b = FrozenBN(fold=True, name="bn3")(self.features * 4)
        out = FoldedConv(self.features * 4, (1, 1), dtype=self.dtype,
                         name="conv3")(out, s, b)
        if self.downsample:
            s, b = FrozenBN(fold=True, name="downsample_bn")(self.features * 4)
            identity = FoldedConv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                name="downsample_conv",
            )(x, s, b)
        return nn.relu(out + identity)


STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class ResNetBackbone(nn.Module):
    """Returns (layer2, layer3, layer4) features, NHWC, strides 8/16/32."""

    name_or_depth: str = "resnet50"
    dilation: bool = False  # dilate last stage (stride 32 -> 16)
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize blocks (memory for compute)

    @nn.compact
    def __call__(self, x):
        blocks = STAGE_BLOCKS[self.name_or_depth]
        x = x.astype(self.dtype)
        stem_scale, stem_bias = FrozenBN(fold=True, name="bn1")(64)
        x = StemConv(64, dtype=self.dtype, name="conv1")(x, stem_scale,
                                                         stem_bias)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        width = 64
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.dilation:
                # torchvision replace_stride_with_dilation: first block keeps
                # dilation 1, later blocks dilate by the replaced stride.
                stride, dilation = 1, 2
            block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
            for b in range(blocks[stage]):
                x = block_cls(
                    features=width,
                    stride=stride if b == 0 else 1,
                    dilation=1 if b == 0 else dilation,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage == 0:
                # The stem + layer1 are permanently frozen (reference
                # backbone.py:71-73; enforced here by the optimizer mask,
                # train/optimizer.py:37-45).  Nothing upstream needs input
                # gradients either (the producer is the image), so the whole
                # stem/layer1 backward is dead compute — cut it at the
                # boundary.  Measured: ~20 ms/step at bs16 (layer1 dX chain
                # + conv1 bwd + maxpool select-and-scatter).
                x = jax.lax.stop_gradient(x)
            if stage >= 1:
                feats.append(x)
            width *= 2
        return tuple(feats)  # strides 8, 16, 32; channels 512, 1024, 2048


BACKBONE_NUM_CHANNELS = (512, 1024, 2048)
