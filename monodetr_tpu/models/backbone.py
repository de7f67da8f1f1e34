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
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            (7, 7, cin, self.features),
        )
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * cin, self.features)

        B, H, W, C = x.shape
        assert H % 2 == 0 and W % 2 == 0, "stem needs even input dims"
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        import jax.lax as lax

        return lax.conv_general_dilated(
            xs.astype(self.dtype), k4.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class FrozenBN(nn.Module):
    """Per-channel affine with constant (non-trained) scale/bias."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


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
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBN(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBN(name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBN(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBN(name="downsample_bn")(identity)
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
        x = StemConv(64, dtype=self.dtype, name="conv1")(x)
        x = FrozenBN(name="bn1")(x)
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
