"""ResNet encoder family (flax.linen, NHWC).

Functionally equivalent to the torchvision trunks used by the reference
encoder (`common/myhand/encoder_lijun.py:62-104`): conv1/bn/relu/maxpool +
four stages, returning the 4-scale pyramid [C5, C4, C3, C2] =
[(8,8,2048), (16,16,1024), (32,32,512), (64,64,256)] for a 256^2 input
(resnet50). Layer naming is chosen so a torch state_dict maps 1:1 through
`renderih_tpu/utils/checkpoint_convert.py`.

TPU notes: NHWC layout (XLA-native), bf16 conv compute with f32 params and
f32 batch-norm statistics via the `dtype` argument.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.kernels.conv_pallas import (
    conv3x3_eligible,
    conv3x3_same,
    pallas_conv_enabled,
)


class Conv3x3(nn.Module):
    """Drop-in for `nn.Conv(features, (3, 3), stride, padding=1)` that
    routes through the Pallas implicit-GEMM kernel when enabled and the
    shape is eligible (stride 1, VMEM-feasible tile). Same param name
    ("kernel"), shape, init, and dtype promotion as nn.Conv, so
    checkpoints and the torch converter are unaffected."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        strides = (self.stride, self.stride)
        if (pallas_conv_enabled() and self.stride == 1
                and conv3x3_eligible(x, k, strides, "SAME")):
            return conv3x3_same(x, k)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=strides, padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


_STAGES = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    width: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        h = Conv3x3(self.width, self.stride, self.dtype, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = Conv3x3(self.width, 1, self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.width:
            identity = nn.Conv(self.width, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out_dim = self.width * self.expansion
        identity = x
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = Conv3x3(self.width, self.stride, self.dtype, name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = bn("bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_dim:
            identity = nn.Conv(out_dim, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    """ResNet trunk returning the 4-scale pyramid, coarsest first."""

    model_type: str = "resnet50"
    dtype: Any = jnp.float32
    remat: bool = False

    @property
    def expansion(self) -> int:
        return 4 if _STAGES[self.model_type][0] == "bottleneck" else 1

    @property
    def pyramid_dims(self) -> tuple:
        e = self.expansion
        return (512 * e, 256 * e, 128 * e, 64 * e)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, counts = _STAGES[self.model_type]
        block_cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
        if self.remat:
            # rematerialize each residual block in the backward pass:
            # trades ~1.33x conv FLOPs for activation memory (A/B knob,
            # tools/bench_train_profile.py BENCH_REMAT=1)
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        h = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        for stage, num_blocks in enumerate(counts):
            width = 64 * (2**stage)
            for i in range(num_blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                h = block_cls(width, stride, self.dtype,
                              name=f"layer{stage + 1}_{i}")(h, train)
            feats.append(h)
        # coarsest-first: [C5, C4, C3, C2]
        return feats[::-1]


class AuxDecoderHead(nn.Module):
    """Coarse fmap -> dense prediction (heatmaps / mask / densepose).

    Mirrors `ResNetSimple_decoder` (`models/encoder.py:16-59`): flat 1x1
    conv then three (bilinear-2x-upsample + 3x3 conv + ReLU + BN) stages
    (8 -> 64 px for a 256^2 input), then a 1x1 projection to `out_dim`.
    Used for the 21x2-channel joint heatmaps and the 1+3x2-channel
    mask+densepose heads (`models/encoder.py:176-242`). Off by default in
    the flagship recipe, matching `core/Loss.py:210-211`.
    """

    out_dim: int
    width: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="flat_conv")(x)
        h = bn("flat_bn")(nn.relu(h))
        for i in range(3):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "bilinear")
            h = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"up{i}_conv")(h)
            h = bn(f"up{i}_bn")(nn.relu(h))
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                       name="final")(h)


class ResNetMid(nn.Module):
    """Pyramid -> per-scale 1x1-projected fmaps + 2048-d global feature.

    Mirrors `resnet_mid` (`encoder_lijun.py:107-146`): the global feature
    is a GAP of the raw coarsest map; each scale goes through
    conv1x1 -> ReLU -> BatchNorm (activation *before* BN, matching the
    reference `conv1x1` helper, `models/model_zoo/__init__.py:56-62`).
    """

    out_dims: tuple = (256, 256, 256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, train: bool = False):
        global_feature = jnp.mean(pyramid[0], axis=(1, 2))
        fmaps = []
        for i, out_dim in enumerate(self.out_dims):
            h = nn.Conv(out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"proj{i}_conv")(pyramid[i])
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"proj{i}_bn")(h)
            fmaps.append(h)
        return global_feature, fmaps
