"""HRNet encoder family (flax.linen, NHWC).

Functional equivalent of the reference HRNet
(`common/myhand/model_zoo/hrnet.py` + `HRnet_encoder`/`hrnet_mid`,
`common/myhand/encoder_lijun.py:149-325`): stem (two stride-2 convs) ->
Bottleneck stage1 -> three multi-resolution stages of BasicBlock branches
with full cross-resolution fusion. The encoder returns the 4-branch
pyramid coarsest-first (matching the reference's `ylist.reverse()`), and
`HRNetMid` adds the classification-style head (incre + downsample +
final 1x1 to 2048) for the global feature plus per-scale projections.

Standard widths: w18 (18,36,72,144), w32, w48, w64.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from renderih_tpu.models.resnet import BasicBlock, Bottleneck

_WIDTHS = {
    "hrnet_w18": 18,
    "hrnet_w32": 32,
    "hrnet_w48": 48,
    "hrnet_w64": 64,
}

# (num_modules, num_blocks) per stage 2..4, standard HRNet recipe.
_STAGES = ((1, 4), (4, 4), (3, 4))


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        h = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=pad, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        h = _bn(train, self.dtype, "bn")(h)
        return nn.relu(h) if self.relu else h


class _HRModule(nn.Module):
    """One multi-resolution module: per-branch blocks + full fusion."""

    widths: tuple
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.widths)
        # per-branch BasicBlocks
        ys = []
        for i, x in enumerate(xs):
            h = x
            for b in range(self.num_blocks):
                h = BasicBlock(self.widths[i], 1, self.dtype,
                               name=f"branch{i}_block{b}")(h, train)
            ys.append(h)

        # full fusion: out_i = relu(sum_j fuse_{j->i}(y_j))
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    f = ys[j]
                elif j > i:
                    # upsample lower-res branch: 1x1 conv + nearest x2^(j-i)
                    f = nn.Conv(self.widths[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"fuse{j}to{i}_conv")(ys[j])
                    f = _bn(train, self.dtype, f"fuse{j}to{i}_bn")(f)
                    scale = 2 ** (j - i)
                    f = jnp.repeat(jnp.repeat(f, scale, axis=1), scale, axis=2)
                else:
                    # downsample higher-res branch via stride-2 3x3 convs
                    f = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        width = self.widths[i] if last else self.widths[j]
                        f = nn.Conv(width, (3, 3), (2, 2), padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"fuse{j}to{i}_conv{k}")(f)
                        f = _bn(train, self.dtype, f"fuse{j}to{i}_bn{k}")(f)
                        if not last:
                            f = nn.relu(f)
                acc = f if acc is None else acc + f
            outs.append(nn.relu(acc))
        return outs


class HRNetEncoder(nn.Module):
    """HRNet trunk. Returns the 4-scale pyramid coarsest-first."""

    model_type: str = "hrnet_w32"
    dtype: Any = jnp.float32

    @property
    def pyramid_dims(self) -> tuple:
        w = _WIDTHS[self.model_type]
        return (8 * w, 4 * w, 2 * w, w)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = _WIDTHS[self.model_type]
        widths = [w, 2 * w, 4 * w, 8 * w]

        # stem: two stride-2 3x3 convs -> 1/4 resolution
        h = _ConvBNRelu(64, 3, 2, dtype=self.dtype, name="stem1")(x, train)
        h = _ConvBNRelu(64, 3, 2, dtype=self.dtype, name="stem2")(h, train)

        # stage 1: 4 Bottlenecks at width 64 (output 256 channels)
        for i in range(4):
            h = Bottleneck(64, 1, self.dtype, name=f"layer1_{i}")(h, train)

        # transition into 2 branches
        xs = [
            _ConvBNRelu(widths[0], 3, 1, dtype=self.dtype,
                        name="trans1_0")(h, train),
            _ConvBNRelu(widths[1], 3, 2, dtype=self.dtype,
                        name="trans1_1")(h, train),
        ]

        for stage, (num_modules, num_blocks) in enumerate(_STAGES):
            n_branches = stage + 2
            for m in range(num_modules):
                xs = _HRModule(tuple(widths[:n_branches]), num_blocks,
                               self.dtype, name=f"stage{stage + 2}_m{m}")(
                                   xs, train)
            if n_branches < 4:
                # new branch from the lowest-resolution one
                xs = xs + [
                    _ConvBNRelu(widths[n_branches], 3, 2, dtype=self.dtype,
                                name=f"trans{stage + 2}_{n_branches}")(
                                    xs[-1], train)
                ]
        return xs[::-1]  # coarsest first


class HRNetMid(nn.Module):
    """Global 2048-d feature + per-scale projections (`hrnet_mid`)."""

    out_dims: tuple = (256, 256, 256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, train: bool = False):
        # per-scale conv1x1 -> ReLU -> BN projections (same order quirk as
        # resnet_mid)
        fmaps = []
        for i, out_dim in enumerate(self.out_dims):
            h = nn.Conv(out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"proj{i}_conv")(pyramid[i])
            h = nn.relu(h)
            h = _bn(train, self.dtype, f"proj{i}_bn")(h)
            fmaps.append(h)

        # classification head over finest->coarsest: incre (Bottleneck to
        # 128/256/512/1024) + stride-2 downsample chain + final 1x1 -> 2048
        finest_first = pyramid[::-1]
        head_widths = (32, 64, 128, 256)
        y = Bottleneck(head_widths[0], 1, self.dtype, name="incre0")(
            finest_first[0], train)
        for i in range(3):
            y_next = Bottleneck(head_widths[i + 1], 1, self.dtype,
                                name=f"incre{i + 1}")(finest_first[i + 1], train)
            down = nn.Conv(head_widths[i + 1] * 4, (3, 3), (2, 2), padding=1,
                           dtype=self.dtype, name=f"down{i}_conv")(y)
            down = _bn(train, self.dtype, f"down{i}_bn")(down)
            y = y_next + nn.relu(down)
        y = nn.Conv(2048, (1, 1), dtype=self.dtype, name="final_conv")(y)
        y = _bn(train, self.dtype, "final_bn")(y)
        y = nn.relu(y)
        global_feature = jnp.mean(y, axis=(1, 2))
        return global_feature, fmaps
