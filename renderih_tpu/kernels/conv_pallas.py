"""Pallas implicit-GEMM 3x3 convolution for the encoder trunk.

Motivation (round-4 probe, tools/probe_conv_pallas.py on v5e): XLA's
`lax.conv_general_dilated` runs the flagship's stride-1 3x3 convs at
~25-30% MXU; this kernel reaches ~1.2x that on the most time-weighted
resnet50 shape (bs256, 16^2 x 256ch, bf16) by casting the conv as nine
shifted (tile_b*H*W, Cin) x (Cin, Cout) MXU contractions over a haloed
VMEM-resident input tile, accumulated in f32.

Scope: stride 1, SAME (1,1) padding, NHWC, any Cin/Cout — the shape
class of every non-downsampling 3x3 in the ResNet trunk
(reference conv trunk: `common/myhand/encoder_lijun.py:62-104`,
torchvision BasicBlock/Bottleneck). Strided and non-3x3 convs stay on
XLA, which is already optimal for the 1x1 (pure GEMM) convs.

Gradients: the op is linear in (x, w), so `jax.vjp` over the XLA
reference conv gives exact transposes (dx = conv^T(g, w),
dw = conv(x, g)) with the unused primal DCE'd — training through this
kernel pays XLA-conv backward, identical to the unfused trunk.

Enablement mirrors `kernels/fused_attention.py`: a process-global
toggle consulted at TRACE time (`set_pallas_conv(True)` /
`BENCH_PALLAS_CONV=1`), plus the `model.pallas_conv` config knob wired
through the encoders.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = os.environ.get("BENCH_PALLAS_CONV", "") == "1"

# Scoped VMEM budget per core on v5e is 16 MB; leave headroom for
# double-buffered pipelining of the input/output tiles.
_VMEM_BUDGET = 10 * 1024 * 1024


def set_pallas_conv(enabled: bool) -> None:
    """Route eligible 3x3 convs through the Pallas kernel (trace-time)."""
    global _ENABLED
    _ENABLED = enabled


def pallas_conv_enabled() -> bool:
    return _ENABLED


def _vmem_bytes(tile_b: int, h: int, w: int, cin: int, cout: int,
                itemsize: int) -> int:
    x_tile = tile_b * (h + 2) * (w + 2) * cin * itemsize
    w_tile = 9 * cin * cout * itemsize
    o_tile = tile_b * h * w * cout * itemsize
    acc = tile_b * h * w * cout * 4
    # in/out tiles are double-buffered by the pipeline; weights are not
    # (same block every grid step).
    return 2 * (x_tile + o_tile) + w_tile + acc


def _pick_tile_b(b: int, h: int, w: int, cin: int, cout: int,
                 itemsize: int) -> int | None:
    for tile_b in (32, 16, 8, 4, 2, 1):
        if b % tile_b:
            continue
        if _vmem_bytes(tile_b, h, w, cin, cout, itemsize) <= _VMEM_BUDGET:
            return tile_b
    return None


# Shape classes where the kernel MEASURED faster than XLA's conv on v5e
# at bs256 (tools/probe_conv_pallas.py, round 4): keyed (spatial, cin)
# per dtype. layer1 (64^2 x 64ch: halo overhead + half-lane channels)
# and bf16 layer4 (8^2 x 512: 1.56x halo read amplification) measured
# 0.26-0.49x — those stay on XLA.
_WINNERS = {
    jnp.dtype(jnp.bfloat16): {(32, 128), (16, 256)},   # 1.12x / 1.15x
    jnp.dtype(jnp.float32): {(16, 256), (8, 512)},     # 1.22x / 1.10x
}


def conv3x3_eligible(x: jax.Array, kernel: jax.Array,
                     strides: tuple, padding) -> bool:
    """True when (x, kernel, strides, padding) is the supported stride-1
    SAME 3x3 class, the shape class measured faster than XLA, AND a
    VMEM-feasible tiling exists."""
    if kernel.ndim != 4 or kernel.shape[:2] != (3, 3):
        return False
    if tuple(strides) != (1, 1):
        return False
    if padding not in ("SAME", ((1, 1), (1, 1)), [(1, 1), (1, 1)], 1):
        return False
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    if (h, cin) not in _WINNERS.get(jnp.dtype(x.dtype), set()):
        return False
    # enough GEMM rows to feed the MXU (bs1-style latency shapes lose)
    if b * h * w < 8192:
        return False
    return _pick_tile_b(b, h, w, cin, cout, x.dtype.itemsize) is not None


def _kernel(x_ref, w_ref, o_ref, acc_ref, *, h: int, w: int):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            win = x_ref[:, dy:dy + h, dx:dx + w, :]
            acc_ref[:] += jax.lax.dot_general(
                win, w_ref[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pallas_conv3x3(x: jax.Array, kernel: jax.Array,
                    interpret: bool = False) -> jax.Array:
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    tile_b = _pick_tile_b(b, h, w, cin, cout, x.dtype.itemsize)
    assert tile_b is not None, "caller must gate on conv3x3_eligible"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flops = 2 * b * h * w * cin * 9 * cout
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, h + 2, w + 2, cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, h, w, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_b, h, w, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + kernel.size) * x.dtype.itemsize
            + b * h * w * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, kernel)


def _xla_conv3x3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 SAME 3x3 conv (NHWC, HWIO) through the Pallas kernel."""
    return _pallas_conv3x3(x, kernel)


def _fwd(x, kernel):
    return _pallas_conv3x3(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    # conv is linear in (x, w): the vjp of the XLA conv is the exact
    # transpose pair; the unused primal is DCE'd by XLA.
    _, vjp = jax.vjp(_xla_conv3x3, x, kernel)
    return vjp(g)


conv3x3_same.defvjp(_fwd, _bwd)
