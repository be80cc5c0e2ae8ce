"""Fused multi-head attention Pallas kernel for short token streams.

The decoder's attention operands are small (63..316 tokens, head dim
<= 128): the whole (N, D) Q/K/V set for one (batch, head) pair fits in
VMEM, so one kernel program computes logits + softmax + value-mix without
ever materializing the (N, M) attention matrix in HBM. This removes the
HBM round-trips XLA would otherwise spend between the two matmuls and the
softmax at small N (where the attention matrix is too small to amortize
fusion heuristics).

Numerics match `models/attention.py:_mha` (same max-subtracted softmax);
tests compare both paths. Dropout is not applied inside the kernel — the
training path uses the XLA implementation; this kernel serves inference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (N, D)
    k = k_ref[0]  # (M, D)
    v = v_ref[0]  # (M, D)
    # Static head dim -> Python-constant scale (Mosaic cannot legalize
    # math.sqrt on bf16 operands).
    scale = jnp.asarray(1.0 / (q.shape[-1] ** 0.5), q.dtype)
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_mha(
    q: jax.Array,  # (B, N, H, D)
    k: jax.Array,  # (B, M, H, D)
    v: jax.Array,  # (B, M, H, D)
    interpret: bool = False,
) -> jax.Array:
    """Fused attention: returns (B, N, H*D) like `_mha`."""
    b, n, h, d = q.shape
    m = k.shape[1]
    # (B*H, N, D) layout: one grid step per (batch, head).
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)

    out = pl.pallas_call(
        _mha_kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * m * d * 2,
            bytes_accessed=4 * (b * h * (n * d + 2 * m * d + n * d)),
            transcendentals=b * h * n * m,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, h * d)
