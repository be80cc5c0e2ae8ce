"""On-device graph operations (pure JAX, MXU-friendly).

The coarsened MANO graphs are tiny (63..1008 nodes), so the TPU-native
formulation of "sparse" graph convolution is a *dense* Laplacian matmul:
at these sizes a dense (V, V) x (V, B*F) product is a single MXU pass and
beats any gather-based sparse kernel.

Parity targets in the reference:
  * `graph_conv_cheby` (`models/model_zoo/graph_utils.py:57-92`).
  * pooling/upsampling over the binary-tree layout
    (`graph_utils.py:25-54`), where pooling of size p is a stride-p window
    reduce and upsampling is nearest-neighbour repetition.
  * `GCN_vert_convert` index permutations (`models/model_zoo/__init__.py:85-96`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cheby_conv(
    x: jax.Array,
    laplacian: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    k: int = 2,
) -> jax.Array:
    """K-order Chebyshev graph convolution on a dense rescaled Laplacian.

    Args:
      x: (B, V, Fin) vertex features.
      laplacian: (V, V) dense Laplacian rescaled to spectrum [-1, 1].
      weight: (Fin * K, Fout) mixing matrix. The basis layout matches the
        reference (`graph_utils.py:84-89`): features of basis k are
        interleaved as x[..., fin, k] flattened to fin * K.
      bias: optional (Fout,).
      k: Chebyshev order (reference default graph_k = 2).

    Returns:
      (B, V, Fout).
    """
    bases = [x]
    if k > 1:
        x1 = jnp.einsum("vw,bwf->bvf", laplacian, x)
        bases.append(x1)
        x0 = x
        for _ in range(2, k):
            x2 = 2.0 * jnp.einsum("vw,bwf->bvf", laplacian, x1) - x0
            bases.append(x2)
            x0, x1 = x1, x2
    # (B, V, Fin, K) -> (B, V, Fin*K): matches torch's view of
    # x.permute(3,1,2,0) -> [B*V, Fin*K] layout.
    stacked = jnp.stack(bases, axis=-1)
    b, v, fin, kk = stacked.shape
    out = stacked.reshape(b, v, fin * kk) @ weight
    if bias is not None:
        out = out + bias
    return out


def graph_pool_avg(x: jax.Array, p: int) -> jax.Array:
    """Average-pool vertices in binary-tree order. x: (B, V, F) -> (B, V/p, F)."""
    if p <= 1:
        return x
    b, v, f = x.shape
    return x.reshape(b, v // p, p, f).mean(axis=2)


def graph_pool_max(x: jax.Array, p: int) -> jax.Array:
    """Max-pool vertices in binary-tree order."""
    if p <= 1:
        return x
    b, v, f = x.shape
    return x.reshape(b, v // p, p, f).max(axis=2)


def graph_upsample(x: jax.Array, p: int) -> jax.Array:
    """Nearest-neighbour vertex upsample: each node spawns p children."""
    if p <= 1:
        return x
    b, v, f = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, v, p, f)).reshape(b, v * p, f)


def vert_to_gcn(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Mesh-vertex order -> padded GCN layout. x: (B, 778, F) -> (B, N, F)."""
    return x[:, perm]


def gcn_to_vert(x: jax.Array, perm_reverse: jax.Array) -> jax.Array:
    """Padded GCN layout -> mesh-vertex order. x: (B, N, F) -> (B, 778, F)."""
    return x[:, perm_reverse]
