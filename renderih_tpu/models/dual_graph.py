"""Dual-graph coarse-to-fine decoder trunk (flax.linen).

Three stages of per-hand vertex processing at 63 -> 126 -> 252 nodes:
positional embedding + GraphLayer (4 residual blocks) + image cross
attention + cross-hand attention, with nearest-neighbour vertex upsampling
between stages. Mirrors `DualGraph` in the reference
(`common/myhand/model_attn/DualGraph_lijun.py:89-207`).

Two block flavours (selected by `use_cheby`):
  * MLP residual blocks — the flagship configuration
    (`DualGraph_lijun.py:28-58`; the Laplacian is unused there).
  * Chebyshev graph-conv residual blocks — the legacy configuration
    (`common/myhand/model_attn/gcn.py:72-110`). Note the reference block
    computes relu(norm1(x)) and then *discards it*, convolving raw x; we
    reproduce that dataflow for checkpoint parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.graph.ops import cheby_conv, graph_upsample
from renderih_tpu.models.attention import ImgEx, InterAttn

_LN_EPS = 1e-6


class GcnResBlock(nn.Module):
    """Residual vertex block; MLP or Chebyshev flavour."""

    in_dim: int
    out_dim: int
    graph_k: int = 2
    dropout: float = 0.01
    use_cheby: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, laplacian=None, deterministic: bool = True):
        assert x.shape[-1] == self.in_dim
        if self.use_cheby:
            w1 = self.param(
                "cheby1_kernel", nn.initializers.xavier_uniform(),
                (self.in_dim * self.graph_k, self.out_dim),
            )
            b1 = self.param("cheby1_bias", nn.initializers.zeros, (self.out_dim,))
            w2 = self.param(
                "cheby2_kernel", nn.initializers.xavier_uniform(),
                (self.out_dim * self.graph_k, self.out_dim),
            )
            b2 = self.param("cheby2_bias", nn.initializers.zeros, (self.out_dim,))
            # Reference quirk: norm1 output is computed then dropped; the
            # first conv sees raw x (`gcn.py:103-104`).
            _ = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm1")(x)
            h = cheby_conv(x, laplacian.astype(x.dtype),
                           w1.astype(x.dtype), b1.astype(x.dtype),
                           k=self.graph_k)
            h = nn.relu(nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                                     name="norm2")(h))
            h = cheby_conv(h, laplacian.astype(h.dtype),
                           w2.astype(h.dtype), b2.astype(h.dtype),
                           k=self.graph_k)
        else:
            h = nn.relu(nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                                     name="norm1")(x))
            h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(h)
            h = nn.relu(nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                                     name="norm2")(h))
            h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        shortcut = nn.Dense(self.out_dim, dtype=self.dtype, name="shortcut")(x)
        return nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                            name="norm3")(h + shortcut)


class GraphLayer(nn.Module):
    """Stack of residual vertex blocks with inter-block ReLU."""

    in_dim: int
    out_dim: int
    graph_k: int = 2
    num_blocks: int = 4
    dropout: float = 0.01
    use_cheby: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, laplacian=None, deterministic: bool = True):
        for i in range(self.num_blocks):
            in_dim = self.in_dim if i == 0 else self.out_dim
            x = GcnResBlock(
                in_dim, self.out_dim, self.graph_k, self.dropout,
                self.use_cheby, self.dtype, name=f"block_{i}",
            )(x, laplacian, deterministic)
            if i != self.num_blocks - 1:
                x = nn.relu(x)
        return x


class DualGraphLayer(nn.Module):
    """One decoder stage: PE + per-hand GraphLayer + img attn + inter attn.

    With `paired=True` the two hands run through ONE lifted (nn.vmap)
    GraphLayer / ImgEx whose params carry a leading (2,) hand axis —
    mathematically identical to the separate left/right modules (see
    `renderih_tpu/utils/pair_params.py` for the param mapping), but the
    whole stage compiles to batched einsums instead of two copies of
    every op: fewer HLOs, larger fusions, less dispatch overhead at the
    decoder's tiny sequence lengths.
    """

    verts_num: int
    verts_in_dim: int
    verts_out_dim: int
    graph_k: int = 2
    num_blocks: int = 4
    img_size: int = 8
    grid_size: int = 8
    grid_f_dim: int = 128
    n_heads: int = 4
    dropout: float = 0.01
    use_cheby: bool = False
    paired: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lf, rf, img_f, lap_left=None, lap_right=None,
                 deterministic: bool = True):
        assert lf.shape[1] == self.verts_num and rf.shape[1] == self.verts_num
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(stddev=0.02),
            (self.verts_num, self.verts_in_dim),
        )
        lf = (lf + pos).astype(self.dtype)
        rf = (rf + pos).astype(self.dtype)

        if self.paired:
            x = jnp.stack([lf, rf])                     # (2, B, V, C)
            laps = None
            lap_axis = None
            if lap_left is not None:
                laps = jnp.stack([lap_left, lap_right])
                lap_axis = 0
            PairGraph = nn.vmap(
                GraphLayer,
                in_axes=(0, lap_axis, None), out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
            )
            x = PairGraph(
                self.verts_in_dim, self.verts_out_dim, self.graph_k,
                self.num_blocks, self.dropout, self.use_cheby, self.dtype,
                name="graph_pair",
            )(x, laps, deterministic)
            PairImgEx = nn.vmap(
                ImgEx,
                in_axes=(None, 0, None), out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
            )
            x = PairImgEx(
                self.img_size, self.grid_size, self.grid_f_dim,
                self.verts_out_dim, self.n_heads, self.dropout, self.dtype,
                name="img_ex_pair",
            )(img_f, x, deterministic)
            lf, rf = x[0], x[1]
        else:
            lf = GraphLayer(
                self.verts_in_dim, self.verts_out_dim, self.graph_k,
                self.num_blocks, self.dropout, self.use_cheby, self.dtype,
                name="graph_left",
            )(lf, lap_left, deterministic)
            rf = GraphLayer(
                self.verts_in_dim, self.verts_out_dim, self.graph_k,
                self.num_blocks, self.dropout, self.use_cheby, self.dtype,
                name="graph_right",
            )(rf, lap_right, deterministic)

            lf = ImgEx(self.img_size, self.grid_size, self.grid_f_dim,
                       self.verts_out_dim, self.n_heads, self.dropout,
                       self.dtype, name="img_ex_left")(img_f, lf, deterministic)
            rf = ImgEx(self.img_size, self.grid_size, self.grid_f_dim,
                       self.verts_out_dim, self.n_heads, self.dropout,
                       self.dtype, name="img_ex_right")(img_f, rf, deterministic)

        return InterAttn(self.verts_out_dim, self.n_heads, self.dropout,
                         paired=self.paired, dtype=self.dtype,
                         name="inter_attn")(lf, rf, deterministic)


class DualGraph(nn.Module):
    """Full 3-stage coarse-to-fine trunk with x2 upsampling between stages."""

    verts_nums: tuple            # e.g. (63, 126, 252)
    verts_in_dims: tuple         # e.g. (512, 256, 128)
    verts_out_dims: tuple        # e.g. (256, 128, 64)
    img_sizes: tuple             # e.g. (8, 16, 32)
    grid_f_dims: tuple           # e.g. (256, 128, 64)
    grid_size: int = 8
    graph_k: int = 2
    num_blocks: int = 4
    n_heads: int = 4
    dropout: float = 0.01
    use_cheby: bool = False
    paired: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lf, rf, img_f_list, laps_left=None, laps_right=None,
                 deterministic: bool = True):
        n = len(self.verts_in_dims)
        assert len(img_f_list) == n
        outs = []
        for i in range(n):
            lap_l = laps_left[i] if laps_left is not None else None
            lap_r = laps_right[i] if laps_right is not None else None
            lf, rf = DualGraphLayer(
                self.verts_nums[i], self.verts_in_dims[i], self.verts_out_dims[i],
                self.graph_k, self.num_blocks, self.img_sizes[i],
                self.grid_size, self.grid_f_dims[i], self.n_heads,
                self.dropout, self.use_cheby, self.paired, self.dtype,
                name=f"layer_{i}",
            )(lf, rf, img_f_list[i], lap_l, lap_r, deterministic)
            outs.append((lf, rf))
            if i != n - 1:
                lf = graph_upsample(lf, 2)
                rf = graph_upsample(rf, 2)
        return lf, rf, outs
