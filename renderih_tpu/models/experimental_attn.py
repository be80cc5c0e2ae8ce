"""Experimental cross-hand attention variants (flax.linen).

Parity targets (SURVEY 2.2 "Point transformer / linear cross-attn"):

* `PointAttn` / `InterPoint` — position-aware inter-hand attention with
  learned per-vertex position embeddings and a per-head MLP attention
  score (reference `common/myhand/model_attn/point_transformer.py:10-129`).
* `LinearCrossAttention` — O(V) linear cross-hand attention where each
  hand is modulated by a global context vector of the other
  (reference `common/myhand/model_attn/new_cattention.py:33-98`).

Neither module is used by the flagship dual-graph decoder; they are the
reference's exploratory alternatives to `InterAttn`. We reproduce their
computation — including two deliberate quirks, flagged inline — so the
capability surface matches.

TPU notes: the pairwise (B, V, V, F) tensors in `PointAttn` are small
(V ≤ 252), so the whole block lowers to a handful of batched matmuls and
an elementwise MLP that XLA fuses; no custom kernel is warranted. The
grouped 1x1 conv of the reference is expressed as a per-head einsum,
which is the same contraction without the NCHW reshuffle.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.models.attention import MlpResBlock, SelfAttn

_LN_EPS = 1e-6


class PointAttn(nn.Module):
    """One direction of position-aware cross-hand attention.

    Reference `point_transformer.py:10-96` (`Pointatt`). Queries come from
    the destination hand, keys from the source hand, and — reference
    quirk #1 — *values also come from the destination hand* (`left_vs(Lf)`,
    `point_transformer.py:70`); the source hand only shapes the attention
    pattern. Quirk #2: the score softmax normalizes over the *query* axis
    (`sim.softmax(dim=-2)`, `:86`) while the aggregation sums over the key
    axis (`:92`), so weights are not a distribution over keys. Both are
    kept verbatim for parity.
    """

    f_dim: int
    n_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lf, rf, left_pos, right_pos, deterministic: bool = True):
        b, v, f = lf.shape
        h = self.n_heads
        d = f // h

        # Relative position embedding from learned per-vertex positions:
        # pos_mlp(left_pos_i - right_pos_j) -> (B, V, V, F).
        rel = left_pos[:, :, None, :] - right_pos[:, None, :, :]
        rel = nn.Dense(2 * f, dtype=self.dtype, name="pos_mlp1")(rel)
        rel = nn.Dense(f, dtype=self.dtype, name="pos_mlp2")(nn.relu(rel))
        rel = jnp.broadcast_to(rel, (b, v, v, f)).reshape(b, v, v, h, d)

        q = nn.Dense(f, dtype=self.dtype, name="left_qs")(lf).reshape(b, v, h, d)
        val = nn.Dense(f, dtype=self.dtype, name="left_vs")(lf).reshape(b, v, h, d)
        k = nn.Dense(f, dtype=self.dtype, name="right_ks")(rf).reshape(b, v, h, d)

        # (B, Vq, Vk, H, D) pairwise query-key differences + rel pos.
        qk_rel = q[:, :, None] - k[:, None, :]
        score_in = qk_rel + rel
        # Per-head MLP score (grouped 1x1 conv in the reference,
        # `point_transformer.py:46-50`): D -> 2D -> D within each head.
        w1 = self.param("attn_mlp_w1", nn.initializers.lecun_normal(),
                        (h, d, 2 * d))
        b1 = self.param("attn_mlp_b1", nn.initializers.zeros, (h, 2 * d))
        w2 = self.param("attn_mlp_w2", nn.initializers.lecun_normal(),
                        (h, 2 * d, d))
        b2 = self.param("attn_mlp_b2", nn.initializers.zeros, (h, d))
        hmid = nn.relu(
            jnp.einsum("bijhd,hde->bijhe", score_in, w1.astype(score_in.dtype))
            + b1.astype(score_in.dtype)
        )
        sim = (
            jnp.einsum("bijhe,hed->bijhd", hmid, w2.astype(hmid.dtype))
            + b2.astype(hmid.dtype)
        )

        attn = jax.nn.softmax(sim, axis=1)  # over queries — quirk #2
        # Values are broadcast over the query axis and indexed by the key
        # axis (`repeat(Lv, 'b h j d -> b h i j d')`, `:72-74`), plus the
        # relative position embedding; aggregation sums over keys.
        vmat = val[:, None, :] + rel
        agg = jnp.einsum("bijhd,bijhd->bihd", attn, vmat).reshape(b, v, f)
        agg = nn.Dropout(self.dropout)(agg, deterministic=deterministic)
        return MlpResBlock(2 * f, self.dropout, self.dtype, name="ffL")(
            lf + agg, deterministic
        )


class InterPoint(nn.Module):
    """Position-aware inter-hand block (`point_transformer.py:98-129`).

    Per-hand self-attention, then sequential cross updates: the left hand
    attends to the right, and the right hand attends to the *updated*
    left (the reference passes the new `Lf` into `right_trans`, `:128`).
    """

    f_dim: int
    verts_num: int
    n_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lf, rf, deterministic: bool = True):
        b = lf.shape[0]
        lf = SelfAttn(self.f_dim, self.n_heads, self.f_dim, self.dropout,
                      self.dtype, name="L_self_attn")(lf, deterministic)
        rf = SelfAttn(self.f_dim, self.n_heads, self.f_dim, self.dropout,
                      self.dtype, name="R_self_attn")(rf, deterministic)

        left_pos = self.param("left_pos", nn.initializers.zeros,
                              (1, self.verts_num, self.f_dim))
        right_pos = self.param("right_pos", nn.initializers.zeros,
                               (1, self.verts_num, self.f_dim))
        lp = jnp.broadcast_to(left_pos, (b, self.verts_num, self.f_dim))
        rp = jnp.broadcast_to(right_pos, (b, self.verts_num, self.f_dim))

        lf = PointAttn(self.f_dim, self.n_heads, self.dropout, self.dtype,
                       name="left_trans")(lf, rf, lp, rp, deterministic)
        rf = PointAttn(self.f_dim, self.n_heads, self.dropout, self.dtype,
                       name="right_trans")(rf, lf, rp, lp, deterministic)
        return lf, rf


class _SiluBlock(nn.Module):
    """`MyBlock` (`new_cattention.py:7-29`): LN -> SiLU -> 4x MLP.

    Note it is *not* residual — the caller adds its own skip terms before
    invoking it, and the block's output replaces the stream.
    """

    latent_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.silu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(4 * self.latent_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.latent_dim, dtype=self.dtype, name="fc2")(x)


class LinearCrossAttention(nn.Module):
    """Linear-complexity cross-hand attention (`new_cattention.py:33-98`).

    Each hand pools a global context vector — softmax over its own vertex
    scores times its keys, summed over vertices — and the other hand's
    values are modulated by it: O(V·F) instead of O(V²·F).
    """

    latent_dim: int
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lf, rf, deterministic: bool = True):
        f = self.latent_dim
        lf = SelfAttn(f, self.n_heads, 4 * f, self.dropout, self.dtype,
                      name="L_self_attn")(lf, deterministic)
        rf = SelfAttn(f, self.n_heads, 4 * f, self.dropout, self.dtype,
                      name="R_self_attn")(rf, deterministic)

        lf2 = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm1")(lf)
        rf2 = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm2")(rf)

        lq = nn.Dense(1, dtype=self.dtype, name="l_qs")(lf2)   # (B, V, 1)
        lk = nn.Dense(f, dtype=self.dtype, name="l_ks")(lf2)
        lv = nn.Dense(f, dtype=self.dtype, name="l_vs")(lf2)
        rq = nn.Dense(1, dtype=self.dtype, name="r_qs")(rf2)
        rk = nn.Dense(f, dtype=self.dtype, name="r_ks")(rf2)
        rv = nn.Dense(f, dtype=self.dtype, name="r_vs")(rf2)

        ctx_l = jnp.sum(jax.nn.softmax(lq, axis=1) * lk, axis=1,
                        keepdims=True)  # (B, 1, F)
        ctx_r = jnp.sum(jax.nn.softmax(rq, axis=1) * rk, axis=1, keepdims=True)

        lf = _SiluBlock(f, self.dropout, self.dtype, name="ffL")(
            rv * ctx_l + lf, deterministic)
        rf = _SiluBlock(f, self.dropout, self.dtype, name="ffR")(
            lv * ctx_r + rf, deterministic)
        return lf, rf
