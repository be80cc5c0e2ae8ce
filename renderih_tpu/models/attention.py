"""Attention blocks of the dual-graph decoder (flax.linen).

Three flavours, matching the reference decoder's token mixing:
  * `SelfAttn` — pre-norm MHA + MLP residual block
    (`common/myhand/model_attn/self_attn.py:36-85`).
  * `InterAttn` — cross-hand attention where Q/K come from the *sum* of
    left and right features and V is per-hand
    (`common/myhand/model_attn/inter_attn_lijun.py:38-125`).
  * `ImgEx` — image-grid tokens via strided-conv patchify + self-attention
    over concat([verts, grid]) (`common/myhand/model_attn/img_attn.py`).

Sequence lengths here are tiny (63..252 vertex tokens + 64 grid tokens),
so the attention matmuls are already MXU-shaped; we batch both hands and
all heads into single einsums and let XLA fuse softmax/scale. A fused
Pallas path for the concatenated token stream lives in
`renderih_tpu.kernels.fused_attention` and is enabled via `use_pallas`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_LN_EPS = 1e-6


class MlpResBlock(nn.Module):
    """x + Dropout(fc2(Dropout(relu(fc1(LN(x))))))."""

    hid_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype)(x)
        h = nn.relu(nn.Dense(self.hid_dim, dtype=self.dtype)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(dim, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


# Inference fast path: route attention through the Pallas fused kernel
# (renderih_tpu/kernels/fused_attention.py). Trace-time switch — flip it
# before jitting (e.g. `set_fused_attention(True)` in eval/bench scripts).
# Training keeps the XLA path (the kernel has no attention dropout).
_USE_PALLAS_ATTENTION = False


def set_fused_attention(enabled: bool) -> None:
    global _USE_PALLAS_ATTENTION
    _USE_PALLAS_ATTENTION = enabled


def _mha(q, k, v, n_heads: int, dropout: nn.Dropout | None = None,
         deterministic: bool = True):
    """Plain multi-head attention core. q/k: (B, N, H*Dq), v: (B, N, H*Dv)."""
    b, n, _ = q.shape
    m = k.shape[1]
    q = q.reshape(b, n, n_heads, -1)
    k = k.reshape(b, m, n_heads, -1)
    v = v.reshape(b, m, n_heads, -1)
    if _USE_PALLAS_ATTENTION and deterministic:
        from renderih_tpu.kernels.fused_attention import fused_mha

        return fused_mha(q, k, v)
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    if dropout is not None:
        attn = dropout(attn, deterministic=deterministic)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out.reshape(b, n, -1)


class SelfAttn(nn.Module):
    """Pre-norm self-attention + MLP residual block."""

    f_dim: int
    n_heads: int = 4
    hid_dim: int | None = None
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_head = self.f_dim // self.n_heads
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype)(x)
        q = nn.Dense(self.n_heads * d_head, dtype=self.dtype, name="w_qs")(h)
        k = nn.Dense(self.n_heads * d_head, dtype=self.dtype, name="w_ks")(h)
        v = nn.Dense(self.n_heads * d_head, dtype=self.dtype, name="w_vs")(h)
        attn_drop = nn.Dropout(self.dropout)
        out = _mha(q, k, v, self.n_heads, attn_drop, deterministic)
        out = nn.Dense(self.f_dim, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = x + out
        return MlpResBlock(self.hid_dim or self.f_dim, self.dropout,
                           self.dtype, name="ff")(x, deterministic)


class InterAttn(nn.Module):
    """Cross-hand attention.

    Each hand first runs its own `SelfAttn`; then a shared QKV projection
    is applied to LN(Lf + Rf) per hand, and the hands exchange information
    through softmax(Q K^T) V of the *other* hand's values, followed by
    per-hand MLP residual blocks. The Q/K/V projections and output fc are
    shared between directions (single `w_qs` etc. in the reference).
    """

    f_dim: int
    n_heads: int = 4
    dropout: float = 0.1
    paired: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lf, rf, deterministic: bool = True):
        if self.paired:
            # one lifted SelfAttn with a leading (2,) hand axis on params —
            # same math as L_self_attn/R_self_attn, batched execution
            PairSelf = nn.vmap(
                SelfAttn,
                in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
            )
            x = PairSelf(self.f_dim, self.n_heads, self.f_dim, self.dropout,
                         self.dtype, name="LR_self_attn")(
                             jnp.stack([lf, rf]), deterministic)
            lf, rf = x[0], x[1]
        else:
            lf = SelfAttn(self.f_dim, self.n_heads, self.f_dim, self.dropout,
                          self.dtype, name="L_self_attn")(lf, deterministic)
            rf = SelfAttn(self.f_dim, self.n_heads, self.f_dim, self.dropout,
                          self.dtype, name="R_self_attn")(rf, deterministic)

        d_head = self.f_dim // self.n_heads
        w_qs = nn.Dense(self.n_heads * d_head, dtype=self.dtype, name="w_qs")
        w_ks = nn.Dense(self.n_heads * d_head, dtype=self.dtype, name="w_ks")
        w_vs = nn.Dense(self.n_heads * d_head, dtype=self.dtype, name="w_vs")
        fc = nn.Dense(self.f_dim, dtype=self.dtype, name="fc")
        attn_drop = nn.Dropout(self.dropout)
        out_drop = nn.Dropout(self.dropout)

        # Both norms see the same sum; two LayerNorms kept for reference
        # checkpoint-layout parity (`inter_attn_lijun.py:79-80`).
        lf2 = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm1")(lf + rf)
        rf2 = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm2")(rf + lf)

        # attn_R2L: queries/keys from the left stream, values from right.
        feat_r2l = _mha(w_qs(lf2), w_ks(lf2), w_vs(rf2), self.n_heads,
                        attn_drop, deterministic)
        feat_l2r = _mha(w_qs(rf2), w_ks(rf2), w_vs(lf2), self.n_heads,
                        attn_drop, deterministic)

        feat_r2l = out_drop(fc(feat_r2l), deterministic=deterministic)
        feat_l2r = out_drop(fc(feat_l2r), deterministic=deterministic)

        lf = MlpResBlock(self.f_dim, self.dropout, self.dtype, name="ffL")(
            lf + feat_r2l, deterministic
        )
        rf = MlpResBlock(self.f_dim, self.dropout, self.dtype, name="ffR")(
            rf + feat_l2r, deterministic
        )
        return lf, rf


class ImgFeatToGrid(nn.Module):
    """Feature map (B, H, W, C) -> (B, grid*grid, grid_f_dim) tokens."""

    img_size: int
    grid_size: int
    grid_f_dim: int
    n_heads: int = 4
    dropout: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, deterministic: bool = True):
        patch = self.img_size // self.grid_size
        x = nn.Conv(
            self.grid_f_dim, (patch, patch), strides=(patch, patch),
            padding="VALID", dtype=self.dtype, name="proj",
        )(img)
        x = nn.relu(x)
        b = x.shape[0]
        x = x.reshape(b, self.grid_size * self.grid_size, self.grid_f_dim)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(stddev=0.02),
            (self.grid_size * self.grid_size, self.grid_f_dim),
        )
        x = x + pos.astype(x.dtype)
        return SelfAttn(self.grid_f_dim, self.n_heads, self.grid_f_dim,
                        self.dropout, self.dtype, name="self_attn")(
                            x, deterministic)


class ImgEx(nn.Module):
    """Inject image-grid tokens into vertex tokens.

    Grid tokens are projected to the vertex width, concatenated after the
    vertex tokens, run through one `SelfAttn`, and the vertex rows are
    kept (`img_attn.py:79-92`).
    """

    img_size: int
    grid_size: int
    grid_f_dim: int
    verts_f_dim: int
    n_heads: int = 4
    dropout: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, verts_f, deterministic: bool = True):
        grid = ImgFeatToGrid(
            self.img_size, self.grid_size, self.grid_f_dim,
            self.n_heads, self.dropout, self.dtype, name="encoder",
        )(img, deterministic)
        grid = nn.Dense(self.verts_f_dim, dtype=self.dtype,
                        name="grid_to_verts")(grid)
        n_verts = verts_f.shape[1]
        x = jnp.concatenate([verts_f.astype(grid.dtype), grid], axis=1)
        x = SelfAttn(self.verts_f_dim, self.n_heads, self.verts_f_dim,
                     self.dropout, self.dtype, name="attn")(x, deterministic)
        return x[:, :n_verts]
