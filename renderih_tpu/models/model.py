"""Top-level two-hand network: encoder -> mid -> dual-graph decoder.

Equivalent of `HandNET_GCN` + `load_graph_model`
(`common/myhand/lijun_model_graph.py:18-70`). The network is one flax
module so a single params pytree covers the whole model; static assets
(PE, upsample init, Laplacians) are passed through `__call__` and treated
as compile-time constants under jit.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.assets import Assets
from renderih_tpu.config import Config
from renderih_tpu.models.decoder import DecoderOutput, GraphDecoder
from renderih_tpu.models.resnet import ResNet, ResNetMid


class HandNet(nn.Module):
    """Encoder + mid projection + two-hand graph decoder."""

    cfg: Config
    verts_nums: tuple
    dtype: Any = jnp.float32

    def setup(self):
        m = self.cfg.model
        if m.encoder.startswith("resnet"):
            self.encoder = ResNet(model_type=m.encoder, dtype=self.dtype,
                                  remat=self.cfg.train.remat_encoder)
            self.mid = ResNetMid(out_dims=tuple(m.deconv_dims), dtype=self.dtype)
        elif m.encoder.startswith("vit"):
            from renderih_tpu.models.vit import ViTEncoder, ViTMid

            self.encoder = ViTEncoder(model_type=m.encoder, dtype=self.dtype)
            self.mid = ViTMid(out_dims=tuple(m.deconv_dims), dtype=self.dtype)
        elif m.encoder.startswith("hrnet"):
            from renderih_tpu.models.hrnet import HRNetEncoder, HRNetMid

            self.encoder = HRNetEncoder(model_type=m.encoder, dtype=self.dtype)
            self.mid = HRNetMid(out_dims=tuple(m.deconv_dims), dtype=self.dtype)
        else:
            raise ValueError(f"unknown encoder {m.encoder}")

        if m.with_aux_heads:
            from renderih_tpu.models.resnet import AuxDecoderHead

            # 21 joints x 2 hands heatmaps; 1 mask + 3x2 densepose
            self.hms_head = AuxDecoderHead(out_dim=42, dtype=self.dtype)
            self.dp_head = AuxDecoderHead(out_dim=7, dtype=self.dtype)

        self.decoder = GraphDecoder(
            verts_nums=self.verts_nums,
            gcn_in_dims=tuple(m.gcn_in_dims),
            gcn_out_dims=tuple(m.gcn_out_dims),
            img_sizes=(m.img_size // 32, m.img_size // 16, m.img_size // 8),
            grid_f_dims=tuple(m.img_dims),
            grid_size=m.grid_size,
            graph_k=m.graph_k,
            graph_layer_num=m.graph_layer_num,
            n_heads=m.num_attn_heads,
            dropout=m.dropout,
            use_cheby=m.use_cheby,
            img_size=m.img_size,
            with_mano_head=(m.decoder == "mano"),
            paired=m.paired_lr,
            zero_init_heads=m.zero_init_heads,
            dtype=jnp.float32 if m.decoder_f32 else self.dtype,
        )

    def encode(self, img: jax.Array, train: bool = False):
        """Encoder + mid only: (global_feature, fmaps). Feature-extraction
        API; also used to profile the encoder/decoder time split."""
        img = img.astype(self.dtype)
        pyramid = self.encoder(img, train=train)
        return self.mid(pyramid, train=train)

    def __call__(
        self,
        img: jax.Array,            # (B, H, W, 3) normalized RGB
        pe_left: jax.Array,
        pe_right: jax.Array,
        upsample_init: jax.Array,
        laps_left: tuple | None = None,
        laps_right: tuple | None = None,
        train: bool = False,
        bbox_info: jax.Array | None = None,
    ) -> DecoderOutput:
        img = img.astype(self.dtype)
        pyramid = self.encoder(img, train=train)
        global_feature, fmaps = self.mid(pyramid, train=train)
        # Decoder runs in f32: tiny FLOPs, precision-sensitive heads.
        global_feature = global_feature.astype(jnp.float32)
        fmaps = [f.astype(jnp.float32) for f in fmaps]
        out = self.decoder(
            global_feature, fmaps, pe_left, pe_right, upsample_init,
            laps_left, laps_right, deterministic=not train,
            bbox_info=bbox_info,
        )
        if self.cfg.model.with_aux_heads:
            coarsest = pyramid[0]
            aux = {
                "hms": self.hms_head(coarsest, train=train).astype(jnp.float32),
            }
            dp = self.dp_head(coarsest, train=train).astype(jnp.float32)
            aux["mask"] = dp[..., 0]
            aux["dense"] = dp[..., 1:]
            out = out._replace(aux=aux)
        return out


def build_model(cfg: Config, assets: Assets) -> HandNet:
    # Trace-time switch, set BOTH ways so building a pallas_conv=False
    # model always clears state left by an earlier pallas_conv=True one
    # in the same process (bench A/Bs build several models back to back).
    from renderih_tpu.kernels.conv_pallas import set_pallas_conv

    set_pallas_conv(bool(cfg.model.pallas_conv))
    dtype = jnp.bfloat16 if cfg.train.precision == "bf16" else jnp.float32
    assert assets.left.verts_nums == assets.right.verts_nums, (
        "left/right graphs must coarsen to identical level sizes "
        f"({assets.left.verts_nums} vs {assets.right.verts_nums})"
    )
    return HandNet(cfg=cfg, verts_nums=assets.left.verts_nums, dtype=dtype)


def model_call_kwargs(cfg: Config, assets: Assets) -> dict:
    """The static-asset arguments for `HandNet.__call__`."""
    kwargs = dict(
        pe_left=assets.left.pe,
        pe_right=assets.right.pe,
        upsample_init=assets.left.upsample_init,
    )
    if cfg.model.use_cheby:
        kwargs["laps_left"] = assets.left.laplacians_coarse
        kwargs["laps_right"] = assets.right.laplacians_coarse
    return kwargs


def init_model(cfg: Config, assets: Assets, rng: jax.Array):
    """Initialize model params/state on a dummy batch."""
    model = build_model(cfg, assets)
    dummy = jnp.zeros((1, cfg.model.img_size, cfg.model.img_size, 3), jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        dummy, train=False, **model_call_kwargs(cfg, assets),
    )
    return model, variables
