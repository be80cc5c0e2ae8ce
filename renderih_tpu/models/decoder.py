"""Two-hand graph decoder head (flax.linen).

Global feature -> per-hand vertex tokens -> DualGraph trunk -> 3D verts at
252 nodes -> learned 252->778 upsample -> orthographic projection, plus
per-hand camera (scale, trans2d) heads. Mirrors `decoder`
(`common/myhand/decoder_lijun_graph.py:151-320`); the MANO-parameter
variant (`decoder_lijun_newgraph.py`) plugs in via `param_regressor`.

Outputs use mesh-vertex order everywhere outside the trunk; the GCN layout
only exists inside this module.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.models.attention import MlpResBlock  # noqa: F401 (re-export)
from renderih_tpu.models.dual_graph import DualGraph
from renderih_tpu.ops.projection import orthographic_project


class DecoderOutput(NamedTuple):
    verts3d: dict          # {'left','right'}: (B, 778, 3)
    verts2d: dict          # {'left','right'}: (B, 778, 2)
    scale: dict            # {'left','right'}: (B,)
    trans2d: dict          # {'left','right'}: (B, 2)
    coarse_verts3d: dict   # {'left','right'}: list[(B, V_i, 3)] per stage
    coarse_verts2d: dict   # projections of the above
    mano_pose: dict | None     # optional MANO-param head outputs
    mano_shape: dict | None
    aux: dict | None = None    # optional {'hms','mask','dense'} head outputs


class ParamRegressor(nn.Module):
    """778x3 coordinates -> MANO pose (16x6D rot) + shape (10).

    Mirrors `ParamRegressor` (`decoder_lijun_graph.py:117-149`); rot6d ->
    rotmat conversion happens in the caller so the head stays linear.
    """

    @nn.compact
    def __call__(self, verts: jax.Array):
        b = verts.shape[0]
        h = verts.reshape(b, -1)
        for dim in (1024, 512):
            h = nn.Dense(dim)(h)
            h = nn.hard_swish(h)
        pose_h = nn.hard_swish(nn.Dense(128, name="pose_fc1")(h))
        pose6d = nn.Dense(16 * 6, name="pose_fc2")(pose_h)
        shape_h = nn.hard_swish(nn.Dense(128, name="shape_fc1")(h))
        shape = nn.Dense(10, name="shape_fc2")(shape_h)
        return pose6d, shape


class GraphDecoder(nn.Module):
    """The full decoder head. Static assets come in via __call__."""

    verts_nums: tuple            # (63, 126, 252)
    gcn_in_dims: tuple = (512, 256, 128)
    gcn_out_dims: tuple = (256, 128, 64)
    img_sizes: tuple = (8, 16, 32)
    grid_f_dims: tuple = (256, 128, 64)
    grid_size: int = 8
    graph_k: int = 2
    graph_layer_num: int = 4
    n_heads: int = 4
    dropout: float = 0.05
    use_cheby: bool = False
    num_verts: int = 778
    img_size: int = 256
    with_mano_head: bool = False
    # run L/R through one hand-stacked (nn.vmap) trunk — same math,
    # fewer/larger kernels; see DualGraphLayer.paired
    paired: bool = False
    # zero-init coord/camera heads: start at the mean prediction, no
    # 50x-scale init transient (see ModelConfig.zero_init_heads)
    zero_init_heads: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        global_feature: jax.Array,   # (B, Fg)
        fmaps: list,                 # [(B,8,8,C), (B,16,16,C), (B,32,32,C)]
        pe_left: jax.Array,          # (63, 3)
        pe_right: jax.Array,         # (63, 3)
        upsample_init: jax.Array,    # (778, 252)
        laps_left: tuple | None = None,
        laps_right: tuple | None = None,
        deterministic: bool = True,
        bbox_info: jax.Array | None = None,  # (B, 3) CLIFF conditioning
    ) -> DecoderOutput:
        bs = global_feature.shape[0]
        if bbox_info is not None:
            # CLIFF-style conditioning (`common/myhand/bbox_decoder.py`):
            # normalized crop center/scale appended to the global feature
            # so the camera heads can undo the crop-induced perspective.
            global_feature = jnp.concatenate(
                [global_feature, bbox_info.astype(global_feature.dtype)], -1
            )
        v_in = self.verts_nums[0]
        v_out = self.verts_nums[-1]

        def gf_layer(name):
            def run(x):
                h = nn.Dense(self.gcn_in_dims[0] - 3, dtype=self.dtype,
                             name=f"{name}_fc")(x)
                return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                    name=f"{name}_ln")(h)
            return run

        lf = gf_layer("gf_layer_left")(global_feature)
        rf = gf_layer("gf_layer_right")(global_feature)
        lf = jnp.concatenate(
            [jnp.broadcast_to(lf[:, None], (bs, v_in, lf.shape[-1])),
             jnp.broadcast_to(pe_left[None].astype(lf.dtype), (bs, v_in, 3))],
            axis=-1)
        rf = jnp.concatenate(
            [jnp.broadcast_to(rf[:, None], (bs, v_in, rf.shape[-1])),
             jnp.broadcast_to(pe_right[None].astype(rf.dtype), (bs, v_in, 3))],
            axis=-1)

        lf, rf, stage_outs = DualGraph(
            verts_nums=self.verts_nums,
            verts_in_dims=self.gcn_in_dims,
            verts_out_dims=self.gcn_out_dims,
            img_sizes=self.img_sizes,
            grid_f_dims=self.grid_f_dims,
            grid_size=self.grid_size,
            graph_k=self.graph_k,
            num_blocks=self.graph_layer_num,
            n_heads=self.n_heads,
            dropout=self.dropout,
            use_cheby=self.use_cheby,
            paired=self.paired,
            dtype=self.dtype,
            name="dual_gcn",
        )(lf, rf, fmaps[: len(self.verts_nums)], laps_left, laps_right,
          deterministic)
        # Heads run in f32 regardless of the trunk dtype: coordinates are
        # metric quantities (sub-mm targets) and the heads are tiny.
        lf = lf.astype(jnp.float32)
        rf = rf.astype(jnp.float32)

        # Camera heads, shared across hands (`decoder_lijun_graph.py:221-223`).
        # Only the FINAL projections are zero-init; avg_head keeps its
        # default init (zeroing both layers of the camera stack would
        # zero the whole camera gradient: params_head's kernel grad is
        # dout (x) pooled^T with pooled == 0, and avg_head's is
        # params_head_kernel^T-weighted — a mutual deadlock).
        head_kw = ({"kernel_init": nn.initializers.zeros}
                   if self.zero_init_heads else {})
        avg_head = nn.Dense(1, name="avg_head")
        params_head = nn.Dense(3, name="params_head", **head_kw)
        coord_head = nn.Dense(3, name="coord_head", **head_kw)

        def camera(feat):
            pooled = avg_head(jnp.swapaxes(feat, -1, -2))[..., 0]  # (B, C)
            p = params_head(pooled)
            return p[:, 0], p[:, 1:]

        scale, trans2d = {}, {}
        scale["left"], trans2d["left"] = camera(lf)
        scale["right"], trans2d["right"] = camera(rf)

        # Coarse vertex coordinates per stage for multi-level supervision
        # (applied to *stage outputs*, matching handDictList semantics).
        verts_coarse = {"left": [], "right": []}
        verts_coarse2d = {"left": [], "right": []}
        final_coarse = {"left": coord_head(lf), "right": coord_head(rf)}
        for hand in ("left", "right"):
            verts_coarse[hand].append(final_coarse[hand])
            verts_coarse2d[hand].append(
                orthographic_project(scale[hand], trans2d[hand],
                                     final_coarse[hand], self.img_size))

        # Learned 252 -> 778 upsample (no bias), initialized from the
        # reference's misc/upsample.pkl equivalent.
        up_w = self.param(
            "upsample_weight",
            lambda rng, shape: jnp.asarray(upsample_init, jnp.float32),
            (self.num_verts, v_out),
        )
        verts3d, verts2d = {}, {}
        for hand in ("left", "right"):
            verts3d[hand] = jnp.einsum("wv,bvc->bwc", up_w, final_coarse[hand])
            verts2d[hand] = orthographic_project(
                scale[hand], trans2d[hand], verts3d[hand], self.img_size)

        mano_pose = mano_shape = None
        if self.with_mano_head:
            reg = ParamRegressor(name="param_regressor")
            mano_pose, mano_shape = {}, {}
            for hand in ("left", "right"):
                pose6d, shp = reg(verts3d[hand])
                mano_pose[hand] = pose6d
                mano_shape[hand] = shp

        return DecoderOutput(
            verts3d=verts3d,
            verts2d=verts2d,
            scale=scale,
            trans2d=trans2d,
            coarse_verts3d=verts_coarse,
            coarse_verts2d=verts_coarse2d,
            mano_pose=mano_pose,
            mano_shape=mano_shape,
        )
