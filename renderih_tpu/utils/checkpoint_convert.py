"""Convert reference PyTorch checkpoints into renderih_tpu flax params.

The reference ships two pretrained checkpoints ("with"/"without synthetic
data", README.md:60-62) whose state_dict keys follow the
`HandNET_GCN` module tree (`common/myhand/lijun_model_graph.py:18-33`).
This module maps those tensors onto our flax parameter tree:

  * torch Linear weight (out, in)      -> flax kernel (in, out), transposed
  * torch Conv2d weight (o, i, kh, kw) -> flax kernel (kh, kw, i, o)
  * torch BatchNorm weight/bias        -> params scale/bias
    running_mean/var                   -> batch_stats mean/var
  * `module.` DDP prefixes are stripped (`lijun_model_graph.py:64-68`)

Layout differences handled explicitly:
  * reference SelfAttn `ff` is an MLP_res_block -> our `ff/Dense_0/1`
  * reference `img_attn.fc` -> our `img_ex_*/grid_to_verts`
  * reference `unsample_layer.weight` (778, 252) -> our
    `decoder/upsample_weight` (no transpose: both are (778, 252) applied
    on the vertex axis)
"""

from __future__ import annotations

import numpy as np


def _t(x):  # torch tensor / numpy -> numpy
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_module_prefix(state: dict) -> dict:
    if any(k.startswith("module.") for k in state):
        return {k[len("module."):]: v for k, v in state.items()}
    return state


def _linear(state, prefix):
    out = {"kernel": _t(state[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _conv(state, prefix):
    w = _t(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _ln(state, prefix):
    return {"scale": _t(state[f"{prefix}.weight"]),
            "bias": _t(state[f"{prefix}.bias"])}


def _bn(state, prefix):
    params = {"scale": _t(state[f"{prefix}.weight"]),
              "bias": _t(state[f"{prefix}.bias"])}
    stats = {"mean": _t(state[f"{prefix}.running_mean"]),
             "var": _t(state[f"{prefix}.running_var"])}
    return params, stats


def _self_attn(state, prefix):
    """Reference SelfAttn -> our SelfAttn param subtree."""
    return {
        "LayerNorm_0": _ln(state, f"{prefix}.layer_norm"),
        "w_qs": _linear(state, f"{prefix}.w_qs"),
        "w_ks": _linear(state, f"{prefix}.w_ks"),
        "w_vs": _linear(state, f"{prefix}.w_vs"),
        "fc": _linear(state, f"{prefix}.fc"),
        "ff": _mlp_res(state, f"{prefix}.ff"),
    }


def _mlp_res(state, prefix):
    return {
        "LayerNorm_0": _ln(state, f"{prefix}.layer_norm"),
        "Dense_0": _linear(state, f"{prefix}.fc1"),
        "Dense_1": _linear(state, f"{prefix}.fc2"),
    }


def _resnet(state, bn_stats, depth_counts):
    """encoder.resnet.* -> our ResNet subtree."""
    params = {"conv1": _conv(state, "encoder.resnet.conv1")}
    p, s = _bn(state, "encoder.resnet.bn1")
    params["bn1"] = p
    stats = {"bn1": s}
    for stage, count in enumerate(depth_counts):
        for i in range(count):
            tp = f"encoder.resnet.layer{stage + 1}.{i}"
            name = f"layer{stage + 1}_{i}"
            blk, blk_stats = {}, {}
            for conv_i in (1, 2, 3):
                ckey = f"{tp}.conv{conv_i}.weight"
                if ckey in state:
                    blk[f"conv{conv_i}"] = _conv(state, f"{tp}.conv{conv_i}")
                    bp, bs = _bn(state, f"{tp}.bn{conv_i}")
                    blk[f"bn{conv_i}"] = bp
                    blk_stats[f"bn{conv_i}"] = bs
            if f"{tp}.downsample.0.weight" in state:
                blk["downsample_conv"] = _conv(state, f"{tp}.downsample.0")
                bp, bs = _bn(state, f"{tp}.downsample.1")
                blk["downsample_bn"] = bp
                blk_stats["downsample_bn"] = bs
            params[name] = blk
            stats[name] = blk_stats
    return params, stats


def _gcn_block(state, prefix, use_cheby=False):
    if use_cheby:
        return {
            "norm1": _ln(state, f"{prefix}.norm1"),
            "cheby1_kernel": _t(state[f"{prefix}.fc1.weight"]).T,
            "cheby1_bias": _t(state[f"{prefix}.fc1.bias"]),
            "norm2": _ln(state, f"{prefix}.norm2"),
            "cheby2_kernel": _t(state[f"{prefix}.fc2.weight"]).T,
            "cheby2_bias": _t(state[f"{prefix}.fc2.bias"]),
            "shortcut": _linear(state, f"{prefix}.shortcut"),
            "norm3": _ln(state, f"{prefix}.norm3"),
        }
    return {
        "norm1": _ln(state, f"{prefix}.norm1"),
        "fc1": _linear(state, f"{prefix}.fc1"),
        "norm2": _ln(state, f"{prefix}.norm2"),
        "fc2": _linear(state, f"{prefix}.fc2"),
        "shortcut": _linear(state, f"{prefix}.shortcut"),
        "norm3": _ln(state, f"{prefix}.norm3"),
    }


def _img_ex(state, prefix):
    return {
        "encoder": {
            "position_embeddings": _t(
                state[f"{prefix}.encoder.position_embeddings.weight"]
            ),
            "proj": _conv(state, f"{prefix}.encoder.proj"),
            "self_attn": _self_attn(state, f"{prefix}.encoder.self_attn"),
        },
        "grid_to_verts": _linear(state, f"{prefix}.attn.fc"),
        "attn": _self_attn(state, f"{prefix}.attn.Attn"),
    }


def _inter_attn(state, prefix):
    return {
        "L_self_attn": _self_attn(state, f"{prefix}.L_self_attn_layer"),
        "R_self_attn": _self_attn(state, f"{prefix}.R_self_attn_layer"),
        "w_qs": _linear(state, f"{prefix}.w_qs"),
        "w_ks": _linear(state, f"{prefix}.w_ks"),
        "w_vs": _linear(state, f"{prefix}.w_vs"),
        "fc": _linear(state, f"{prefix}.fc"),
        "norm1": _ln(state, f"{prefix}.layer_norm1"),
        "norm2": _ln(state, f"{prefix}.layer_norm2"),
        "ffL": _mlp_res(state, f"{prefix}.ffL"),
        "ffR": _mlp_res(state, f"{prefix}.ffR"),
    }


_RESNET_COUNTS = {
    "resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def convert_reference_checkpoint(
    state: dict,
    encoder: str = "resnet50",
    num_stages: int = 3,
    blocks_per_stage: int = 4,
    use_cheby: bool = False,
) -> tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) for `HandNet`."""
    state = strip_module_prefix(state)
    state = {k: v for k, v in state.items()}

    if encoder.startswith("hrnet"):
        hr_params, hr_stats = convert_reference_hrnet(state)
        enc_params, enc_stats = hr_params["encoder"], hr_stats["encoder"]
        mid_params, mid_stats = hr_params["mid"], hr_stats["mid"]
    else:
        enc_params, enc_stats = _resnet(state, None, _RESNET_COUNTS[encoder])
        mid_params, mid_stats = {}, {}
        i = 0
        while f"mid_model.convs.{i}.0.weight" in state:
            mid_params[f"proj{i}_conv"] = _conv(state, f"mid_model.convs.{i}.0")
            bp, bs = _bn(state, f"mid_model.convs.{i}.2")
            mid_params[f"proj{i}_bn"] = bp
            mid_stats[f"proj{i}_bn"] = bs
            i += 1

    dec: dict = {
        "gf_layer_left_fc": _linear(state, "decoder.gf_layer_left.0"),
        "gf_layer_left_ln": _ln(state, "decoder.gf_layer_left.1"),
        "gf_layer_right_fc": _linear(state, "decoder.gf_layer_right.0"),
        "gf_layer_right_ln": _ln(state, "decoder.gf_layer_right.1"),
        "coord_head": _linear(state, "decoder.coord_head"),
        "avg_head": _linear(state, "decoder.avg_head"),
        "params_head": _linear(state, "decoder.params_head"),
        "upsample_weight": _t(state["decoder.unsample_layer.weight"]),
    }
    dual = {}
    for li in range(num_stages):
        lp = f"decoder.dual_gcn.layers.{li}"
        layer = {
            "position_embeddings": _t(
                state[f"{lp}.position_embeddings.weight"]
            ),
            "img_ex_left": _img_ex(state, f"{lp}.img_ex_left"),
            "img_ex_right": _img_ex(state, f"{lp}.img_ex_right"),
            "inter_attn": _inter_attn(state, f"{lp}.attn"),
        }
        for side in ("left", "right"):
            blocks = {}
            for bi in range(blocks_per_stage):
                blocks[f"block_{bi}"] = _gcn_block(
                    state, f"{lp}.graph_{side}.GCN_blocks.{bi}", use_cheby
                )
            layer[f"graph_{side}"] = blocks
        dual[f"layer_{li}"] = layer
    dec["dual_gcn"] = dual

    params = {"encoder": enc_params, "mid": mid_params, "decoder": dec}
    batch_stats = {"encoder": enc_stats, "mid": mid_stats}
    return params, batch_stats


# --------------------------------------------------------------------------
# HRNet: reference HighResolutionNet (head_type='none') + hrnet_mid
# (`common/myhand/model_zoo/hrnet.py:247-608`,
#  `common/myhand/encoder_lijun.py:216-325`) -> our HRNetEncoder/HRNetMid.
# --------------------------------------------------------------------------

def _res_block(state, prefix):
    """Bottleneck/BasicBlock (hrnet.py:29-100 == torchvision layout)."""
    blk, stats = {}, {}
    for conv_i in (1, 2, 3):
        if f"{prefix}.conv{conv_i}.weight" in state:
            blk[f"conv{conv_i}"] = _conv(state, f"{prefix}.conv{conv_i}")
            bp, bs = _bn(state, f"{prefix}.bn{conv_i}")
            blk[f"bn{conv_i}"] = bp
            stats[f"bn{conv_i}"] = bs
    if f"{prefix}.downsample.0.weight" in state:
        blk["downsample_conv"] = _conv(state, f"{prefix}.downsample.0")
        bp, bs = _bn(state, f"{prefix}.downsample.1")
        blk["downsample_bn"] = bp
        stats["downsample_bn"] = bs
    return blk, stats


def _conv_bn(state, conv_key, bn_key):
    """-> our _ConvBNRelu subtree ({conv, bn})."""
    p = {"conv": _conv(state, conv_key)}
    bp, bs = _bn(state, bn_key)
    p["bn"] = bp
    return p, {"bn": bs}


# (num_modules, num_branches) for stages 2..4 — identical for w18..w64
# (`hrnet.py:624-676`).
_HRNET_STAGES = ((1, 2), (4, 3), (3, 4))


def convert_reference_hrnet(state: dict, prefix: str = "encoder.hrnet.",
                            mid_prefix: str = "mid_model.") -> tuple:
    """HRNet torch state_dict -> ({encoder, mid} params, batch_stats).

    `prefix` locates the HighResolutionNet subtree (the reference wraps it
    as `HRnet_encoder.hrnet`, `encoder_lijun.py:155-159`); `mid_prefix`
    the hrnet_mid. Blocks-per-branch is always 4 for w18..w64.
    """
    state = strip_module_prefix(state)
    enc, enc_stats = {}, {}

    enc["stem1"], s = _conv_bn(state, f"{prefix}conv1", f"{prefix}bn1")
    enc_stats["stem1"] = s
    enc["stem2"], s = _conv_bn(state, f"{prefix}conv2", f"{prefix}bn2")
    enc_stats["stem2"] = s

    for i in range(4):
        enc[f"layer1_{i}"], s = _res_block(state, f"{prefix}layer1.{i}")
        enc_stats[f"layer1_{i}"] = s

    # transition1: [0] = Sequential(conv,bn,relu); [1] wraps the conv3x3s
    # chain in an extra Sequential (`hrnet.py:410-444`)
    enc["trans1_0"], s = _conv_bn(
        state, f"{prefix}transition1.0.0", f"{prefix}transition1.0.1")
    enc_stats["trans1_0"] = s
    enc["trans1_1"], s = _conv_bn(
        state, f"{prefix}transition1.1.0.0", f"{prefix}transition1.1.0.1")
    enc_stats["trans1_1"] = s

    for si, (num_modules, num_branches) in enumerate(_HRNET_STAGES):
        stage = si + 2
        for m in range(num_modules):
            sp = f"{prefix}stage{stage}.{m}"
            mod, mod_stats = {}, {}
            for b in range(num_branches):
                for k in range(4):
                    blk, s = _res_block(state, f"{sp}.branches.{b}.{k}")
                    mod[f"branch{b}_block{k}"] = blk
                    mod_stats[f"branch{b}_block{k}"] = s
            for i in range(num_branches):
                for j in range(num_branches):
                    if j == i:
                        continue
                    fp = f"{sp}.fuse_layers.{i}.{j}"
                    if j > i:  # 1x1 conv + bn + upsample
                        mod[f"fuse{j}to{i}_conv"] = _conv(state, f"{fp}.0")
                        bp, bs = _bn(state, f"{fp}.1")
                        mod[f"fuse{j}to{i}_bn"] = bp
                        mod_stats[f"fuse{j}to{i}_bn"] = bs
                    else:  # chain of stride-2 3x3 convs
                        for k in range(i - j):
                            mod[f"fuse{j}to{i}_conv{k}"] = _conv(
                                state, f"{fp}.{k}.0")
                            bp, bs = _bn(state, f"{fp}.{k}.1")
                            mod[f"fuse{j}to{i}_bn{k}"] = bp
                            mod_stats[f"fuse{j}to{i}_bn{k}"] = bs
            enc[f"stage{stage}_m{m}"] = mod
            enc_stats[f"stage{stage}_m{m}"] = mod_stats
        if num_branches < 4:
            # new branch: reference transition{stage}.{num_branches}.0.*
            enc[f"trans{stage}_{num_branches}"], s = _conv_bn(
                state,
                f"{prefix}transition{stage}.{num_branches}.0.0",
                f"{prefix}transition{stage}.{num_branches}.0.1")
            enc_stats[f"trans{stage}_{num_branches}"] = s

    mid, mid_stats = {}, {}
    i = 0
    while f"{mid_prefix}convs.{i}.0.weight" in state:
        mid[f"proj{i}_conv"] = _conv(state, f"{mid_prefix}convs.{i}.0")
        bp, bs = _bn(state, f"{mid_prefix}convs.{i}.2")
        mid[f"proj{i}_bn"] = bp
        mid_stats[f"proj{i}_bn"] = bs
        i += 1
    for i in range(4):
        mid[f"incre{i}"], s = _res_block(
            state, f"{mid_prefix}incre_modules.{i}.0")
        mid_stats[f"incre{i}"] = s
    for i in range(3):
        mid[f"down{i}_conv"] = _conv(
            state, f"{mid_prefix}downsamp_modules.{i}.0")
        bp, bs = _bn(state, f"{mid_prefix}downsamp_modules.{i}.1")
        mid[f"down{i}_bn"] = bp
        mid_stats[f"down{i}_bn"] = bs
    mid["final_conv"] = _conv(state, f"{mid_prefix}final_layer.0")
    bp, bs = _bn(state, f"{mid_prefix}final_layer.1")
    mid["final_bn"] = bp
    mid_stats["final_bn"] = bs

    return ({"encoder": enc, "mid": mid},
            {"encoder": enc_stats, "mid": mid_stats})


# --------------------------------------------------------------------------
# ViTPose: reference ViT fork (`models/vitpose/vitpose.py:296-455`) and
# its two-hand wrapper (`common/myhand/lijun_vitpose.py:17-37`) -> our
# ViTEncoder. Also accepts the released `pretrain/vitpose-{b,l}.pth`
# backbone checkpoints (same `patch_embed/blocks/last_norm` layout).
# --------------------------------------------------------------------------

_VIT_DEPTHS = {"vit_base": 12, "vit_large": 24}


def convert_vitpose_backbone(state: dict, model_type: str = "vit_base",
                             prefix: str = "") -> dict:
    """ViT backbone state_dict -> our ViTEncoder trunk params.

    Handles both the bare `vitpose-{b,l}.pth` layout (keys like
    `patch_embed.proj.weight`, possibly under a `backbone.` prefix as
    mmpose saves them) and the wrapper's `encoder.` prefix. The
    checkpoint's `pos_embed`/`cls_token` (if present) are intentionally
    dropped: the reference fork sets `pos_embed = None` and never adds it
    in forward (`vitpose.py:326,415-420`), so runtime parity requires
    discarding it too.
    """
    state = strip_module_prefix(state)
    if not prefix:
        for cand in ("backbone.", "encoder.", ""):
            if f"{cand}patch_embed.proj.weight" in state:
                prefix = cand
                break
    depth = _VIT_DEPTHS[model_type]

    params = {"patch_embed": {"proj": _conv(state, f"{prefix}patch_embed.proj")}}
    for i in range(depth):
        bp = f"{prefix}blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _ln(state, f"{bp}.norm1"),
            "qkv": _linear(state, f"{bp}.attn.qkv"),
            "proj": _linear(state, f"{bp}.attn.proj"),
            "norm2": _ln(state, f"{bp}.norm2"),
            "mlp_fc1": _linear(state, f"{bp}.mlp.fc1"),
            "mlp_fc2": _linear(state, f"{bp}.mlp.fc2"),
        }
    params["last_norm"] = _ln(state, f"{prefix}last_norm")
    return params


def convert_vit_wrapper(state: dict, model_type: str = "vit_base") -> dict:
    """Full ViT-variant model (`lijun_vitpose.HandNET_GCN`) encoder side:
    backbone + 8-stride patch embed + conv1 + Myattention downsample ->
    our ViTEncoder params (the `vit.py` pyramid)."""
    state = strip_module_prefix(state)
    enc = convert_vitpose_backbone(state, model_type, prefix="encoder.")
    enc["patch_embed8"] = {"proj": _conv(state, "patch_embed.proj")}
    enc["conv1"] = _conv(state, "conv1")
    enc["downsample"] = {
        "fc0": _linear(state, "downsample.fc0"),
        "sr": _conv(state, "downsample.sr"),
        "norm": _ln(state, "downsample.norm"),
        "q": _linear(state, "downsample.q"),
        "kv": _linear(state, "downsample.kv"),
        "linear1": _linear(state, "downsample.linear1"),
        "linear2": _linear(state, "downsample.linear2"),
    }
    return enc


# --------------------------------------------------------------------------
# Inverse direction: export our params as a reference-layout state_dict.
# Used both for interop (run our weights in the reference) and as the
# round-trip test of the mapping table above.
# --------------------------------------------------------------------------

def _inv_linear(sub, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(sub["kernel"]).T
    if "bias" in sub:
        out[f"{prefix}.bias"] = np.asarray(sub["bias"])


def _inv_conv(sub, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(sub["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in sub:
        out[f"{prefix}.bias"] = np.asarray(sub["bias"])


def _inv_ln(sub, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(sub["scale"])
    out[f"{prefix}.bias"] = np.asarray(sub["bias"])


def _inv_bn(sub, stats, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(sub["scale"])
    out[f"{prefix}.bias"] = np.asarray(sub["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
    out[f"{prefix}.running_var"] = np.asarray(stats["var"])


def _inv_mlp_res(sub, prefix, out):
    _inv_ln(sub["LayerNorm_0"], f"{prefix}.layer_norm", out)
    _inv_linear(sub["Dense_0"], f"{prefix}.fc1", out)
    _inv_linear(sub["Dense_1"], f"{prefix}.fc2", out)


def _inv_self_attn(sub, prefix, out):
    _inv_ln(sub["LayerNorm_0"], f"{prefix}.layer_norm", out)
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        _inv_linear(sub[name], f"{prefix}.{name}", out)
    _inv_mlp_res(sub["ff"], f"{prefix}.ff", out)


def _inv_img_ex(sub, prefix, out):
    out[f"{prefix}.encoder.position_embeddings.weight"] = np.asarray(
        sub["encoder"]["position_embeddings"]
    )
    _inv_conv(sub["encoder"]["proj"], f"{prefix}.encoder.proj", out)
    _inv_self_attn(sub["encoder"]["self_attn"], f"{prefix}.encoder.self_attn", out)
    _inv_linear(sub["grid_to_verts"], f"{prefix}.attn.fc", out)
    _inv_self_attn(sub["attn"], f"{prefix}.attn.Attn", out)


def _inv_inter_attn(sub, prefix, out):
    _inv_self_attn(sub["L_self_attn"], f"{prefix}.L_self_attn_layer", out)
    _inv_self_attn(sub["R_self_attn"], f"{prefix}.R_self_attn_layer", out)
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        _inv_linear(sub[name], f"{prefix}.{name}", out)
    _inv_ln(sub["norm1"], f"{prefix}.layer_norm1", out)
    _inv_ln(sub["norm2"], f"{prefix}.layer_norm2", out)
    _inv_mlp_res(sub["ffL"], f"{prefix}.ffL", out)
    _inv_mlp_res(sub["ffR"], f"{prefix}.ffR", out)


def _inv_gcn_block(sub, prefix, out, use_cheby=False):
    _inv_ln(sub["norm1"], f"{prefix}.norm1", out)
    _inv_ln(sub["norm2"], f"{prefix}.norm2", out)
    _inv_ln(sub["norm3"], f"{prefix}.norm3", out)
    _inv_linear(sub["shortcut"], f"{prefix}.shortcut", out)
    if use_cheby:
        out[f"{prefix}.fc1.weight"] = np.asarray(sub["cheby1_kernel"]).T
        out[f"{prefix}.fc1.bias"] = np.asarray(sub["cheby1_bias"])
        out[f"{prefix}.fc2.weight"] = np.asarray(sub["cheby2_kernel"]).T
        out[f"{prefix}.fc2.bias"] = np.asarray(sub["cheby2_bias"])
    else:
        _inv_linear(sub["fc1"], f"{prefix}.fc1", out)
        _inv_linear(sub["fc2"], f"{prefix}.fc2", out)


def export_reference_checkpoint(params: dict, batch_stats: dict,
                                use_cheby: bool = False) -> dict:
    """Our (params, batch_stats) -> reference-layout numpy state_dict."""
    out: dict = {}

    enc = params["encoder"]
    enc_stats = batch_stats["encoder"]
    _inv_conv(enc["conv1"], "encoder.resnet.conv1", out)
    _inv_bn(enc["bn1"], enc_stats["bn1"], "encoder.resnet.bn1", out)
    for name, sub in enc.items():
        if not name.startswith("layer"):
            continue
        stage, idx = name[len("layer"):].split("_")
        tp = f"encoder.resnet.layer{stage}.{idx}"
        for conv_i in (1, 2, 3):
            if f"conv{conv_i}" in sub:
                _inv_conv(sub[f"conv{conv_i}"], f"{tp}.conv{conv_i}", out)
                _inv_bn(sub[f"bn{conv_i}"], enc_stats[name][f"bn{conv_i}"],
                        f"{tp}.bn{conv_i}", out)
        if "downsample_conv" in sub:
            _inv_conv(sub["downsample_conv"], f"{tp}.downsample.0", out)
            _inv_bn(sub["downsample_bn"], enc_stats[name]["downsample_bn"],
                    f"{tp}.downsample.1", out)

    mid = params["mid"]
    mid_stats = batch_stats["mid"]
    i = 0
    while f"proj{i}_conv" in mid:
        _inv_conv(mid[f"proj{i}_conv"], f"mid_model.convs.{i}.0", out)
        _inv_bn(mid[f"proj{i}_bn"], mid_stats[f"proj{i}_bn"],
                f"mid_model.convs.{i}.2", out)
        i += 1

    dec = params["decoder"]
    _inv_linear(dec["gf_layer_left_fc"], "decoder.gf_layer_left.0", out)
    _inv_ln(dec["gf_layer_left_ln"], "decoder.gf_layer_left.1", out)
    _inv_linear(dec["gf_layer_right_fc"], "decoder.gf_layer_right.0", out)
    _inv_ln(dec["gf_layer_right_ln"], "decoder.gf_layer_right.1", out)
    _inv_linear(dec["coord_head"], "decoder.coord_head", out)
    _inv_linear(dec["avg_head"], "decoder.avg_head", out)
    _inv_linear(dec["params_head"], "decoder.params_head", out)
    out["decoder.unsample_layer.weight"] = np.asarray(dec["upsample_weight"])

    for lname, layer in dec["dual_gcn"].items():
        li = lname.split("_")[1]
        lp = f"decoder.dual_gcn.layers.{li}"
        out[f"{lp}.position_embeddings.weight"] = np.asarray(
            layer["position_embeddings"]
        )
        _inv_img_ex(layer["img_ex_left"], f"{lp}.img_ex_left", out)
        _inv_img_ex(layer["img_ex_right"], f"{lp}.img_ex_right", out)
        _inv_inter_attn(layer["inter_attn"], f"{lp}.attn", out)
        for side in ("left", "right"):
            for bname, block in layer[f"graph_{side}"].items():
                bi = bname.split("_")[1]
                _inv_gcn_block(
                    block, f"{lp}.graph_{side}.GCN_blocks.{bi}", out, use_cheby
                )
    return out
