#!/usr/bin/env python
"""Cross-framework numerical parity: reference PyTorch forward vs ours.

Runs the ACTUAL reference model (`common/myhand/lijun_model_graph.py:18-70`,
resnet50 + dual-graph decoder) on this host's CPU with synthetic assets
written in the reference's binary formats, exports its random-init
state_dict, converts it with `convert_reference_checkpoint`, and asserts
our flax forward reproduces the torch outputs on identical inputs.

This turns "parity by construction" into "parity by measurement": every
converted layer (resnet conv/bn stacks, mid projections, gf layers,
GCN res-blocks, img/inter attention, coord/params heads, upsample) is
exercised end-to-end against the reference implementation.

Pipeline (per run, everything under --workdir):
  1. main process writes MANO_{LEFT,RIGHT}.pkl (reference chumpy-free
     layout, `common/utils/manolayer.py:100-155`);
  2. a subprocess with import stubs (tools/ref_stubs: torchvision resnets,
     yacs CfgNode, mmcv.ops; a `main.config` shim avoiding its
     import-time side effects, `main/config.py:120-135`) builds the graph
     pkls with the reference's own `build_graph` (so coarsening layout is
     byte-identical for both frameworks), constructs the model CPU-patched
     (`.cuda()` no-op), runs eval-mode forward, saves state_dict+outputs;
  3. main process loads the same pkls through our asset loaders, converts
     the state_dict, runs `HandNet.apply`, and compares
     verts3d/verts2d/scale/trans2d per hand.

Usage:
  python tools/parity_vs_reference.py [--bs 2] [--encoder resnet50]
"""

from __future__ import annotations

import argparse
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = os.environ.get("RENDERIH_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)

# CPU by design, configured BEFORE any renderih_tpu import can touch the
# backend: the comparison is f32 torch-CPU vs f32 jax-CPU, and the
# harness must not depend on TPU reachability (a dead axon tunnel fails
# or hangs backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

MANO_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)


# --------------------------------------------------------------------------
# Phase 1 (main process): synthetic MANO pkls in the reference layout
# --------------------------------------------------------------------------

def write_mano_pkls(workdir: str, seed: int = 0) -> None:
    import scipy.sparse as sp

    from renderih_tpu.mano.params import make_synthetic_mano

    os.makedirs(workdir, exist_ok=True)
    for is_right in (True, False):
        m = make_synthetic_mano(seed=seed, is_right=is_right)
        v_template = np.asarray(m.v_template, np.float64)
        j_reg = np.asarray(m.J_regressor, np.float64)
        kintree = np.zeros((2, 16), np.int64)
        kintree[0] = np.asarray(MANO_PARENTS)
        kintree[0, 0] = 2**32 - 1  # root sentinel, as in the official pkl
        kintree[1] = np.arange(16)
        data = {
            "v_template": v_template,
            "shapedirs": np.asarray(m.shapedirs, np.float64),
            "posedirs": np.asarray(m.posedirs, np.float64),
            # official pkls carry a scipy sparse J_regressor
            # (`common/utils/manolayer.py:123-132`)
            "J_regressor": sp.csc_matrix(j_reg),
            "J": j_reg @ v_template,
            "weights": np.asarray(m.weights, np.float64),
            "hands_components": np.asarray(m.hands_components, np.float64),
            "hands_mean": np.asarray(m.hands_mean, np.float64),
            "f": np.asarray(m.faces, np.uint32),
            "kintree_table": kintree,
        }
        name = "RIGHT" if is_right else "LEFT"
        with open(os.path.join(workdir, f"MANO_{name}.pkl"), "wb") as f:
            pickle.dump(data, f)


# --------------------------------------------------------------------------
# Phase 2 (subprocess): reference torch forward
# --------------------------------------------------------------------------

def _patch_torch_cpu():
    """Make the reference's hard-coded `.cuda()` / `.to('cuda')` calls
    (`decoder_lijun_graph.py:230-236`, `common/utils/mano.py:14-37`)
    no-ops on this CPU-only torch build."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    def _cpu_arg(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    orig_to = torch.Tensor.to

    def to_cpu(self, *args, **kwargs):
        args = tuple(_cpu_arg(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _cpu_arg(kwargs["device"])
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to_cpu


def _install_import_env(workdir: str):
    """sys.path + sys.modules so the reference tree imports cleanly."""
    import types

    sys.path.insert(0, os.path.join(REPO, "tools", "ref_stubs"))
    sys.path.insert(0, REFERENCE)

    # `main.config` shim: the real module mutates sys.path and mkdirs
    # output trees under the (read-only) reference checkout at import time
    # (`main/config.py:120-135`). The reference model code only reads the
    # flag attributes below (`lijun_model_graph.py:39-51`,
    # `common/utils/mano.py:6-10`).
    cfg = types.SimpleNamespace(
        mano_flag=False,   # keep the unused ParamRegressor out of the dict
        render=False, normal=True, edge=True, vert2d=True, dice=False,
        sdf=False, lambda_sdf=1e6, lambda_render=100, lambda_normal=10,
        lambda_edge=100, sdf_thresh=0.01, data_type="interhand_dataaug",
        mano_path=workdir,
    )
    main_pkg = types.ModuleType("main")
    main_cfg = types.ModuleType("main.config")
    main_cfg.cfg = cfg
    main_pkg.config = main_cfg
    sys.modules["main"] = main_pkg
    sys.modules["main.config"] = main_cfg
    # the vendored manopth package lives under common/utils
    sys.path.insert(0, os.path.join(REFERENCE, "common", "utils", "manopth"))

    # `lijun_model_graph.py:13` imports the CLIFF decoder whose import
    # chain (`bbox_decoder` -> `mano_to_vertex` -> `common/nets/mano_head`)
    # constructs a chumpy-based manopth layer at module scope; it is never
    # called with cliff=False, so stub the module out.
    bbox_stub = types.ModuleType("common.myhand.bbox_decoder")

    def _no_cliff(*a, **k):
        raise RuntimeError("bbox/CLIFF decoder stubbed in parity harness")

    bbox_stub.load_decoder_cliff = _no_cliff
    sys.modules["common.myhand.bbox_decoder"] = bbox_stub


def build_reference_model(workdir: str, seed: int, encoder: str):
    """Inside a stub-installed process: generate graph/upsample/dense
    assets (reference formats) and construct the eval-mode torch model."""
    _install_import_env(workdir)
    _patch_torch_cpu()
    import torch

    # Build graph pkls with the reference's own HEM coarsening so both
    # frameworks consume the byte-identical layout
    # (`models/model_zoo/coarsening.py:397-428`).
    from common.myhand.model_zoo import build_graph

    counts = {}
    for hand in ("left", "right"):
        gpath = os.path.join(workdir, f"graph_{hand}.pkl")
        with open(os.path.join(
                workdir, f"MANO_{hand.upper()}.pkl"), "rb") as f:
            faces = pickle.load(f)["f"].astype(np.int64)
        graph_dict = build_graph(faces, coarsening_levels=4)
        with open(gpath, "wb") as f:
            pickle.dump(graph_dict, f)
        # third-coarsest level size = decoder output nodes (vNum_out)
        counts[hand] = graph_dict["coarsen_graphs_L"][-3].shape[0]
    assert counts["left"] == counts["right"], counts

    # upsample + dense-color assets sized from the actual coarsening
    rng = np.random.default_rng(seed + 77)
    upsample = rng.normal(0.0, 0.05, (778, counts["left"])).astype(np.float32)
    with open(os.path.join(workdir, "upsample.pkl"), "wb") as f:
        pickle.dump(upsample, f)
    dense = rng.uniform(size=(778, 3)).astype(np.float32)
    with open(os.path.join(workdir, "v_color.pkl"), "wb") as f:
        pickle.dump(dense, f)

    from common.myhand import decoder_lijun_graph as dec_mod

    dec_mod.get_graph_dict_path = lambda: {
        "left": os.path.join(workdir, "graph_left.pkl"),
        "right": os.path.join(workdir, "graph_right.pkl"),
    }
    dec_mod.get_dense_color_path = lambda: os.path.join(workdir, "v_color.pkl")
    dec_mod.get_upsample_path = lambda: os.path.join(workdir, "upsample.pkl")

    from common.myhand.config import get_cfg_defaults
    from common.myhand.lijun_model_graph import load_graph_model

    if encoder.startswith("hrnet"):
        # The reference's HRnet_encoder.forward returns a 6-tuple
        # (hms, mask, dp, ylist, None, None) (`encoder_lijun.py:196-214`)
        # which HandNET_GCN feeds wholesale into hrnet_mid — a latent
        # crash (the hrnet path is unused by the shipped configs).
        # Restore the resnet-path contract (pyramid only, coarsest first)
        # so the trunk + mid + decoder can be parity-tested.
        from common.myhand import encoder_lijun as enc_mod

        def _pyramid_forward(self, img):
            ylist = self.hrnet(img)
            ylist.reverse()
            return ylist

        enc_mod.HRnet_encoder.forward = _pyramid_forward

    cfg = get_cfg_defaults()
    # our "hrnet_w32" <-> reference "hrnet32" (its name parsing does
    # 'w' + type[type.find('hrnet')+5:], `encoder_lijun.py:152-153`)
    cfg.MODEL.ENCODER_TYPE = (
        encoder.replace("hrnet_w", "hrnet") if encoder.startswith("hrnet")
        else encoder)
    torch.manual_seed(seed)
    model = load_graph_model(cfg)
    model.eval()
    return model, counts


def run_torch_phase(workdir: str, bs: int, seed: int, encoder: str) -> None:
    import torch

    model, counts = build_reference_model(workdir, seed, encoder)

    rng = np.random.default_rng(seed + 123)
    img = rng.normal(0.0, 1.0, (bs, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        result, params_dict, _, _ = model(torch.from_numpy(img))

    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(workdir, "state_dict.npz"), **state)
    np.savez(
        os.path.join(workdir, "torch_out.npz"),
        img=img,
        v3d_left=result["verts3d"]["left"].numpy(),
        v3d_right=result["verts3d"]["right"].numpy(),
        v2d_left=result["verts2d"]["left"].numpy(),
        v2d_right=result["verts2d"]["right"].numpy(),
        scale_left=params_dict["scale"]["left"].numpy(),
        scale_right=params_dict["scale"]["right"].numpy(),
        trans2d_left=params_dict["trans2d"]["left"].numpy(),
        trans2d_right=params_dict["trans2d"]["right"].numpy(),
    )
    print(f"torch phase OK: verts3d_left {result['verts3d']['left'].shape}, "
          f"vNum_out={counts['left']}")


# --------------------------------------------------------------------------
# Phase 3 (main process): our forward on converted weights + comparison
# --------------------------------------------------------------------------

def run_jax_phase(workdir: str, encoder: str) -> dict:
    import jax  # noqa: F811 — platform forced to CPU at module top
    import jax.numpy as jnp

    from renderih_tpu.assets import Assets, _build_hand
    from renderih_tpu.config import Config, ModelConfig, TrainConfig
    from renderih_tpu.graph.coarsen import load_reference_graph_pkl
    from renderih_tpu.mano.params import convert_mano_pkl, load_mano_npz
    from renderih_tpu.models import build_model, model_call_kwargs
    from renderih_tpu.utils.checkpoint_convert import (
        convert_reference_checkpoint,
    )

    hands = {}
    for hand, is_right in (("left", False), ("right", True)):
        pkl = os.path.join(workdir, f"MANO_{hand.upper()}.pkl")
        npz = os.path.join(workdir, f"mano_{hand}.npz")
        convert_mano_pkl(pkl, npz)
        mano = load_mano_npz(npz, is_right=is_right)
        graph = load_reference_graph_pkl(
            os.path.join(workdir, f"graph_{hand}.pkl"))
        hands[hand] = (mano, graph)

    with open(os.path.join(workdir, "upsample.pkl"), "rb") as f:
        upsample = pickle.load(f)
    with open(os.path.join(workdir, "v_color.pkl"), "rb") as f:
        dense = pickle.load(f)

    assets = Assets(
        left=_build_hand(*hands["left"], dense_color=dense, upsample=upsample),
        right=_build_hand(*hands["right"], dense_color=dense, upsample=upsample),
    )

    cfg = Config(model=ModelConfig(encoder=encoder),
                 train=TrainConfig(precision="f32"))
    model = build_model(cfg, assets)

    state = dict(np.load(os.path.join(workdir, "state_dict.npz")))
    params, batch_stats = convert_reference_checkpoint(state, encoder=encoder)
    variables = {"params": params, "batch_stats": batch_stats}

    ref = np.load(os.path.join(workdir, "torch_out.npz"))
    img = jnp.asarray(ref["img"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    call_kwargs = model_call_kwargs(cfg, assets)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False, **call_kwargs))
    out = fwd(variables, img)

    deltas = {}
    for key, ours in (
        ("v3d_left", out.verts3d["left"]), ("v3d_right", out.verts3d["right"]),
        ("v2d_left", out.verts2d["left"]), ("v2d_right", out.verts2d["right"]),
        ("scale_left", out.scale["left"]), ("scale_right", out.scale["right"]),
        ("trans2d_left", out.trans2d["left"]),
        ("trans2d_right", out.trans2d["right"]),
    ):
        d = np.max(np.abs(np.asarray(ours) - ref[key]))
        if key.startswith("v2d"):
            # verts2d is in PIXEL units: scale*256*xy + trans*128 + 128
            # (projection verified formula-identical; the x256 gain would
            # otherwise dominate the report) — compare in image-normalized
            # units like everything else.
            d = d / 256.0
        deltas[key] = float(d)
    return deltas


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_vs_reference")
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--encoder", default="resnet50")
    p.add_argument("--atol", type=float, default=1e-4)
    p.add_argument("--phase", choices=["all", "torch", "jax"], default="all")
    args = p.parse_args(argv)

    if args.phase == "torch":
        run_torch_phase(args.workdir, args.bs, args.seed, args.encoder)
        return 0

    if args.phase == "all":
        write_mano_pkls(args.workdir, args.seed)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", "torch",
             "--workdir", args.workdir, "--bs", str(args.bs),
             "--seed", str(args.seed), "--encoder", args.encoder],
            cwd=REPO,
        )
        if proc.returncode != 0:
            print("torch phase FAILED")
            return 1

    deltas = run_jax_phase(args.workdir, args.encoder)
    worst = max(deltas.values())
    for k, v in sorted(deltas.items()):
        print(f"  max|Δ{k}| = {v:.3e}")
    ok = worst <= args.atol
    print(f"parity_vs_reference [{args.encoder}]: worst {worst:.3e} "
          f"{'OK' if ok else f'EXCEEDS atol {args.atol}'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
