#!/usr/bin/env python
"""Cross-framework parity for the ViTPose encoder variant.

Runs the reference ViT fork (`models/vitpose/vitpose.py:296-455`) plus
the two-hand wrapper's pyramid plumbing (8-stride PatchEmbed + conv1 +
`Myattention` downsample, `common/myhand/lijun_vitpose.py:20-35`) on CPU
with random weights, converts the state_dict with
`convert_vit_wrapper`, and asserts our `ViTEncoder` reproduces the
full [f8, f16, f32] pyramid + global feature.

The released `pretrain/vitpose-{b,l}.pth` files are not in this image;
this proves the CONVERTER + architecture are weight-exact, which is the
testable half of pretrained-weight support (the pth layout equals the
backbone subset exercised here, `convert_vitpose_backbone`).

  python tools/parity_vit.py [--bs 2] [--model vit_base]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = os.environ.get("RENDERIH_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)

# CPU by design, configured before anything can touch the backend —
# f32-vs-f32 comparison, independent of TPU reachability.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def run_torch_phase(workdir: str, bs: int, seed: int, model_type: str) -> None:
    sys.path.insert(0, os.path.join(REPO, "tools", "ref_stubs"))
    sys.path.insert(0, REFERENCE)
    import torch

    from models.vitpose.vitpose import (
        Myattention,
        PatchEmbed,
        vit_base_patch16_224,
        vit_large_patch16_224,
    )

    torch.manual_seed(seed)
    factory = (vit_base_patch16_224 if model_type == "vit_base"
               else vit_large_patch16_224)
    # drop_path_rate=0: vit_large's default 0.5 is train-only noise but
    # DropPath is identity only in eval mode, which we set anyway
    encoder = factory(pretrained=False, img_size=256)
    d = encoder.embed_dim

    class EncWrapper(torch.nn.Module):
        """The encoder half of `lijun_vitpose.HandNET_GCN` (`:20-35`)."""

        def __init__(self):
            super().__init__()
            self.encoder = encoder
            self.patch_embed = PatchEmbed(img_size=256, patch_size=8,
                                          embed_dim=d)
            self.conv1 = torch.nn.Conv2d(d, d, kernel_size=1)
            self.downsample = Myattention(d, d)

        def forward(self, img):
            f16 = self.encoder(img)
            f32, _ = self.patch_embed(img)
            f32 = f32.permute(0, 2, 1).reshape(-1, d, 32, 32).contiguous()
            f32 = self.conv1(
                f32 + torch.nn.functional.interpolate(f16, scale_factor=2))
            f8 = self.downsample(f16, 16, 16)
            gf = torch.nn.functional.adaptive_avg_pool2d(f16, 1).reshape(-1, d)
            return f8, f16, f32, gf

    model = EncWrapper()
    model.eval()

    rng = np.random.default_rng(seed + 123)
    img = rng.normal(0.0, 1.0, (bs, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        f8, f16, f32, gf = model(torch.from_numpy(img))

    os.makedirs(workdir, exist_ok=True)
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(workdir, "vit_state.npz"), **state)
    np.savez(os.path.join(workdir, "vit_out.npz"), img=img,
             f8=f8.numpy(), f16=f16.numpy(), f32=f32.numpy(), gf=gf.numpy())
    print(f"torch vit phase OK: f8 {tuple(f8.shape)} f16 {tuple(f16.shape)} "
          f"f32 {tuple(f32.shape)}")


def run_jax_phase(workdir: str, model_type: str) -> dict:
    import jax  # noqa: F811 — platform forced to CPU at module top
    import jax.numpy as jnp

    from renderih_tpu.models.vit import ViTEncoder
    from renderih_tpu.utils.checkpoint_convert import convert_vit_wrapper

    state = dict(np.load(os.path.join(workdir, "vit_state.npz")))
    params = convert_vit_wrapper(state, model_type)

    ref = np.load(os.path.join(workdir, "vit_out.npz"))
    img = jnp.asarray(ref["img"].transpose(0, 2, 3, 1))

    model = ViTEncoder(model_type=model_type)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    f8, f16, f32 = fwd(params, img)
    gf = jnp.mean(f16, axis=(1, 2))

    def nchw(a):
        return np.asarray(a).transpose(0, 3, 1, 2)

    return {
        "f8": float(np.max(np.abs(nchw(f8) - ref["f8"]))),
        "f16": float(np.max(np.abs(nchw(f16) - ref["f16"]))),
        "f32": float(np.max(np.abs(nchw(f32) - ref["f32"]))),
        "gf": float(np.max(np.abs(np.asarray(gf) - ref["gf"]))),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_vit")
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", default="vit_base")
    p.add_argument("--atol", type=float, default=1e-3)
    p.add_argument("--phase", choices=["all", "torch", "jax"], default="all")
    args = p.parse_args(argv)

    if args.phase == "torch":
        run_torch_phase(args.workdir, args.bs, args.seed, args.model)
        return 0

    if args.phase == "all":
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", "torch",
             "--workdir", args.workdir, "--bs", str(args.bs),
             "--seed", str(args.seed), "--model", args.model], cwd=REPO)
        if proc.returncode != 0:
            print("torch phase FAILED")
            return 1

    deltas = run_jax_phase(args.workdir, args.model)
    worst = max(deltas.values())
    for k, v in sorted(deltas.items()):
        print(f"  max|Δ{k}| = {v:.3e}")
    ok = worst <= args.atol
    print(f"parity_vit [{args.model}]: worst {worst:.3e} "
          f"{'OK' if ok else f'EXCEEDS atol {args.atol}'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
