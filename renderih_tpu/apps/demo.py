"""Two-hand demo: run the model on images and render mesh overlays.

Mirrors `apps/demo.py` + `core/test_utils.py:InterRender`: pad to square,
resize to 256, normalize, forward, render both predicted meshes with the
predicted orthographic cameras over the input. Offline image-directory
mode and a `--live_demo` webcam mode with the same constant-acceleration
temporal smoothing (`apps/demo.py:103-128`).

  python -m renderih_tpu.apps.demo --img_path DIR --save_path OUT [--ckpt C]
  python -m renderih_tpu.apps.demo --live_demo
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import jax

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from renderih_tpu.assets import load_assets
from renderih_tpu.config import load_config
from renderih_tpu.models import init_model, model_call_kwargs
from renderih_tpu.ops.image import normalize_imagenet
from renderih_tpu.render.renderer import TwoHandRenderer


def pad_to_square(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    if h == w:
        return img
    s = max(h, w)
    out = np.zeros((s, s, img.shape[2]), img.dtype)
    y0 = (s - h) // 2
    x0 = (s - w) // 2
    out[y0 : y0 + h, x0 : x0 + w] = img
    return out


class InterRender:
    """Inference + overlay wrapper (reference `core/test_utils.py:19-99`)."""

    def __init__(self, cfg, assets, variables, img_size: int = 256):
        self.cfg = cfg
        self.assets = assets
        self.img_size = img_size
        self.renderer = TwoHandRenderer(assets, img_size)
        model, init_vars = init_model(cfg, assets, jax.random.PRNGKey(0))
        self.variables = variables or init_vars
        call_kwargs = model_call_kwargs(cfg, assets)

        @jax.jit
        def forward(variables, img):
            out = model.apply(variables, img, train=False, **call_kwargs)
            return (out.verts3d["left"], out.verts3d["right"],
                    out.scale["left"], out.scale["right"],
                    out.trans2d["left"], out.trans2d["right"])

        self._forward = forward

    def run_model(self, img_rgb_u8: np.ndarray) -> dict:
        import cv2 as cv

        img = pad_to_square(img_rgb_u8)
        img = cv.resize(img, (self.img_size, self.img_size))
        x = jnp.asarray(img, jnp.float32)[None] / 255.0
        x = normalize_imagenet(x)
        vl, vr, sl, sr, tl, tr = self._forward(self.variables, x)
        return {
            "verts_left": vl, "verts_right": vr,
            "scale": {"left": sl, "right": sr},
            "trans2d": {"left": tl, "right": tr},
            "input": img,
        }

    def render(self, params: dict, alpha: float = 0.9) -> np.ndarray:
        rgb, mask = self.renderer.render_rgb_orth(
            params["scale"], params["trans2d"],
            params["verts_left"], params["verts_right"],
        )
        bg = jnp.asarray(params["input"], jnp.float32)[None] / 255.0
        out = self.renderer.overlay(bg, rgb, mask, alpha)
        return np.asarray(jnp.clip(out[0] * 255.0, 0, 255)).astype(np.uint8)

    def render_other_view(self, params: dict, theta: float = 60.0) -> np.ndarray:
        """Rotated novel view of the predicted meshes on white
        (reference `core/test_utils.py:101-128`): center both hands on the
        midpoint of their mean vertices, rotate about the y axis by
        `theta` degrees, render with a fixed scale-3 orthographic camera.
        """
        vl, vr = params["verts_left"], params["verts_right"]
        c = 0.5 * (jnp.mean(vl, axis=1) + jnp.mean(vr, axis=1))[:, None]
        t = 3.14159 / 180.0 * theta
        rot = jnp.asarray(
            [[np.cos(t), 0.0, np.sin(t)],
             [0.0, 1.0, 0.0],
             [-np.sin(t), 0.0, np.cos(t)]], jnp.float32)
        vl = (vl - c) @ rot
        vr = (vr - c) @ rot
        b = vl.shape[0]
        scale = {h: jnp.full((b,), 3.0) for h in ("left", "right")}
        trans2d = {h: jnp.zeros((b, 2)) for h in ("left", "right")}
        rgb, mask = self.renderer.render_rgb_orth(scale, trans2d, vl, vr)
        white = jnp.ones_like(rgb)
        out = rgb * mask[..., None] + white * (1.0 - mask[..., None])
        return np.asarray(jnp.clip(out[0] * 255.0, 0, 255)).astype(np.uint8)


class ConstantAccelSmoother:
    """Per-parameter constant-acceleration smoothing (`apps/demo.py:103-128`)."""

    def __init__(self, blend: float = 0.5):
        self.blend = blend
        self.prev = None
        self.vel = None

    def __call__(self, value: np.ndarray) -> np.ndarray:
        if self.prev is None:
            self.prev = value
            self.vel = np.zeros_like(value)
            return value
        predicted = self.prev + self.vel
        smoothed = self.blend * value + (1 - self.blend) * predicted
        self.vel = smoothed - self.prev
        self.prev = smoothed
        return smoothed


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default=None)
    from renderih_tpu.apps.weights import add_weight_args, load_eval_variables

    add_weight_args(p)
    p.add_argument("--img_path", type=str, default="demo_in")
    p.add_argument("--save_path", type=str, default="demo_out")
    p.add_argument("--live_demo", action="store_true")
    p.add_argument("--other_view", type=float, default=None,
                   help="also save a novel view rotated by this many degrees")
    args = p.parse_args(argv)

    import cv2 as cv

    cfg = load_config(args.cfg)
    assets = load_assets(cfg.assets)
    variables = None
    if args.ckpt or args.torch_ckpt:
        model, v0 = init_model(cfg, assets, jax.random.PRNGKey(0))
        variables = load_eval_variables(cfg, v0, args)

    runner = InterRender(cfg, assets, variables)

    if args.live_demo:
        cap = cv.VideoCapture(0)
        smoothers = {}
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv.cvtColor(frame, cv.COLOR_BGR2RGB)
            params = runner.run_model(rgb)
            for key in ("verts_left", "verts_right"):
                sm = smoothers.setdefault(key, ConstantAccelSmoother())
                params[key] = jnp.asarray(sm(np.asarray(params[key])))
            out = runner.render(params)
            cv.imshow("renderih_tpu", cv.cvtColor(out, cv.COLOR_RGB2BGR))
            if cv.waitKey(1) & 0xFF == ord("q"):
                break
        cap.release()
        return

    os.makedirs(args.save_path, exist_ok=True)
    images = sorted(
        glob(os.path.join(args.img_path, "*.jpg"))
        + glob(os.path.join(args.img_path, "*.png"))
    )
    for path in images:
        bgr = cv.imread(path)
        rgb = cv.cvtColor(bgr, cv.COLOR_BGR2RGB)
        params = runner.run_model(rgb)
        out = runner.render(params)
        out_path = os.path.join(args.save_path, os.path.basename(path))
        cv.imwrite(out_path, cv.cvtColor(out, cv.COLOR_RGB2BGR))
        print(f"{path} -> {out_path}")
        if args.other_view is not None:
            rotated = runner.render_other_view(params, theta=args.other_view)
            base, ext = os.path.splitext(out_path)
            cv.imwrite(base + "_rot" + ext,
                       cv.cvtColor(rotated, cv.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
