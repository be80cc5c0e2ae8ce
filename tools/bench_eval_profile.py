#!/usr/bin/env python
"""Decompose per-batch eval time: host batch gather, host->device upload,
jitted step on device-resident inputs, scalar download.

Context: BENCH_DETAILS eval_images_per_sec regressed 238.8 -> 132.3 after
the in-jit metrics rewrite; this separates tunnel/transfer cost from the
actual XLA program so the fix targets the right phase.

  python tools/bench_eval_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.data.interhand import make_synthetic_packed
    from renderih_tpu.eval.evaluator import CONVENTIONS
    from renderih_tpu.eval.metrics import two_hand_metrics
    from renderih_tpu.models import init_model, model_call_kwargs
    from renderih_tpu.ops.image import normalize_imagenet

    cfg = Config()
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    call_kwargs = model_call_kwargs(cfg, assets)
    j_reg = {"left": assets.left.j_reg_21, "right": assets.right.j_reg_21}
    root_idx, length_joints = CONVENTIONS["default"]

    bs = 256
    ds = make_synthetic_packed("/tmp/bench_eval_prof", "test", assets, n=512)

    def step(img_u8, v3d_left, v3d_right):
        img = normalize_imagenet(img_u8.astype(jnp.float32) / 255.0)
        out = model.apply(variables, img, train=False, **call_kwargs)
        pred = {"left": out.verts3d["left"], "right": out.verts3d["right"]}
        gt = {"left": v3d_left, "right": v3d_right}
        return two_hand_metrics(pred, gt, j_reg, root_idx=root_idx,
                                length_joints=length_joints)

    step = jax.jit(step)

    # fwd-only control: same program minus the metric tail. It must return
    # per-sample REDUCTIONS, not vertex arrays: the metric program's
    # outputs are small (B,) vectors, so downloading two (B, 778, 3)
    # float32 arrays (~4.8 MB/iter over the slow axon tunnel) here would
    # inflate t_fwd and systematically understate the metric tail.
    def fwd_only(img_u8):
        img = normalize_imagenet(img_u8.astype(jnp.float32) / 255.0)
        out = model.apply(variables, img, train=False, **call_kwargs)
        return (out.verts3d["left"].sum(axis=(1, 2)),
                out.verts3d["right"].sum(axis=(1, 2)))

    fwd_only = jax.jit(fwd_only)

    idx = np.arange(bs)
    t0 = time.perf_counter()
    batch = ds.batch(idx)
    t_gather = time.perf_counter() - t0
    print(f"host batch gather:            {t_gather*1e3:8.1f} ms")

    host = (batch["img_u8"], batch["v3d_left"], batch["v3d_right"])
    nbytes = sum(a.nbytes for a in host)
    print(f"batch payload:                {nbytes/1e6:8.1f} MB")

    # upload (device_put, blocked)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        dev = jax.block_until_ready(jax.device_put(host))
        t_up = time.perf_counter() - t0
        print(f"host->device upload ({tag}):   {t_up*1e3:8.1f} ms"
              f"  ({nbytes/1e6/t_up:.0f} MB/s)")

    # compile both programs (untimed)
    jax.block_until_ready(step(*dev))
    jax.block_until_ready(fwd_only(dev[0]))

    # Timing on device-resident inputs: enqueue all iters, block on the
    # last, then download every output. Both programs return only small
    # (B,)-sized arrays, so the device_get cost is symmetric between them
    # and negligible (one tunnel RTT per iter, same for both).
    def timed(fn, args, iters=8):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        for o in outs:
            jax.device_get(o)
        return (time.perf_counter() - t0) / iters

    t_step = timed(step, dev)
    print(f"jit step (dev-resident):      {t_step*1e3:8.1f} ms"
          f"  ({bs/t_step:.0f} img/s)")
    t_fwd = timed(fwd_only, (dev[0],))
    print(f"fwd only (dev-resident):      {t_fwd*1e3:8.1f} ms"
          f"  ({bs/t_fwd:.0f} img/s)")
    print(f"metric tail:                  {(t_step-t_fwd)*1e3:8.1f} ms")

    # end-to-end with numpy args (what evaluate_packed does per batch)
    jax.block_until_ready(step(*host))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        m = step(*host)
        jax.device_get(m)
    t_np = (time.perf_counter() - t0) / iters
    print(f"step(numpy) + get:            {t_np*1e3:8.1f} ms"
          f"  ({bs/t_np:.0f} img/s)")


if __name__ == "__main__":
    main()
