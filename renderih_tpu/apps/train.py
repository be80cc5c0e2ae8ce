"""Training CLI.

Usage (mirrors the reference `apps/train.py` surface, but SPMD — no
process spawning; all local devices are used through one mesh):

  python -m renderih_tpu.apps.train --cfg configs/flagship.yaml \
      [--data /path/to/packed] [--epochs N] [--synthetic]

Reference equivalent: `apps/train.py` + `core/lijun_trainer.py:train_gcn`.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from renderih_tpu.assets import load_assets
from renderih_tpu.config import load_config
from renderih_tpu.data.interhand import PackedInterHand, make_synthetic_packed
from renderih_tpu.data.pipeline import DataProvider, device_augment
from renderih_tpu.models import init_model
from renderih_tpu.parallel.mesh import make_mesh, shard_batch
from renderih_tpu.train.state import (
    create_train_state,
    restore_checkpoint,
    save_checkpoint,
)
from renderih_tpu.train.trainer import make_train_step, shard_train_state
from renderih_tpu.utils.metrics_writer import MetricsWriter

log = logging.getLogger("renderih_tpu.train")


def _write_eval_overlays(writer, step, cfg, model, variables, assets,
                         eval_dataset, n: int = 2, _prev={}):
    """Render pred-vs-GT mesh overlays for the first `n` eval samples.

    The TPU-native take on the reference's render-to-TB scaffolding
    (`utils/tb_utils.py:48-111`, `core/vis_train.py:64`): prediction
    rendered with its own predicted orthographic camera, GT rendered with
    a camera fit from the packed 2D labels, side by side over the input.
    """
    from renderih_tpu.models import model_call_kwargs
    from renderih_tpu.ops.image import normalize_imagenet
    from renderih_tpu.render.renderer import TwoHandRenderer

    b = eval_dataset.batch(np.arange(n))
    img01 = jnp.asarray(b["img_u8"], jnp.float32) / 255.0
    out = model.apply(variables, normalize_imagenet(img01), train=False,
                      **model_call_kwargs(cfg, assets))
    renderer = TwoHandRenderer(assets, img_size=cfg.model.img_size)
    rgb, mask = renderer.render_rgb_orth(
        out.scale, out.trans2d, out.verts3d["left"], out.verts3d["right"])
    pred = renderer.overlay(img01, rgb, mask)

    # GT camera: least-squares orthographic fit of v2d ~ s*S*xy + t
    S = float(cfg.model.img_size)
    gt_sc, gt_tr = {}, {}
    for hand in ("left", "right"):
        v3 = jnp.asarray(b[f"v3d_{hand}"])
        v2 = jnp.asarray(b[f"v2d_{hand}"])
        xy = v3[..., :2]
        xym = xy - xy.mean(axis=1, keepdims=True)
        uvm = v2 - v2.mean(axis=1, keepdims=True)
        s = (jnp.sum(xym * uvm, axis=(1, 2))
             / jnp.maximum(jnp.sum(xym * xym, axis=(1, 2)), 1e-9)) / S
        t = (v2.mean(axis=1) - s[:, None] * S * xy.mean(axis=1)
             - S / 2.0) / (S / 2.0)
        gt_sc[hand], gt_tr[hand] = s, t
    rgb_gt, mask_gt = renderer.render_rgb_orth(
        gt_sc, gt_tr, jnp.asarray(b["v3d_left"]), jnp.asarray(b["v3d_right"]))
    gt = renderer.overlay(img01, rgb_gt, mask_gt)

    deltas = {}
    for k in range(n):
        side = np.concatenate(
            [np.asarray(pred[k]), np.asarray(gt[k])], axis=1)
        writer.write_image(step, f"eval/overlay_{k}", side)
        # Receipt that the pred panel tracks the model: mean-abs pixel
        # delta vs the previous overlay write. Round-4's overlays were
        # byte-identical across evals (a stalled model predicting the
        # mean pose renders the same mesh every time) and nothing
        # surfaced it; a 0.0 here now names the problem in metrics.jsonl.
        if k in _prev:
            deltas[f"overlay_{k}_delta"] = float(
                np.abs(side.astype(np.float32) - _prev[k]).mean())
        _prev[k] = side.astype(np.float32)
    if deltas:
        writer.write(step, deltas, prefix="eval/")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--data", type=str, default=None,
                        help="packed dataset dir (see tools/pack_data.py)")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on a synthetic packed dataset (smoke)")
    parser.add_argument("--synth_n", type=int, default=256,
                        help="synthetic train-split size (test = n/4)")
    parser.add_argument("--synth_eval_n", type=int, default=None,
                        help="held-out synthetic eval set size "
                             "(default synth_n // 4)")
    parser.add_argument("--synth_seed", type=int, default=0,
                        help="train-split generator seed (the test split "
                             "always uses seed 1; a different seed gives "
                             "fresh samples at a CACHED batch shape - "
                             "n-sized one-shot generation compiles per "
                             "shape, and a new shape pays a full remote "
                             "compile)")
    parser.add_argument("--synth_render", action="store_true",
                        help="rasterize the labeled hands into the "
                             "synthetic images (learnable image->pose "
                             "task; convergence runs) instead of noise")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path, or 'auto' to pick the newest "
                             "checkpoint in cfg.train.checkpoint_dir")
    parser.add_argument("--steps", type=int, default=None,
                        help="hard cap on total steps (smoke runs)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (TPU pod slices)")
    args = parser.parse_args(argv)

    if args.multihost:
        # Multi-host SPMD: one process per host, all devices in one mesh.
        # Coordinator/host-count discovery comes from the TPU environment
        # (replaces the reference's MASTER_ADDR/MASTER_PORT rendezvous,
        # `core/lijun_trainer.py:76-80`).
        jax.distributed.initialize()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    cfg = load_config(args.cfg)
    if args.epochs:
        cfg.train.epochs = args.epochs

    assets = load_assets(cfg.assets)
    mesh = make_mesh(data=cfg.train.mesh_data, model=cfg.train.mesh_model)
    n_data = mesh.shape["data"]
    log.info("mesh: data=%d model=%d devices=%s", n_data,
             mesh.shape["model"], jax.devices()[0].platform)

    eval_dataset = None
    if args.synthetic or not args.data:
        root = os.path.join(cfg.train.checkpoint_dir, "_synth_data")
        dataset = make_synthetic_packed(root, "train", assets,
                                        n=args.synth_n,
                                        seed=args.synth_seed,
                                        render_images=args.synth_render)
        # held-out split so in-train eval (and its EMA variant) is
        # exercised by synthetic smoke runs too
        eval_dataset = make_synthetic_packed(root, "test", assets,
                                             n=args.synth_eval_n
                                             or max(args.synth_n // 4, 16),
                                             seed=1,
                                             render_images=args.synth_render)
        log.info("synthetic dataset: %d samples", len(dataset))
    else:
        dataset = PackedInterHand.load(args.data, "train")
        log.info("packed dataset: %d samples", len(dataset))
        test_labels = os.path.join(args.data, "test_labels.npz")
        if os.path.exists(test_labels):
            eval_dataset = PackedInterHand.load(args.data, "test")
            log.info("eval dataset: %d samples", len(eval_dataset))

    global_batch = cfg.train.batch_size * n_data
    provider = DataProvider(dataset, batch_size=global_batch,
                            host_id=jax.process_index(),
                            num_hosts=jax.process_count(),
                            seed=cfg.train.seed)
    steps_per_epoch = max(provider.batch_per_epoch, 1)

    # Device-resident data cache (single-device runs): upload the packed
    # split once, gather each batch on device. Streaming re-uploads
    # ~25 MB/batch at bs128, which bounds throughput on slow host links;
    # the cache restores the compute-bound training rate (mirrors the
    # eval cache, `eval/evaluator.py:evaluate_packed`).
    sample_mb = (dataset.batch(np.arange(1))["img_u8"].nbytes
                 + 2 * 778 * 3 * 4 + 4096) / 1e6
    cache = None
    if (cfg.train.data_device_cache_mb > 0
            and len(dataset) * sample_mb <= cfg.train.data_device_cache_mb
            and mesh.devices.size == 1):
        t_up = time.perf_counter()
        full = dataset.batch(np.arange(len(dataset)))
        cache = jax.device_put({k: jnp.asarray(v) for k, v in full.items()})
        jax.block_until_ready(cache)
        del full
        gather = jax.jit(lambda c, idx: jax.tree_util.tree_map(
            lambda a: jnp.take(a, idx, axis=0), c))
        log.info("device data cache: %d samples, %.0f MB, uploaded in %.1fs",
                 len(dataset), len(dataset) * sample_mb,
                 time.perf_counter() - t_up)

    rng = jax.random.PRNGKey(cfg.train.seed)
    model, variables = init_model(cfg, assets, rng)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    log.info("model: %s, %.2fM params", cfg.model.encoder, n_params / 1e6)

    state = create_train_state(cfg, variables, steps_per_epoch)
    resume_path = args.resume
    if resume_path == "auto":
        from renderih_tpu.train.state import latest_checkpoint

        resume_path = latest_checkpoint(cfg.train.checkpoint_dir)
        log.info("resume auto: %s", resume_path or "no checkpoint found")
    if resume_path:
        state = restore_checkpoint(resume_path, state)
        log.info("resumed from %s at step %d", resume_path, int(state.step))
    state = shard_train_state(state, mesh, cfg)

    # Preemption safety: on SIGTERM save a 'preempt' checkpoint and exit;
    # `--resume auto` picks it up on restart. (The reference has no
    # preemption story — weights-only saves every SAVE_GAP epochs,
    # `core/lijun_trainer.py:343-355`.)
    import signal

    _preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        _preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_sigterm)
    # SA_RESTART: without it, a SIGTERM landing while the main thread
    # blocks inside a PJRT wait (device_get at a log step) interrupts
    # the wait with EINTR; the axon plugin's RPC layer then drops the
    # response and the waiter deadlocks (observed: trainer stuck in
    # futex_do_wait forever while the device serves other processes).
    # Auto-restarting the syscall lets the wait complete; the flag is
    # still seen at the end of the loop iteration.
    signal.siginterrupt(signal.SIGTERM, False)

    step_fn, _ = make_train_step(cfg, model, assets, steps_per_epoch,
                                 mesh=mesh, params_template=variables["params"])
    aug = jax.jit(lambda b, k: device_augment(
        b, k, img_size=cfg.model.img_size,
        theta_range=tuple(cfg.data.theta_range),
        scale_range=tuple(cfg.data.scale_range),
        uv_range=tuple(cfg.data.uv_range),
        flip=cfg.data.flip, noise=cfg.data.noise,
        bone_length=cfg.data.bone_length, train=True,
    ))

    # Device-cached path: gather + augment + train step fused into ONE
    # jitted program, so each loop iteration is a single dispatch
    # (`make_fused_cached_step` — shared with bench_suite's real-loop
    # throughput receipt).
    fused_step = None
    if cache is not None:
        from renderih_tpu.train.trainer import make_fused_cached_step

        fused_step = make_fused_cached_step(cfg, step_fn, rng)

    from renderih_tpu.train.resilience import run_step_guarded

    writer = MetricsWriter(cfg.train.checkpoint_dir)
    total_steps = args.steps or cfg.train.epochs * steps_per_epoch
    t0 = time.perf_counter()
    step0 = int(jax.device_get(state.step))
    for i in range(step0, total_steps):
        # One guarded step: transient infra failures (axon remote-compile
        # HTTP 500s, `runs/probe_albedo` post-mortem) retry with backoff;
        # anything fatal saves a `crash` checkpoint first (resilience.py).
        if cache is not None:
            def _thunk(state=state, i=i):
                return fused_step(
                    state, cache,
                    jnp.asarray(provider.sampler.next_indices()),
                    jnp.asarray(i, jnp.int32))
        else:
            host_batch = provider.next()
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in host_batch.items()}, mesh
            )
            key = jax.random.fold_in(rng, i)
            batch = aug(batch, jax.random.fold_in(key, 1))

            def _thunk(state=state, batch=batch, key=key):
                return step_fn(state, batch, jax.random.fold_in(key, 2))

        state, terms = run_step_guarded(
            _thunk, state, cfg.train.checkpoint_dir)

        if (i + 1) % cfg.train.log_every == 0 or i == step0:
            terms = jax.device_get(terms)
            dt = time.perf_counter() - t0
            ips = (i + 1 - step0) * global_batch / dt
            log.info(
                "step %d/%d epoch %d loss %.4f (v3d %.4f v2d %.4f joint %.4f) "
                "%.1f img/s",
                i + 1, total_steps, (i + 1) // steps_per_epoch,
                float(terms["total"]), float(terms["vert3d"]),
                float(terms["vert2d"]), float(terms["joint"]), ips,
            )
            writer.write(i + 1, terms, prefix="train/")
            writer.write(i + 1, {"images_per_sec": ips})

        if _preempted["flag"]:
            path = os.path.abspath(
                os.path.join(cfg.train.checkpoint_dir, "preempt"))
            save_checkpoint(path, state)
            log.info("SIGTERM: saved preemption checkpoint %s at step %d",
                     path, i + 1)
            return

        epoch = (i + 1) // steps_per_epoch
        if (i + 1) % steps_per_epoch == 0 and epoch % cfg.train.save_gap == 0:
            path = os.path.abspath(
                os.path.join(cfg.train.checkpoint_dir, f"epoch_{epoch}")
            )
            save_checkpoint(path, state)
            log.info("saved checkpoint %s", path)

        # in-training eval every `eval_every` epochs on the test split
        # (reference `core/lijun_trainer.py:357-569`)
        if (
            eval_dataset is not None
            and (i + 1) % steps_per_epoch == 0
            and epoch % cfg.train.eval_every == 0
        ):
            from renderih_tpu.eval.evaluator import evaluate_packed

            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            summary = evaluate_packed(cfg, model, variables, assets,
                                      eval_dataset, batch_size=global_batch)
            log.info(
                "eval epoch %d: mpjpe %.2f mm mpvpe %.2f mm pa %.2f mm",
                epoch, summary["mpjpe_mm"], summary["mpvpe_mm"],
                summary["pa_mpjpe_mm"],
            )
            writer.write(i + 1, summary, prefix="eval/")
            if cfg.train.vis_every_eval:
                _write_eval_overlays(writer, i + 1, cfg, model, variables,
                                     assets, eval_dataset)
            if state.ema_params is not None:
                ema_summary = evaluate_packed(
                    cfg, model,
                    {"params": state.ema_params,
                     "batch_stats": state.batch_stats},
                    assets, eval_dataset, batch_size=global_batch)
                log.info(
                    "eval epoch %d (EMA): mpjpe %.2f mm mpvpe %.2f mm "
                    "pa %.2f mm", epoch, ema_summary["mpjpe_mm"],
                    ema_summary["mpvpe_mm"], ema_summary["pa_mpjpe_mm"],
                )
                writer.write(i + 1, ema_summary, prefix="eval_ema/")

    final = os.path.abspath(os.path.join(cfg.train.checkpoint_dir, "final"))
    save_checkpoint(final, state)
    log.info("done; final checkpoint at %s", final)
    print(json.dumps({"final_step": int(jax.device_get(state.step))}))


if __name__ == "__main__":
    main()
