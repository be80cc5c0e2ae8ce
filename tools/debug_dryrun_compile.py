#!/usr/bin/env python
"""Bisect dryrun_multichip compile time on CPU.

Usage (ALWAYS in a plugin-stripped CPU child, fresh scratch cache):

  env -u PYTHONPATH JAX_PLATFORMS=cpu JAX_CACHE_DIR=/tmp/nocache_$RANDOM \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/debug_dryrun_compile.py <variant>

Variants: plain (no mesh), mesh_full, mesh_nonan, mesh_nozero, mesh_dp,
mesh_nofreeze, mesh_sgd.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax

t_import = time.time()


def main():
    variant = sys.argv[1]
    from dataclasses import replace

    import __graft_entry__ as g
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.data.synthetic import synthetic_batch
    from renderih_tpu.models import init_model
    from renderih_tpu.parallel.mesh import make_mesh, shard_batch
    from renderih_tpu.train.state import create_train_state
    from renderih_tpu.train.trainer import make_train_step, shard_train_state

    n = 8
    model_axis = 1 if variant == "mesh_dp" else 2
    cfg = g._dryrun_cfg(model_axis, n)
    if variant == "mesh_nonan":
        cfg = replace(cfg, train=replace(cfg.train, nan_guard=False))
    if variant == "mesh_nozero":
        cfg = replace(cfg, train=replace(cfg.train, zero1=False))
    if variant == "mesh_nofreeze":
        cfg = replace(cfg, model=replace(cfg.model, freeze_upsample=False))
    if variant == "mesh_sgd":
        cfg = replace(cfg, train=replace(cfg.train, optimizer="sgd"))

    t0 = time.time()
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    print(f"[{variant}] init done +{time.time() - t0:.1f}s", flush=True)

    mesh = None if variant == "plain" else make_mesh(
        data=n // model_axis, model=model_axis)
    state = create_train_state(cfg, variables, steps_per_epoch=10)
    if mesh is not None:
        state = shard_train_state(state, mesh, cfg)
    step, _ = make_train_step(cfg, model, assets, steps_per_epoch=10,
                              mesh=mesh, params_template=variables["params"])
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=n,
                            img_size=cfg.model.img_size)
    if mesh is not None:
        batch = shard_batch(batch, mesh)
    t0 = time.time()
    state, terms = step(state, batch, jax.random.PRNGKey(2))
    loss = float(terms["total"])
    print(f"[{variant}] step compile+run +{time.time() - t0:.1f}s "
          f"loss={loss:.3f}", flush=True)


if __name__ == "__main__":
    main()
