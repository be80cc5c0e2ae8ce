#!/usr/bin/env python
"""Training-step throughput on one chip (chained timing, tunnel-proof).

The train step donates state, so the natural chaining (state feeds the
next step) already defeats laziness; the clock stops on a scalar fetch
of the final loss.

  BENCH_BATCH=64 python tools/bench_train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.data.synthetic import synthetic_batch
    from renderih_tpu.models import init_model
    from renderih_tpu.train.state import create_train_state
    from renderih_tpu.train.trainer import make_train_step

    cfg = Config()
    b = int(os.environ.get("BENCH_BATCH", "64"))
    cfg.train.batch_size = b
    if os.environ.get("BENCH_NAN_GUARD", "") == "0":  # A/B knob
        cfg.train.nan_guard = False
    if os.environ.get("BENCH_REMAT"):  # A/B knob: remat encoder blocks
        cfg.train.remat_encoder = True
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables, steps_per_epoch=100)
    step, _ = make_train_step(cfg, model, assets, steps_per_epoch=100,
                              params_template=variables["params"])

    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=b)
    rng = jax.random.PRNGKey(2)

    state, terms = step(state, batch, rng)
    float(terms["total"])  # compile + sync

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, terms = step(state, batch, rng)
    float(terms["total"])
    r0 = time.perf_counter()
    float(terms["total"])
    rtt = time.perf_counter() - r0
    dt = time.perf_counter() - t0 - rtt
    print(f"train bs={b}: {dt/iters*1e3:.2f} ms/step, "
          f"ips={b*iters/dt:.1f} img/s/chip (fetch rtt {rtt*1e3:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
