#!/usr/bin/env python
"""Decompose train-step time: forward+loss vs backward vs loss terms.

The full step at bs128 runs ~6.1x the inference forward (143.6 ms vs
23.4 ms) where ~3x is typical for fwd+bwd+opt — this tool locates the
excess. Variants timed (chained state, scalar-fetch clock, tunnel-proof):

  fwd_loss     loss value only (no grad)
  grad_full    value_and_grad of the full two-hand graph loss
  grad_simple  value_and_grad of plain L2 on final verts (no normal/edge/
               coarse/upsample terms) -- isolates loss-term backward cost
  full_step    the real train step (grad + optimizer + BN merge)

  BENCH_BATCH=128 python tools/bench_train_profile.py
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


def timeit(fn, arg, iters=10):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    x = arg
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    # chained scalar fetch
    r0 = time.perf_counter()
    jax.block_until_ready(x)
    rtt = time.perf_counter() - r0
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.data.synthetic import synthetic_batch
    from renderih_tpu.losses.graph_loss import GraphLossWeights, two_hand_graph_loss
    from renderih_tpu.models import init_model, model_call_kwargs
    from renderih_tpu.train.state import create_train_state
    from renderih_tpu.train.trainer import make_train_step

    cfg = Config()
    b = int(os.environ.get("BENCH_BATCH", "128"))
    cfg.train.batch_size = b
    if os.environ.get("BENCH_REMAT"):  # A/B: remat encoder blocks
        cfg.train.remat_encoder = True
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    kw = model_call_kwargs(cfg, assets)
    weights = GraphLossWeights()
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=b)
    rng = jax.random.PRNGKey(2)

    def loss_full(params, bstats, batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, batch["img"],
            train=True, **kw, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        total, _ = two_hand_graph_loss(
            out, batch, assets, 100, weights,
            upsample_weight=params["decoder"]["upsample_weight"],
            img_size=256)
        return total

    def loss_simple(params, bstats, batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, batch["img"],
            train=True, **kw, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        t = 0.0
        for hand in ("left", "right"):
            t = t + jnp.mean(
                (out.verts3d[hand] - batch[f"v3d_{hand}"]) ** 2)
        return t

    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    # chain through a tiny perturbation of the image so iterations depend
    def chain(fn):
        @jax.jit
        def run(img):
            b2 = dict(batch); b2["img"] = img
            v = fn(params, bstats, b2)
            return img + (v * 1e-12).astype(img.dtype)
        return run

    def chain_grad(fn):
        @jax.jit
        def run(img):
            b2 = dict(batch); b2["img"] = img
            v, g = jax.value_and_grad(fn)(params, bstats, b2)
            # consume EVERY grad leaf — consuming just one lets XLA
            # dead-code-eliminate most of the backward pass
            gsum = sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(g))
            return img + (v * 1e-12 + gsum * 1e-12).astype(img.dtype)
        return run

    img = batch["img"]
    if os.environ.get("BENCH_COST") == "lower":
        # flop-count-only path: no compiles, no timing (CPU-friendly)
        def flops_of(fn):
            ca = jax.jit(fn).lower(img).cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0))

        f_fwd = flops_of(chain(loss_full))
        f_gf = flops_of(chain_grad(loss_full))
        print(f"XLA flops  fwd+loss   : {f_fwd/1e12:7.3f} TF")
        print(f"XLA flops  grad(full) : {f_gf/1e12:7.3f} TF")
        print(f"flops ratio grad/fwd  : {f_gf/f_fwd:7.2f}")
        return

    t_fwd = timeit(chain(loss_full), img)
    print(f"bs={b} fwd+loss            : {t_fwd*1e3:7.2f} ms", flush=True)
    t_gs = timeit(chain_grad(loss_simple), img)
    print(f"bs={b} grad(simple L2)     : {t_gs*1e3:7.2f} ms", flush=True)
    t_gf = timeit(chain_grad(loss_full), img)
    print(f"bs={b} grad(full loss)     : {t_gf*1e3:7.2f} ms", flush=True)

    if os.environ.get("BENCH_PARTS"):
        # Localize the backward: encoder(+mid) alone vs decoder alone.
        from renderih_tpu.models.resnet import ResNet

        enc = ResNet(model_type=cfg.model.encoder,
                     dtype=jnp.bfloat16 if cfg.train.precision == "bf16"
                     else jnp.float32)
        ev = enc.init(jax.random.PRNGKey(0), batch["img"], train=False)

        def enc_loss(p, bs_, img):
            fmaps, mut = enc.apply(
                {"params": p, "batch_stats": bs_}, img, train=True,
                mutable=["batch_stats"])
            return sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in fmaps)

        def chain_grad_enc(img):
            v, g = jax.value_and_grad(enc_loss)(
                ev["params"], ev.get("batch_stats", {}), img)
            gsum = sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(g))
            return img + (v * 1e-12 + gsum * 1e-12).astype(img.dtype)

        t_enc_f = timeit(jax.jit(lambda img: img + 1e-12 * sum(
            jnp.mean(f.astype(jnp.float32) ** 2) for f in enc.apply(
                ev, img, train=False)).astype(img.dtype)), img)
        t_enc = timeit(jax.jit(chain_grad_enc), img)
        print(f"bs={b} encoder fwd         : {t_enc_f*1e3:7.2f} ms")
        print(f"bs={b} encoder fwd+bwd     : {t_enc*1e3:7.2f} ms "
              f"(ratio {t_enc/t_enc_f:4.2f})", flush=True)

    if os.environ.get("BENCH_COST"):
        # XLA cost analysis: compare the flop count of the forward-only
        # program vs the grad program. If flops ratio ~= measured time
        # ratio, the backward runs at the forward's (conv-ceiling)
        # efficiency and there is no backward-specific inefficiency to
        # chase. (BENCH_COST=lower returns earlier with flop counts only —
        # no compiles — for running during TPU-tunnel outages.)
        def flops_of(fn):
            c = jax.jit(fn).lower(img).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0))
        f_fwd = flops_of(chain(loss_full))
        f_gf = flops_of(chain_grad(loss_full))
        print(f"XLA flops  fwd+loss      : {f_fwd/1e12:7.3f} TF "
              f"({f_fwd/t_fwd/1e12:6.2f} TF/s)")
        print(f"XLA flops  grad(full)    : {f_gf/1e12:7.3f} TF "
              f"({f_gf/t_gf/1e12:6.2f} TF/s)")
        print(f"flops ratio grad/fwd     : {f_gf/f_fwd:7.2f}  "
              f"time ratio: {t_gf/t_fwd:7.2f}")

    state = create_train_state(cfg, variables, steps_per_epoch=100)
    step, _ = make_train_step(cfg, model, assets, steps_per_epoch=100,
                              params_template=variables["params"])
    state, terms = step(state, batch, rng)
    float(terms["total"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, terms = step(state, batch, rng)
    float(terms["total"])
    t_full = (time.perf_counter() - t0) / iters
    print(f"bs={b} full step           : {t_full*1e3:7.2f} ms", flush=True)
    print(f"loss-term backward excess : {(t_gf-t_gs)*1e3:7.2f} ms")
    print(f"optimizer+BN+guard        : {(t_full-t_gf)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
