"""SPMD train/eval steps (jit + sharding; DDP/ZeRO-1 expressed as shardings).

Reference equivalent: the epoch loop body of `train_gcn`
(`core/lijun_trainer.py:233-341`) — forward, `calc_loss_GCN`, backward,
optimizer step — but as one jitted, donated, fully-sharded function:

  * batch is sharded over the mesh 'data' axis; the loss is a global mean,
    so gradients are reduced by XLA over ICI (DDP all-reduce equivalent).
  * optimizer-state leaves are sharded over 'data' (ZeRO-1).
  * optional tensor parallelism over the 'model' axis via param rules.
  * `freeze_upsample` masks the 252->778 upsample weight out of the
    optimizer entirely (matching requires_grad=False +
    "not in optimizer" semantics of the reference,
    `core/lijun_trainer.py:115-116`).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from renderih_tpu.assets import Assets
from renderih_tpu.config import Config
from renderih_tpu.losses.graph_loss import GraphLossWeights, two_hand_graph_loss
from renderih_tpu.models.model import HandNet, model_call_kwargs
from renderih_tpu.parallel.mesh import (
    batch_sharding,
    param_sharding_rules,
    replicated_sharding,
    zero1_sharding,
)
from renderih_tpu.train.state import (
    TrainState,
    make_frozen_optimizer,
    upsample_mask,  # noqa: F401  (re-exported for tests)
)


def loss_weights_from_cfg(cfg: Config) -> GraphLossWeights:
    return GraphLossWeights(
        label_3d=cfg.loss.label_3d,
        label_2d=cfg.loss.label_2d,
        normal=cfg.loss.normal,
        edge=cfg.loss.edge,
        norm_epoch=cfg.loss.norm_epoch,
        normal_epoch=cfg.loss.normal_epoch,
        camera=cfg.loss.camera,
        upsample=cfg.loss.upsample,
    )


def state_shardings(state: TrainState, mesh: Mesh, cfg: Config):
    """NamedShardings for every TrainState leaf."""
    def param_spec(path, leaf):
        keys = "/".join(getattr(k, "key", str(k)) for k in path)
        return NamedSharding(mesh, param_sharding_rules(keys, leaf.shape, mesh))

    params_sh = jax.tree_util.tree_map_with_path(param_spec, state.params)
    rep = replicated_sharding(mesh)
    bs_sh = jax.tree_util.tree_map(lambda _: rep, state.batch_stats)
    opt_sh = (
        zero1_sharding(state.opt_state, mesh)
        if cfg.train.zero1
        else jax.tree_util.tree_map(lambda _: rep, state.opt_state)
    )
    ema_sh = (jax.tree_util.tree_map_with_path(param_spec, state.ema_params)
              if state.ema_params is not None else None)
    return TrainState(step=rep, params=params_sh, batch_stats=bs_sh,
                      opt_state=opt_sh, ema_params=ema_sh)


def shard_train_state(state: TrainState, mesh: Mesh, cfg: Config) -> TrainState:
    sh = state_shardings(state, mesh, cfg)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_train_step(
    cfg: Config,
    model: HandNet,
    assets: Assets,
    steps_per_epoch: int,
    mesh: Mesh | None = None,
    params_template=None,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""
    call_kwargs = model_call_kwargs(cfg, assets)
    weights = loss_weights_from_cfg(cfg)
    tx = make_frozen_optimizer(cfg, steps_per_epoch, params_template)

    accum = max(1, int(getattr(cfg.train, "grad_accum", 1)))

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        epoch = state.step // steps_per_epoch

        def loss_fn(params, bstats, mb, mrng):
            out, mutated = model.apply(
                {"params": params, "batch_stats": bstats},
                mb["img"],
                train=True,
                **call_kwargs,
                rngs={"dropout": mrng},
                mutable=["batch_stats"],
            )
            up_w = params["decoder"]["upsample_weight"]
            total, terms = two_hand_graph_loss(
                out, mb, assets, epoch, weights,
                upsample_weight=up_w, img_size=cfg.model.img_size,
            )
            # Aux-head supervision (`calc_aux_loss`, `core/Loss.py:180-198`)
            # when the heads are on and the batch has rendered targets.
            # Without stored targets, the joint-heatmap target is
            # synthesized ON DEVICE from the (augmented) 2D joints —
            # deep supervision that makes the encoder trainable from
            # scratch. The reference never trains a cold encoder: its
            # ResNetSimple is built with pretrained=True (ImageNet),
            # `common/myhand/encoder_lijun.py:330-334`; without that
            # warm start (no ImageNet weights in this container) the
            # attention decoder collapses to the dataset-mean pose and
            # conditioning never develops (round-5 probes:
            # runs/probe_{albedo,noaug,f32}).
            if cfg.model.with_aux_heads and out.aux is not None:
                from renderih_tpu.losses.graph_loss import aux_losses

                if "hms" not in mb:
                    from renderih_tpu.ops.heatmap import gaussian_heatmaps

                    s = out.aux["hms"].shape[1]
                    j_all = jnp.concatenate(
                        [mb["j2d_left"], mb["j2d_right"]], axis=1)
                    hms = gaussian_heatmaps(
                        j_all * (s / float(cfg.model.img_size)), size=s,
                        sigma=max(s / 32.0, 1.0))
                    mb = {**mb, "hms": jnp.transpose(hms, (0, 2, 3, 1))}
                at = aux_losses(out.aux, mb, w_mask=cfg.loss.mask,
                                w_dense=cfg.loss.dense, w_hms=cfg.loss.hms)
                total = total + at["total"]
                terms = {**terms,
                         **{f"aux_{k}": v for k, v in at.items()
                            if k != "total"},
                         "total": total}
            # MANO-parameter supervision for the `mano` decoder variant
            # (reference `mano_loss_GCN`, `core/Loss_mano.py:245-335`).
            if cfg.model.decoder == "mano" and "pose_left" in mb:
                from renderih_tpu.losses.mano_loss import mano_param_losses

                mt = mano_param_losses(out, mb)
                total = total + (
                    cfg.loss.mano_pose * mt["pose"]
                    + cfg.loss.mano_shape * mt["shape"]
                    + mt["shape_reg"]
                )
                terms = {**terms, **{f"mano_{k}": v for k, v in mt.items()},
                         "total": total}
            return total, (terms, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accum == 1:
            (_, (terms, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
        else:
            # Gradient accumulation: scan over `accum` sequential
            # micro-batches (peak activation memory scales with the
            # micro-batch), summing gradients and loss terms in the carry
            # and chaining BN statistics through, then apply the averaged
            # gradient exactly once. The per-step semantics (step counter,
            # LR schedule, EMA, NaN guard over the AVERAGED gradient) are
            # identical to the unaccumulated path.
            b = batch["img"].shape[0]
            assert b % accum == 0, (
                f"batch_size {b} not divisible by grad_accum {accum}")
            micro = jax.tree_util.tree_map(
                lambda v: v.reshape(accum, b // accum, *v.shape[1:]), batch)
            rngs = jax.random.split(rng, accum)
            first = jax.tree_util.tree_map(lambda v: v[0], micro)
            out_sd = jax.eval_shape(grad_fn, state.params,
                                    state.batch_stats, first, rng)
            (_, (terms_sd, _)), grads_sd = out_sd
            zeros = lambda sd: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), sd)

            inv = jnp.float32(1.0 / accum)

            def body(carry, xs):
                bstats, gsum, tsum = carry
                mb, r = xs
                if mesh is not None:
                    mb = jax.tree_util.tree_map(
                        lambda v: jax.lax.with_sharding_constraint(
                            v, NamedSharding(mesh, P("data"))), mb)
                (_, (t_i, nbs)), g_i = grad_fn(state.params, bstats, mb, r)
                # Divide each micro-batch gradient by `accum` BEFORE
                # summing (order-stable: for accum=2 on duplicated
                # micro-batches, g/2 + g/2 == g exactly; sum-then-divide
                # is not float-associative with the plain gradient).
                gsum = jax.tree_util.tree_map(
                    lambda s, g: s + g * inv.astype(g.dtype), gsum, g_i)
                tsum = jax.tree_util.tree_map(
                    lambda s, t: s + t * inv.astype(t.dtype), tsum, t_i)
                return (nbs, gsum, tsum), None

            (new_bs, grads, terms), _ = jax.lax.scan(
                body, (state.batch_stats, zeros(grads_sd), zeros(terms_sd)),
                (micro, rngs))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = cfg.train.ema_decay
        new_ema = (jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p,
            state.ema_params, new_params) if d > 0 else None)
        new_step = state.step + 1
        if cfg.train.nan_guard:
            # Production safety: a non-finite loss OR gradient (bad batch,
            # bf16 backward overflow can produce inf grads under a finite
            # loss) must not poison params/optimizer/BN state. Keep the
            # old state for that step and report it. `step` also stays
            # put so the step counter equals the number of applied
            # updates and the LR schedule (optax count) never drifts from
            # it. The reference has no equivalent (NaNs only get filtered
            # at eval aggregation, `core/lijun_trainer.py:506-515`).
            ok = jnp.isfinite(terms["total"]) & jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)),
                grads, jnp.asarray(True),
            )
            # One lax.cond over the whole state tuple, NOT per-leaf
            # jnp.where selects: the per-leaf form makes XLA:CPU compile
            # pathologically slow (measured 930 s for a step that takes
            # 97 s without it; TPU is fine either way), which broke the
            # 8-virtual-device CPU dryrun two rounds running. A single
            # conditional that forwards tuples is near-free for every
            # backend. EMA only advances on applied updates (reverted
            # params would otherwise still drag the average).
            new_params, new_opt, new_bs, new_ema = jax.lax.cond(
                ok,
                lambda: (new_params, new_opt, new_bs, new_ema),
                lambda: (state.params, state.opt_state, state.batch_stats,
                         state.ema_params if new_ema is not None else None),
            )
            new_step = state.step + ok.astype(state.step.dtype)
            terms = {**terms,
                     "skipped_nonfinite": 1.0 - ok.astype(jnp.float32)}
        new_state = TrainState(
            step=new_step,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, terms

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0), tx

    assert params_template is not None
    state_sh = None

    def jitted(state, batch, rng):
        nonlocal state_sh
        if state_sh is None:
            state_sh = state_shardings(state, mesh, cfg)
        fn = jax.jit(
            step_fn,
            in_shardings=(
                state_sh,
                jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch),
                replicated_sharding(mesh),
            ),
            out_shardings=(state_sh, None),
            donate_argnums=0,
        )
        return fn(state, batch, rng)

    return jitted, tx


def make_fused_cached_step(cfg: Config, step_fn, base_rng):
    """Fuse gather + augment + train step into ONE jitted dispatch.

    The device-cache training path (`apps/train.py`): the packed split
    lives in HBM, each iteration gathers its batch, augments and steps
    on device. Unfused, a loop iteration costs 4-5 dispatches (gather,
    two fold_ins, aug, step); on a host with a slow control link (this
    container's tunnel: ~29 ms RTT) that dominated the step — 210 img/s
    observed in the round-4 convergence run vs the 890 img/s bare-step
    bench. One dispatch restores the compute-bound rate.

    `step_fn` is `make_train_step(...)[0]`; `base_rng` seeds the
    per-step augmentation/dropout keys via fold_in(step index).
    Signature of the returned jit: (state, cache, idx, step_i) ->
    (state, terms), donating state.
    """
    from renderih_tpu.data.pipeline import device_augment

    def _fused(state, cache, idx, step_i):
        b = jax.tree_util.tree_map(
            lambda a: jnp.take(a, idx, axis=0), cache)
        key = jax.random.fold_in(base_rng, step_i)
        b = device_augment(
            b, jax.random.fold_in(key, 1),
            img_size=cfg.model.img_size,
            theta_range=tuple(cfg.data.theta_range),
            scale_range=tuple(cfg.data.scale_range),
            uv_range=tuple(cfg.data.uv_range),
            flip=cfg.data.flip, noise=cfg.data.noise,
            bone_length=cfg.data.bone_length, train=True,
        )
        return step_fn(state, b, jax.random.fold_in(key, 2))

    return jax.jit(_fused, donate_argnums=0)


def make_eval_step(cfg: Config, model: HandNet, assets: Assets):
    """Jitted inference step: (variables, img) -> DecoderOutput.

    Sharded (data-parallel) evaluation lives in
    `eval/evaluator.py:evaluate_packed(mesh=...)`, not here.
    """
    call_kwargs = model_call_kwargs(cfg, assets)

    @partial(jax.jit, static_argnums=())
    def eval_step(variables, img):
        return model.apply(variables, img, train=False, **call_kwargs)

    return eval_step
