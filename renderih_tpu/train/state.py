"""Train state + orbax checkpointing.

Improves on the reference checkpointing (`core/lijun_trainer.py:343-355`,
which saves only the network weights every SAVE_GAP epochs and
fast-forwards the LR scheduler by hand on resume) by checkpointing the
full state: params, batch-norm stats, optimizer state, and step — resume
is exact.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from renderih_tpu.config import Config
from renderih_tpu.train.schedule import warmup_step_decay_schedule


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA of params (cfg.train.ema_decay > 0), else None. None is an
    # empty pytree, so checkpoints and shardings of EMA-less states keep
    # their round-1 structure.
    ema_params: Any = None

    def epoch(self, steps_per_epoch: int) -> jax.Array:
        return self.step // steps_per_epoch


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = warmup_step_decay_schedule(
        base_lr=cfg.train.lr,
        steps_per_epoch=steps_per_epoch,
        warmup_epochs=cfg.train.warmup_epochs,
        decay_step_epochs=cfg.train.lr_decay_step,
        gamma=cfg.train.lr_decay_gamma,
    )
    if cfg.train.optimizer == "adamw":
        return optax.adamw(schedule, weight_decay=cfg.train.weight_decay)
    if cfg.train.optimizer == "rmsprop":
        # reference alternative path (`core/lijun_trainer.py:131-144`)
        return optax.rmsprop(schedule)
    if cfg.train.optimizer == "sgd":
        # No reference equivalent in the recipes; used by equivalence
        # tests (an SGD step exposes the raw gradient: g = (p0 - p1)/lr,
        # which Adam's sign-normalizing first step hides).
        return optax.sgd(schedule)
    raise ValueError(f"unknown optimizer {cfg.train.optimizer}")


def upsample_mask(params) -> Any:
    """True for trainable leaves, False for the frozen upsample weight.

    `freeze_upsample` equivalence with the reference: requires_grad=False
    params are absent from the torch optimizer, so they get neither
    updates *nor* AdamW weight decay (`core/lijun_trainer.py:115-116`).
    """
    def mask(path, _):
        return not any(
            getattr(k, "key", str(k)) == "upsample_weight" for k in path
        )

    return jax.tree_util.tree_map_with_path(mask, params)


def make_frozen_optimizer(cfg: Config, steps_per_epoch: int, params):
    """The canonical optimizer: shared by state init and the train step.

    Freezing uses multi_transform + set_to_zero — NOT optax.masked, whose
    masked-out leaves pass their raw gradients through as updates.
    """
    tx = make_optimizer(cfg, steps_per_epoch)
    if cfg.model.freeze_upsample:
        labels = jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze",
            upsample_mask(params),
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def create_train_state(cfg: Config, variables: dict,
                       steps_per_epoch: int) -> TrainState:
    # Copy: the train step donates the state, which would otherwise delete
    # the caller's `variables` buffers.
    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        jnp.array, variables.get("batch_stats", {})
    )
    tx = make_frozen_optimizer(cfg, steps_per_epoch, params)
    # EMA starts at the current params (no zero-init bias correction
    # needed); a separate copy so donation can't alias them.
    ema = (jax.tree_util.tree_map(jnp.array, params)
           if cfg.train.ema_decay > 0 else None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema,
    )


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(template))


def latest_checkpoint(checkpoint_dir: str) -> str | None:
    """Newest checkpoint under `checkpoint_dir`, or None.

    Recognizes the trainer's own layout: `epoch_<N>` (highest N wins),
    then `preempt`/`crash`/`final`. Reference equivalent: the legacy
    harness globbing `snapshot_*.pth.tar` and restarting from the max
    epoch (`common/base.py:83-93`) — ours also considers the
    preemption-save and the final checkpoint.
    """
    import os
    import re

    if not os.path.isdir(checkpoint_dir):
        return None
    epochs = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m and os.path.isdir(os.path.join(checkpoint_dir, name)):
            epochs.append((int(m.group(1)), name))
    # epoch_N are ordered by N (robust against mtime-resetting copies,
    # e.g. checkpoints rsynced to a fresh VM); only the highest epoch
    # competes with the specials, and that tie is broken by mtime —
    # preempt/final are written by the same run as the epochs next to
    # them, so their relative mtimes are meaningful
    candidates = [max(epochs)[1]] if epochs else []
    for special in ("preempt", "crash", "final"):
        if os.path.isdir(os.path.join(checkpoint_dir, special)):
            candidates.append(special)
    if not candidates:
        return None
    best = max(
        candidates,
        key=lambda n: os.path.getmtime(os.path.join(checkpoint_dir, n)),
    )
    return os.path.abspath(os.path.join(checkpoint_dir, best))
