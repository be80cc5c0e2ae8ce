"""LR schedules (optax) mirroring the reference recipes.

`StepLR_withWarmUp` (`utils/lr_sc.py:159-174`): linear warmup from
init_lr = 1e-2 * base over `warm_up` epochs, then step decay
gamma^((epoch - warmup) // step) with a floor `min_thres`, stepped
per *epoch* in the reference (`core/lijun_trainer.py:148-159`).
Here the schedule is expressed per optimizer step given steps_per_epoch.
"""

from __future__ import annotations

import optax


def warmup_step_decay_schedule(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: int = 3,
    decay_step_epochs: int = 80,
    gamma: float = 0.1,
    min_scale: float = 0.0,
    init_scale: float = 1e-2,
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        warm = init_scale * base_lr + (base_lr - init_scale * base_lr) * (
            epoch / max(warmup_epochs, 1)
        )
        decayed = base_lr * jnp.maximum(
            gamma ** ((epoch - warmup_epochs) // decay_step_epochs), min_scale
        )
        return jnp.where(epoch < warmup_epochs, warm, decayed)

    return schedule


def sgdr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    t_0_epochs: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
    warmup_epochs: int = 1,
) -> optax.Schedule:
    """Cosine restarts with warmup (`SGDR_withWarmUp`, `utils/lr_sc.py:177+`)."""
    warm = optax.linear_schedule(
        init_value=0.0, end_value=base_lr,
        transition_steps=warmup_epochs * steps_per_epoch,
    )
    cosines = []
    t = t_0_epochs
    total = 0
    for _ in range(8):  # enough restarts for any practical run
        cosines.append(
            optax.cosine_decay_schedule(
                base_lr, t * steps_per_epoch, alpha=eta_min / max(base_lr, 1e-12)
            )
        )
        total += t * steps_per_epoch
        t *= t_mult
    return optax.join_schedules(
        [warm] + cosines,
        boundaries=[warmup_epochs * steps_per_epoch]
        + [
            warmup_epochs * steps_per_epoch + sum(
                t_0_epochs * (t_mult**j) * steps_per_epoch for j in range(i + 1)
            )
            for i in range(len(cosines) - 1)
        ],
    )
