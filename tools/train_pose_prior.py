#!/usr/bin/env python
"""Train the pose-naturalness discriminator and save it as an artifact.

Reference capability: `pose_data_optimize/Ver2Code/Discriminator/
discrim.py:66-105` — a GAN discriminator scoring pose plausibility, used
as the naturalness prior during pose optimization. The reference ships
the architecture but NOT the weights; this tool trains our
`PoseDiscriminator` (models/aux_nets.py) on the synthetic plausible-pose
corpus (the same distribution `tools/synth_gen.py` samples hands from)
against three families of implausible negatives, and saves a small npz
artifact consumable by `optimize.geo.make_gan_pose_prior`.

  python tools/train_pose_prior.py --out renderih_tpu/assets_data/pose_prior.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from renderih_tpu.models.aux_nets import PoseDiscriminator  # noqa: E402
from renderih_tpu.ops.rotation import rodrigues  # noqa: E402
from renderih_tpu.optimize.geo import save_pose_prior  # noqa: E402


def sample_real(key, n):
    """Plausible poses: the synthetic corpus distribution
    (`tools/synth_gen.py` samples pose ~ N(0, 0.3^2))."""
    return jax.random.normal(key, (n, 45)) * 0.3


def sample_fake(key, n):
    """Implausible negatives, three families mixed:
    (a) hyper-extended joints (large-angle axis-angle, up to pi),
    (b) sign-flipped plausible poses (backwards bends),
    (c) heavy-tailed noise (2.5x the plausible scale)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    third = n // 3
    axis = jax.random.normal(k1, (third, 15, 3))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    angle = jax.random.uniform(k2, (third, 15, 1), minval=1.8, maxval=3.1)
    a = (axis * angle).reshape(third, 45)
    b = -jnp.abs(sample_real(k3, third)) * 3.0
    c = jax.random.normal(k4, (n - 2 * third, 45)) * 0.75
    fake = jnp.concatenate([a, b, c], axis=0)
    return jax.random.permutation(k5, fake)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="renderih_tpu/assets_data/pose_prior.npz")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    disc = PoseDiscriminator()
    key = jax.random.PRNGKey(args.seed)
    params = disc.init(key, jnp.zeros((1, 15, 3, 3)))["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    def loss_fn(params, real_aa, fake_aa):
        def logits(aa):
            pj, ov = disc.apply({"params": params},
                                rodrigues(aa.reshape(-1, 15, 3)))
            return pj, ov

        pj_r, ov_r = logits(real_aa)
        pj_f, ov_f = logits(fake_aa)
        # LSGAN objective (stable, no saturation): real -> 1, fake -> 0.
        loss = (jnp.mean((pj_r - 1.0) ** 2) + jnp.mean((ov_r - 1.0) ** 2)
                + jnp.mean(pj_f ** 2) + jnp.mean(ov_f ** 2))
        acc = 0.5 * (jnp.mean(ov_r > 0.5) + jnp.mean(ov_f < 0.5))
        return loss, acc

    @jax.jit
    def train_step(params, opt, key):
        k1, k2 = jax.random.split(key)
        real = sample_real(k1, args.batch)
        fake = sample_fake(k2, args.batch)
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, real, fake)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, acc

    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt, loss, acc = train_step(params, opt, sub)
        if (i + 1) % 250 == 0 or i == 0:
            print(f"step {i + 1}/{args.steps}: loss {float(loss):.4f} "
                  f"acc {float(acc):.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_pose_prior(params, args.out)
    print(f"saved {args.out}")

    # sanity: plausible poses must score above randomized ones
    kr, kf = jax.random.split(jax.random.PRNGKey(123))
    _, ov_r = disc.apply({"params": params},
                         rodrigues(sample_real(kr, 512).reshape(-1, 15, 3)))
    _, ov_f = disc.apply({"params": params},
                         rodrigues(sample_fake(kf, 512).reshape(-1, 15, 3)))
    print(f"mean realism logit: plausible {float(ov_r.mean()):.3f} "
          f"vs randomized {float(ov_f.mean()):.3f}")
    assert float(ov_r.mean()) > float(ov_f.mean())


if __name__ == "__main__":
    main()
