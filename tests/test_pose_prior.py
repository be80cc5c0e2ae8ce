"""Trained pose-naturalness prior (tools/train_pose_prior.py +
optimize/geo.make_gan_pose_prior).

Reference capability: `pose_data_optimize/Ver2Code/Discriminator/
discrim.py:66-105` (GAN naturalness prior; weights not shipped by the
reference, trained here on the synthetic plausible-pose corpus).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARTIFACT = os.path.join(REPO, "renderih_tpu", "assets_data", "pose_prior.npz")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Committed artifact if present, else a quick in-test training run."""
    if os.path.exists(ARTIFACT):
        return ARTIFACT
    out = str(tmp_path_factory.mktemp("prior") / "pose_prior.npz")
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    # Strip the axon TPU plugin (it ignores JAX_PLATFORMS and would try
    # to reach the tunnel from the child process).
    ppath = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(ppath)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_pose_prior.py"),
         "--out", out, "--steps", "400"],
        check=True, cwd=REPO, env=env,
    )
    return out


def test_prior_roundtrip_save_load(tmp_path):
    from renderih_tpu.models.aux_nets import PoseDiscriminator
    from renderih_tpu.optimize.geo import load_pose_prior, save_pose_prior

    disc = PoseDiscriminator()
    params = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 15, 3, 3)))[
        "params"]
    path = str(tmp_path / "p.npz")
    save_pose_prior(params, path)
    loaded = load_pose_prior(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_prior_ranks_plausible_above_randomized(trained):
    from renderih_tpu.optimize.geo import load_pose_prior, make_gan_pose_prior

    prior = make_gan_pose_prior(load_pose_prior(trained))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    plausible = jax.random.normal(k1, (64, 45)) * 0.3
    axis = jax.random.normal(k2, (64, 15, 3))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    angle = jax.random.uniform(k3, (64, 15, 1), minval=1.8, maxval=3.1)
    randomized = (axis * angle).reshape(64, 45)

    e_plaus = jnp.stack([prior(p) for p in plausible])
    e_rand = jnp.stack([prior(p) for p in randomized])
    # lower energy = more natural
    assert float(e_plaus.mean()) < float(e_rand.mean())
    # strongly separated, not a coin flip
    assert float((e_plaus[:, None] < e_rand[None, :]).mean()) > 0.9


def test_gan_prior_is_differentiable(trained):
    from renderih_tpu.optimize.geo import load_pose_prior, make_gan_pose_prior

    prior = make_gan_pose_prior(load_pose_prior(trained))
    g = jax.grad(prior)(jnp.zeros(45))
    assert g.shape == (45,)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0.0
