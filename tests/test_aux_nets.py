import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.models.aux_nets import (
    CBAM,
    FPN,
    CrossHandInjection,
    HourglassHead,
    PoseDiscriminator,
)


def test_fpn_shapes():
    pyr = [jnp.zeros((1, 4, 4, 64)), jnp.zeros((1, 8, 8, 32)),
           jnp.zeros((1, 16, 16, 16))]
    m = FPN(out_dim=48)
    v = m.init(jax.random.PRNGKey(0), pyr)
    outs = m.apply(v, pyr)
    assert [o.shape for o in outs] == [
        (1, 4, 4, 48), (1, 8, 8, 48), (1, 16, 16, 48)]


def test_cbam_preserves_shape_and_attends():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    m = CBAM()
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    # attention is multiplicative in (0, 1): |y| <= |x|
    assert float(jnp.abs(y).max()) <= float(jnp.abs(x).max()) + 1e-5


def test_hourglass_head():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 64))
    m = HourglassHead(num_joints=21, width=32, depth=2)
    v = m.init(jax.random.PRNGKey(1), x)
    hm = m.apply(v, x)
    assert hm.shape == (1, 16, 16, 21)
    assert np.all(np.isfinite(np.asarray(hm)))


def test_cross_hand_injection():
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    m = CrossHandInjection(dim=32)
    v = m.init(jax.random.PRNGKey(2), a, b)
    out = m.apply(v, a, b)
    assert out.shape == a.shape
    # injection depends on b
    out2 = m.apply(v, a, b * 2.0)
    assert float(jnp.abs(out - out2).max()) > 0


def test_pose_discriminator():
    from renderih_tpu.ops.rotation import rodrigues

    aa = jax.random.normal(jax.random.PRNGKey(0), (4, 15, 3)) * 0.3
    rm = rodrigues(aa)
    m = PoseDiscriminator()
    v = m.init(jax.random.PRNGKey(1), rm)
    per_joint, overall = m.apply(v, rm)
    assert per_joint.shape == (4, 15)
    assert overall.shape == (4,)
