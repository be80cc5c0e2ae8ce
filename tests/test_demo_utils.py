"""Demo-app pure-math utilities: smoother + padding (no model forward).

Reference behaviors: constant-acceleration smoothing
(`apps/demo.py:103-128`) and square padding before the crop
(`core/test_utils.py` preprocessing).
"""

import numpy as np

from renderih_tpu.apps.demo import ConstantAccelSmoother, pad_to_square


def test_smoother_first_call_is_identity():
    s = ConstantAccelSmoother(blend=0.5)
    x = np.array([1.0, 2.0])
    np.testing.assert_array_equal(s(x), x)


def test_smoother_tracks_constant_velocity_exactly():
    """A constant-velocity stream has zero steady-state lag (the filter's
    ramp error decays geometrically, |z| = sqrt(1-b) per step)."""
    s = ConstantAccelSmoother(blend=0.3)
    v = np.array([0.5, -1.0])
    x = np.zeros(2)
    for _ in range(150):
        x = x + v
        out = s(x)
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_smoother_damps_jitter():
    """Alternating +/- noise around a fixed point: smoothed variance must
    be below raw variance."""
    rng = np.random.default_rng(0)
    s = ConstantAccelSmoother(blend=0.4)
    raw, smooth = [], []
    for _ in range(200):
        x = rng.normal(0.0, 1.0, 3)
        raw.append(x)
        smooth.append(s(x))
    assert np.var(np.stack(smooth)[50:]) < np.var(np.stack(raw)[50:])


def test_smoother_blend_one_passes_through():
    s = ConstantAccelSmoother(blend=1.0)
    s(np.array([0.0]))
    for v in (3.0, -2.0, 7.5):
        np.testing.assert_allclose(s(np.array([v])), [v])


def test_pad_to_square_shapes_and_content():
    img = np.arange(2 * 6 * 3, dtype=np.uint8).reshape(2, 6, 3)
    out = pad_to_square(img)
    assert out.shape == (6, 6, 3)
    # original rows live centered; padding is zeros
    top = (6 - 2) // 2
    np.testing.assert_array_equal(out[top : top + 2], img)
    assert np.all(out[:top] == 0) and np.all(out[top + 2 :] == 0)

    sq = np.ones((4, 4, 3), np.uint8)
    np.testing.assert_array_equal(pad_to_square(sq), sq)
