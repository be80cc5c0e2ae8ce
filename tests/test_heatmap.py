import jax.numpy as jnp
import numpy as np

from renderih_tpu.ops.heatmap import (
    decode_heatmaps_dark,
    gaussian_heatmaps,
    heatmap_argmax,
)


def test_gaussian_peak_at_joint():
    j = jnp.asarray([[[10.0, 20.0], [63.0, 0.0]]])
    hm = gaussian_heatmaps(j)
    assert hm.shape == (1, 2, 64, 64)
    m = np.asarray(hm)
    assert m[0, 0, 20, 10] == np.max(m[0, 0])
    np.testing.assert_allclose(m[0, 0, 20, 10], 1.0, atol=1e-6)


def test_out_of_bounds_joint_zeroed():
    j = jnp.asarray([[[-5.0, 10.0]]])
    hm = gaussian_heatmaps(j)
    assert float(np.asarray(hm).max()) == 0.0


def test_argmax_roundtrip():
    j = jnp.asarray([[[31.0, 7.0], [5.0, 60.0]]])
    hm = gaussian_heatmaps(j)
    xy, vals = heatmap_argmax(hm)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(j), atol=0)


def test_dark_decode_subpixel():
    # put a gaussian at a fractional location; DARK recovers sub-pixel
    j_true = jnp.asarray([[[30.4, 25.7]]])
    hm = gaussian_heatmaps(j_true)
    dec = decode_heatmaps_dark(hm)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(j_true), atol=0.1)
    # integer location also exact
    j_int = jnp.asarray([[[12.0, 40.0]]])
    dec2 = decode_heatmaps_dark(gaussian_heatmaps(j_int))
    np.testing.assert_allclose(np.asarray(dec2), np.asarray(j_int), atol=0.05)
