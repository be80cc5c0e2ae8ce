import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.data.synthetic import synthetic_batch
from renderih_tpu.losses import (
    GraphLossWeights,
    edge_length_loss,
    normal_loss,
    sigmoid_focal_loss,
    dice_loss,
    smooth_l1,
    two_hand_graph_loss,
)
from renderih_tpu.models.decoder import DecoderOutput
from renderih_tpu.ops.projection import orthographic_project


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(seed=0)


def test_smooth_l1_matches_torch_def():
    pred = jnp.asarray([0.0, 0.5, 2.0])
    tgt = jnp.zeros(3)
    # |d|<1 -> 0.5 d^2 ; else |d|-0.5
    want = np.mean([0.0, 0.5 * 0.25, 1.5])
    np.testing.assert_allclose(float(smooth_l1(pred, tgt)), want, rtol=1e-6)


def test_normal_edge_zero_for_identical(assets):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(2, 778, 3)).astype(np.float32))
    faces = assets.left.mano.faces
    assert float(normal_loss(v, v, faces)) < 1e-5
    assert float(edge_length_loss(v, v, faces)) == 0.0


def _perfect_output(assets, batch, img_size=256.0):
    """DecoderOutput whose predictions equal ground truth."""
    from renderih_tpu.graph.ops import graph_pool_avg, vert_to_gcn

    v3d = {
        "left": batch["v3d_left"],
        "right": batch["v3d_right"] + batch["root_rel"][:, None, :],
    }
    v2d = {"left": batch["v2d_left"], "right": batch["v2d_right"]}
    coarse3d, coarse2d = {}, {}
    for hand, ha in (("left", assets.left), ("right", assets.right)):
        gcn3 = vert_to_gcn(v3d[hand], ha.perm)
        gcn2 = vert_to_gcn(v2d[hand], ha.perm)
        coarse3d[hand] = [graph_pool_avg(gcn3, 4)]
        coarse2d[hand] = [graph_pool_avg(gcn2, 4)]
    b = batch["root_rel"].shape[0]
    return DecoderOutput(
        verts3d=v3d, verts2d=v2d,
        scale={"left": jnp.ones(b), "right": jnp.ones(b)},
        trans2d={"left": jnp.zeros((b, 2)), "right": jnp.zeros((b, 2))},
        coarse_verts3d=coarse3d, coarse_verts2d=coarse2d,
        mano_pose=None, mano_shape=None,
    )


def test_zero_loss_on_perfect_prediction(assets):
    batch = synthetic_batch(assets, jax.random.PRNGKey(0), batch_size=2)
    out = _perfect_output(assets, batch)
    total, terms = two_hand_graph_loss(out, batch, assets, epoch=100)
    assert float(terms["vert3d"]) < 1e-6
    assert float(terms["vert2d"]) < 1e-8
    assert float(terms["joint"]) < 1e-6
    assert float(terms["edge"]) < 1e-6
    # normal loss ~0 for identical meshes
    assert float(terms["normal"]) < 1e-4
    assert float(total) < 0.05


def test_loss_positive_on_wrong_prediction(assets):
    batch = synthetic_batch(assets, jax.random.PRNGKey(0), batch_size=2)
    out = _perfect_output(assets, batch)
    wrong = out._replace(
        verts3d={k: v + 0.01 for k, v in out.verts3d.items()}
    )
    total, terms = two_hand_graph_loss(wrong, batch, assets, epoch=100)
    assert float(terms["vert3d"]) > 1e-6
    assert float(total) > 0.0


def test_edge_loss_gated_by_epoch(assets):
    batch = synthetic_batch(assets, jax.random.PRNGKey(0), batch_size=2)
    out = _perfect_output(assets, batch)
    noisy = out._replace(
        verts3d={k: v * 1.1 for k, v in out.verts3d.items()}
    )
    w = GraphLossWeights()
    t_early, _ = two_hand_graph_loss(noisy, batch, assets, epoch=0, weights=w)
    t_late, _ = two_hand_graph_loss(noisy, batch, assets, epoch=60, weights=w)
    assert float(t_late) > float(t_early)


def test_upsample_anchor(assets):
    batch = synthetic_batch(assets, jax.random.PRNGKey(0), batch_size=2)
    out = _perfect_output(assets, batch)
    w = assets.left.upsample_init
    _, terms0 = two_hand_graph_loss(
        out, batch, assets, epoch=0, upsample_weight=w
    )
    assert float(terms0["upsample_norm"]) == 0.0
    _, terms1 = two_hand_graph_loss(
        out, batch, assets, epoch=0, upsample_weight=w + 0.1
    )
    assert float(terms1["upsample_norm"]) > 0.0


def test_focal_and_dice():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert float(sigmoid_focal_loss(logits, targets)) < 1e-4
    pred = jnp.ones((1, 8, 8))
    assert float(dice_loss(pred, pred)) < 1e-3


def test_normal_loss_gated_by_normal_epoch(assets):
    """normal_epoch > 0 keeps the normal term out of the total until that
    epoch (from-scratch lever; 0 = reference-parity always-on,
    `core/Loss.py:262`)."""
    batch = synthetic_batch(assets, jax.random.PRNGKey(0), batch_size=2)
    out = _perfect_output(assets, batch)
    noisy = out._replace(
        verts3d={k: v * 0.05 for k, v in out.verts3d.items()}
    )
    w = GraphLossWeights(label_3d=0.0, label_2d=0.0, edge=0.0,
                         upsample=0.0, normal=10.0, normal_epoch=50)
    t_early, terms = two_hand_graph_loss(noisy, batch, assets, epoch=0,
                                         weights=w)
    t_late, _ = two_hand_graph_loss(noisy, batch, assets, epoch=50,
                                    weights=w)
    assert float(terms["normal"]) > 0.0   # term still reported
    assert float(t_early) == 0.0          # ...but gated out of the total
    assert float(t_late) > 0.0
    # default (normal_epoch=0) keeps reference parity: always on
    t_ref, _ = two_hand_graph_loss(noisy, batch, assets, epoch=0,
                                   weights=GraphLossWeights(
                                       label_3d=0.0, label_2d=0.0,
                                       edge=0.0, upsample=0.0))
    assert float(t_ref) > 0.0


def test_fit_orthographic_cam_recovers_generator_camera(assets):
    """Closed-form camera refit (the GT for `loss.camera`): on scene-mode
    synthetic labels it must recover the generating shared camera
    exactly, and survive device_augment's rotation/flip unchanged in
    residual (labels stay an exact orthographic projection)."""
    from renderih_tpu.data.pipeline import device_augment
    from renderih_tpu.losses.graph_loss import fit_orthographic_cam
    from renderih_tpu.ops.projection import orthographic_project

    batch = synthetic_batch(assets, jax.random.PRNGKey(3), batch_size=4,
                            scene=True, with_cam=True, with_img=False)
    s, t = fit_orthographic_cam(batch["v3d_left"], batch["v2d_left"], 256.0)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(batch["cam_scale_left"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t),
                               np.asarray(batch["cam_trans_left"]),
                               atol=1e-3)

    # through augmentation: refit on the augmented labels, reproject,
    # compare to the augmented v2d (right hand carries root_rel)
    batch["img_u8"] = jnp.zeros((4, 256, 256, 3), jnp.uint8)
    aug = device_augment(batch, jax.random.PRNGKey(5), train=True)
    v3 = aug["v3d_right"] + aug["root_rel"][:, None, :]
    s2, t2 = fit_orthographic_cam(v3, aug["v2d_right"], 256.0)
    uv = orthographic_project(s2, t2, v3, 256.0)
    err = float(jnp.abs(uv - aug["v2d_right"]).max())
    assert err < 0.1, err  # px


def test_camera_loss_wiring(assets):
    """weight 0 -> term reported but total unchanged; weight > 0 -> a
    wrong predicted camera is penalized, a perfect one is not."""
    batch = synthetic_batch(assets, jax.random.PRNGKey(0), batch_size=2)
    out = _perfect_output(assets, batch)
    w_off = GraphLossWeights()
    t_off, terms = two_hand_graph_loss(out, batch, assets, epoch=100,
                                       weights=w_off)
    assert float(terms["camera"]) == 0.0

    from renderih_tpu.losses.graph_loss import fit_orthographic_cam

    v3_r = batch["v3d_right"] + batch["root_rel"][:, None, :]
    cams = {"left": fit_orthographic_cam(batch["v3d_left"],
                                         batch["v2d_left"], 256.0),
            "right": fit_orthographic_cam(v3_r, batch["v2d_right"], 256.0)}
    out = out._replace(scale={h: cams[h][0] for h in cams},
                       trans2d={h: cams[h][1] for h in cams})
    w_on = GraphLossWeights(camera=10.0)
    t_good, terms_g = two_hand_graph_loss(out, batch, assets, epoch=100,
                                          weights=w_on)
    assert float(terms_g["camera"]) < 1e-6
    bad = out._replace(scale={k: v * 0.05 for k, v in out.scale.items()})
    t_bad, terms_b = two_hand_graph_loss(bad, batch, assets, epoch=100,
                                         weights=w_on)
    assert float(terms_b["camera"]) > 0.1
    assert float(t_bad) > float(t_good)
