import numpy as np
import jax.numpy as jnp
import pytest

from renderih_tpu.graph import (
    build_adjacency,
    build_graph_levels,
    cheby_conv,
    gcn_to_vert,
    graph_pool_avg,
    graph_pool_max,
    graph_upsample,
    vert_to_gcn,
)
from renderih_tpu.mano import make_synthetic_mano


@pytest.fixture(scope="module")
def graph():
    model = make_synthetic_mano(seed=0)
    return build_graph_levels(np.asarray(model.faces), levels=4)


def test_adjacency_symmetric_binary():
    model = make_synthetic_mano(seed=0)
    adj = build_adjacency(np.asarray(model.faces))
    assert (abs(adj - adj.T)).sum() == 0
    assert set(np.unique(adj.data)) == {1.0}
    assert adj.diagonal().sum() == 0


def test_levels_binary_tree(graph):
    counts = graph.node_counts
    assert len(counts) == 5
    for a, b in zip(counts[:-1], counts[1:]):
        assert a == 2 * b
    assert counts[0] >= graph.num_verts == 778


def test_laplacian_spectrum_rescaled(graph):
    for lap in graph.laplacians:
        # rescaled to [-1, 1]: symmetric, eigs within tolerance
        assert np.allclose(lap, lap.T, atol=1e-5)
        eigs = np.linalg.eigvalsh(lap.astype(np.float64))
        assert eigs.min() >= -1.01 and eigs.max() <= 1.01


def test_perm_roundtrip(graph):
    x = np.random.default_rng(0).normal(size=(2, graph.num_verts, 3)).astype(np.float32)
    gx = vert_to_gcn(jnp.asarray(x), jnp.asarray(graph.perm))
    assert gx.shape[1] == graph.node_counts[0]
    back = gcn_to_vert(gx, jnp.asarray(graph.perm_reverse))
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_perm_cut_covers_real_vertices_only(graph):
    assert graph.perm.min() >= 0
    assert graph.perm.max() < graph.num_verts
    assert len(np.unique(graph.perm)) == graph.num_verts


def test_pool_upsample():
    x = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
    avg = graph_pool_avg(x, 2)
    assert avg.shape == (2, 4, 3)
    np.testing.assert_allclose(
        np.asarray(avg[0, 0]), np.asarray((x[0, 0] + x[0, 1]) / 2)
    )
    mx = graph_pool_max(x, 2)
    np.testing.assert_allclose(np.asarray(mx[0, 0]), np.asarray(x[0, 1]))
    up = graph_upsample(avg, 2)
    assert up.shape == (2, 8, 3)
    np.testing.assert_allclose(np.asarray(up[0, 0]), np.asarray(up[0, 1]))


def test_cheby_conv_oracle(graph):
    """cheby_conv against a straightforward numpy recurrence."""
    rng = np.random.default_rng(1)
    lap = graph.laplacians[-1]  # coarsest, ~63 nodes
    v = lap.shape[0]
    b, fin, fout, k = 2, 5, 7, 3
    x = rng.normal(size=(b, v, fin)).astype(np.float32)
    w = rng.normal(size=(fin * k, fout)).astype(np.float32)

    got = np.asarray(cheby_conv(jnp.asarray(x), jnp.asarray(lap), jnp.asarray(w), k=k))

    x0 = x
    x1 = np.einsum("vw,bwf->bvf", lap, x)
    x2 = 2 * np.einsum("vw,bwf->bvf", lap, x1) - x0
    stacked = np.stack([x0, x1, x2], axis=-1).reshape(b, v, fin * k)
    want = stacked @ w
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_graph_npz_roundtrip(tmp_path, graph):
    p = str(tmp_path / "g.npz")
    graph.save_npz(p)
    g2 = type(graph).load_npz(p)
    assert g2.node_counts == graph.node_counts
    np.testing.assert_allclose(g2.perm, graph.perm)
    np.testing.assert_allclose(g2.laplacians[0], graph.laplacians[0])
