"""Graph construction/loading behaviour.

Checks the structural invariants the reference asserts
(reference: tests/test_graph_creation.py, create_graph.py:809-849) plus
geometry sanity for both graph flavours.
"""

import numpy as np
import pytest

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import (
    create_graph_from_datastore,
    load_graph,
)


@pytest.fixture(scope="module")
def big_dummy(tmp_path_factory):
    # 30x30 grid -> nlev=3, 2 mesh levels (bottom 9x9, top 3x3)
    root = tmp_path_factory.mktemp("ds")
    return DummyDatastore(n_grid_x=30, n_grid_y=30, root_path=root)


@pytest.mark.parametrize("hierarchical", [False, True])
def test_create_and_load_graph(big_dummy, hierarchical, tmp_path):
    name = "hierarchical" if hierarchical else "multiscale"
    graph_dir = big_dummy.root_path / "graph" / name
    create_graph_from_datastore(
        big_dummy, graph_dir, hierarchical=hierarchical
    )
    assert (graph_dir / "graph.npz").exists()
    assert (graph_dir / "metainfo.yaml").exists()

    got_hier, g = load_graph(graph_dir, mesh_node_features_scaling=29000.0)
    assert got_hier == hierarchical

    n_grid = 900
    if hierarchical:
        sizes = [f.shape[0] for f in g["mesh_static_features"]]
        assert sizes == [81, 9]
        # up edges: one per lower node; down edges mirrored
        assert g["mesh_up_edge_index"][0].shape[1] == 81
        assert g["mesh_down_edge_index"][0].shape[1] == 81
        np.testing.assert_array_equal(
            g["mesh_up_edge_index"][0][0], g["mesh_down_edge_index"][0][1]
        )
        # up/down features mirror with negated vdiff, same length
        up_f = g["mesh_up_features"][0]
        down_f = g["mesh_down_features"][0]
        np.testing.assert_allclose(up_f[:, 0], down_f[:, 0], rtol=1e-6)
        np.testing.assert_allclose(up_f[:, 1:], -down_f[:, 1:], rtol=1e-6)
        n_bottom_mesh = sizes[0]
        m2m_levels = g["m2m_edge_index"]
        for lev, ei in enumerate(m2m_levels):
            n_l = sizes[lev]
            assert ei.min() >= 0 and ei.max() < n_l
    else:
        assert g["mesh_static_features"].shape == (81, 2)
        n_bottom_mesh = 81
        ei = g["m2m_edge_index"]
        assert ei.min() >= 0 and ei.max() < 81

    # g2m: senders are grid nodes, receivers bottom-mesh nodes
    g2m = g["g2m_edge_index"]
    assert g2m[0].max() < n_grid and g2m[0].min() >= 0
    assert g2m[1].max() < n_bottom_mesh
    # every bottom mesh node receives at least one grid edge
    assert len(np.unique(g2m[1])) == n_bottom_mesh

    # m2g: exactly 4 mesh senders per grid receiver
    m2g = g["m2g_edge_index"]
    assert m2g.shape[1] == 4 * n_grid
    assert m2g[1].max() < n_grid and m2g[0].max() < n_bottom_mesh
    counts = np.bincount(m2g[1], minlength=n_grid)
    assert (counts == 4).all()

    # feature normalisation: longest m2m edge == 1.0
    if hierarchical:
        longest = max(f[:, 0].max() for f in g["m2m_features"])
    else:
        longest = g["m2m_features"][:, 0].max()
    np.testing.assert_allclose(longest, 1.0, rtol=1e-6)
    # edge length column equals vector norm of vdiff columns
    feat = g["g2m_features"]
    np.testing.assert_allclose(
        feat[:, 0], np.sqrt((feat[:, 1:] ** 2).sum(-1)), rtol=1e-5
    )

    # mesh coordinates normalised by grid span -> within ~[0, 1]
    msf = (
        g["mesh_static_features"]
        if not hierarchical
        else g["mesh_static_features"][0]
    )
    assert np.abs(msf).max() <= 1.0 + 1e-6


def test_multiscale_quad_grid_edge_count(big_dummy):
    # bottom level 9x9: directed edges = 2*(2*n*(n-1)) axis + 2*2*(n-1)^2 diag
    graph_dir = big_dummy.root_path / "graph" / "multiscale"
    _, g = load_graph(graph_dir, mesh_node_features_scaling=29000.0)
    n = 9
    level0 = 2 * 2 * n * (n - 1) + 4 * (n - 1) ** 2
    n2 = 3
    level1 = 2 * 2 * n2 * (n2 - 1) + 4 * (n2 - 1) ** 2
    assert g["m2m_edge_index"].shape[1] == level0 + level1


def test_coarse_level_nodes_coincide_with_bottom(big_dummy):
    """Multiscale level-1 edges connect bottom nodes at stride 3, offset 1."""
    graph_dir = big_dummy.root_path / "graph" / "multiscale"
    _, g = load_graph(graph_dir, mesh_node_features_scaling=29000.0)
    ei = g["m2m_edge_index"]
    n = 9
    # nodes touched by the coarse level: (1+3i)*9 + (1+3j)
    coarse_nodes = {(1 + 3 * i) * n + (1 + 3 * j) for i in range(3) for j in range(3)}
    # the last level1 edges in the array are the coarse ones
    coarse_edges = ei[:, -24:]  # 3x3 quad grid has 24 directed edges
    assert set(coarse_edges.flatten()) <= coarse_nodes


def test_graph_too_small_raises(tmp_path):
    ds = DummyDatastore(n_grid_x=5, n_grid_y=5, root_path=tmp_path)
    with pytest.raises(ValueError):
        create_graph_from_datastore(ds, tmp_path / "graph" / "x")


def test_unsupported_spec_version(tmp_path, big_dummy):
    import shutil

    import yaml

    src = big_dummy.root_path / "graph" / "multiscale"
    dst = tmp_path / "bad"
    shutil.copytree(src, dst)
    with open(dst / "metainfo.yaml", "w") as f:
        yaml.dump({"spec_version": "9.9.9", "n_levels": 1}, f)
    with pytest.raises(ValueError):
        load_graph(dst, 1.0)
