"""Graph validator: accepts valid graphs, flags corrupted ones.

Mirrors the reference validator test strategy
(reference: tests/test_validate_graph_script.py:97-202).
"""

import numpy as np
import pytest
import yaml

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.validate_graph import main, validate_graph_directory


@pytest.fixture(scope="module")
def graphs(tmp_path_factory):
    root = tmp_path_factory.mktemp("vg")
    ds = DummyDatastore(n_grid_x=30, n_grid_y=30, root_path=root)
    dirs = {}
    for name, hier in (("multiscale", False), ("hierarchical", True)):
        d = ds.root_path / "graph" / name
        create_graph_from_datastore(ds, d, hierarchical=hier)
        dirs[name] = d
    return ds, dirs


@pytest.mark.parametrize("name", ["multiscale", "hierarchical"])
def test_valid_graphs_pass(graphs, name):
    ds, dirs = graphs
    errors = validate_graph_directory(
        dirs[name], num_grid_nodes=ds.num_grid_points
    )
    assert errors == []
    assert main([str(dirs[name]), "--num_grid_nodes", "900"]) == 0


def _copy_graph(src, dst):
    dst.mkdir(parents=True)
    for f in src.iterdir():
        (dst / f.name).write_bytes(f.read_bytes())


def _rewrite_npz(graph_dir, mutate):
    with np.load(graph_dir / "graph.npz") as data:
        arrays = {k: data[k] for k in data.files}
    mutate(arrays)
    np.savez_compressed(graph_dir / "graph.npz", **arrays)


def test_detects_out_of_range_indices(graphs, tmp_path):
    _, dirs = graphs
    bad = tmp_path / "bad1"
    _copy_graph(dirs["multiscale"], bad)

    def mutate(arrays):
        arrays["g2m_receivers"] = arrays["g2m_receivers"].copy()
        arrays["g2m_receivers"][0] = 10**6

    _rewrite_npz(bad, mutate)
    errors = validate_graph_directory(bad, num_grid_nodes=900)
    assert any("out of range" in e for e in errors)


def test_detects_wrong_dtype_and_length_column(graphs, tmp_path):
    _, dirs = graphs
    bad = tmp_path / "bad2"
    _copy_graph(dirs["multiscale"], bad)

    def mutate(arrays):
        arrays["m2g_senders"] = arrays["m2g_senders"].astype(np.int64)
        feats = arrays["g2m_features"].copy()
        feats[:, 0] = 1e9
        arrays["g2m_features"] = feats

    _rewrite_npz(bad, mutate)
    errors = validate_graph_directory(bad, num_grid_nodes=900)
    assert any("dtype" in e for e in errors)
    assert any("edge length" in e for e in errors)


def test_detects_broken_mirror_and_bad_meta(graphs, tmp_path):
    _, dirs = graphs
    bad = tmp_path / "bad3"
    _copy_graph(dirs["hierarchical"], bad)

    def mutate(arrays):
        arrays["mesh_down__0_senders"] = (
            arrays["mesh_down__0_senders"][::-1].copy()
        )

    _rewrite_npz(bad, mutate)
    errors = validate_graph_directory(bad)
    assert any("mirror" in e for e in errors)

    meta = yaml.safe_load((bad / "metainfo.yaml").read_text())
    meta["spec_version"] = "bogus"
    (bad / "metainfo.yaml").write_text(yaml.safe_dump(meta))
    errors = validate_graph_directory(bad)
    assert any("spec_version" in e for e in errors)


def test_detects_missing_files(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    errors = validate_graph_directory(empty)
    assert len(errors) == 2
    assert main([str(empty)]) == 1
