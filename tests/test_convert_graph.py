"""Reference .pt graph-dir conversion into the npz spec.

Reference-format fixtures are synthesized with torch.save in the exact
layout the reference writes (spec 0.1.0 and the legacy combined-offset
layout, reference: create_graph.py:120-167, utils.py:340-487), then
converted and loaded through the normal model path.
"""

from pathlib import Path

import numpy as np
import pytest
import torch
import yaml

from neural_lam_tpu.convert_graph import convert_reference_graph
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.graphs.load import load_graph
from neural_lam_tpu.models import GraphLAM, HiLAM


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("convgraph_ds")
    store = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=10, root_path=root
    )
    create_graph_from_datastore(
        store, store.root_path / "graph" / "multiscale", hierarchical=False
    )
    create_graph_from_datastore(
        store, store.root_path / "graph" / "hierarchical", hierarchical=True
    )
    return store


def _raw_graph(ds, name):
    """Load our npz graph back as raw (unnormalized) numpy arrays."""
    gdir = ds.root_path / "graph" / name
    with np.load(gdir / "graph.npz") as data:
        arrays = {k: data[k].copy() for k in data.files}
    meta = yaml.safe_load((gdir / "metainfo.yaml").read_text())
    return arrays, meta


def _write_reference_dir(
    out: Path, arrays: dict, n_levels: int, spec: str, mesh_first: bool
):
    """Write a reference-layout .pt dir from raw edge arrays."""
    out.mkdir(parents=True)

    def ei(name):
        return torch.tensor(
            np.stack(
                [arrays[f"{name}_senders"], arrays[f"{name}_receivers"]]
            ).astype(np.int64)
        )

    def feat(name):
        return torch.tensor(arrays[f"{name}_features"])

    mesh_features = [
        torch.tensor(arrays[f"mesh_features__{lev}"])
        for lev in range(n_levels)
    ]
    n_mesh_total = sum(int(m.shape[0]) for m in mesh_features)
    g2m = ei("g2m")
    m2g = ei("m2g")
    m2m = [ei(f"m2m__{lev}") for lev in range(n_levels)]
    if spec == "legacy":
        # combined offsets: mesh-first or grid-first node numbering
        if mesh_first:
            g2m = torch.stack([g2m[0] + n_mesh_total, g2m[1]])
            m2g = torch.stack([m2g[0], m2g[1] + n_mesh_total])
        else:
            # every grid node receives m2g (4-NN), so this is the
            # true grid count the legacy numbering offsets by
            n_grid = int(m2g[1].max()) + 1
            g2m = torch.stack([g2m[0], g2m[1] + n_grid])
            m2g = torch.stack([m2g[0] + n_grid, m2g[1]])
    torch.save(g2m, out / "g2m_edge_index.pt")
    torch.save(m2g, out / "m2g_edge_index.pt")
    torch.save(feat("g2m"), out / "g2m_features.pt")
    torch.save(feat("m2g"), out / "m2g_features.pt")
    torch.save(m2m, out / "m2m_edge_index.pt")
    torch.save(
        [feat(f"m2m__{lev}") for lev in range(n_levels)],
        out / "m2m_features.pt",
    )
    torch.save(mesh_features, out / "mesh_features.pt")
    if n_levels > 1:
        torch.save(
            [ei(f"mesh_up__{lev}") for lev in range(n_levels - 1)],
            out / "mesh_up_edge_index.pt",
        )
        torch.save(
            [ei(f"mesh_down__{lev}") for lev in range(n_levels - 1)],
            out / "mesh_down_edge_index.pt",
        )
        torch.save(
            [feat(f"mesh_up__{lev}") for lev in range(n_levels - 1)],
            out / "mesh_up_features.pt",
        )
        torch.save(
            [feat(f"mesh_down__{lev}") for lev in range(n_levels - 1)],
            out / "mesh_down_features.pt",
        )
    if spec == "0.1.0":
        (out / "metainfo.yaml").write_text(
            yaml.dump({"spec_version": "0.1.0"}), encoding="utf-8"
        )


@pytest.mark.parametrize("graph_name", ["multiscale", "hierarchical"])
def test_convert_spec_graph_identical(ds, graph_name, tmp_path):
    """spec-0.1.0 conversion is a lossless round-trip: the converted
    graph loads to the same arrays as the original."""
    arrays, meta = _raw_graph(ds, graph_name)
    ref_dir = tmp_path / "ref"
    _write_reference_dir(
        ref_dir, arrays, meta["n_levels"], "0.1.0", mesh_first=True
    )
    out_dir = tmp_path / "converted"
    convert_reference_graph(ref_dir, out_dir)

    hier_a, ga = load_graph(
        ds.root_path / "graph" / graph_name, mesh_node_features_scaling=3.0
    )
    hier_b, gb = load_graph(out_dir, mesh_node_features_scaling=3.0)
    assert hier_a == hier_b
    for key in ga:
        a, b = ga[key], gb[key]
        if isinstance(a, list):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
        else:
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mesh_first", [True, False])
def test_convert_legacy_offsets(ds, mesh_first, tmp_path):
    """Legacy combined-offset dirs convert with the reference's
    zero-index fixups (both node-numbering variants), and the loader
    skips re-normalizing the pre-normalized mesh coordinates."""
    arrays, meta = _raw_graph(ds, "hierarchical")
    ref_dir = tmp_path / "ref_legacy"
    _write_reference_dir(
        ref_dir, arrays, meta["n_levels"], "legacy", mesh_first=mesh_first
    )
    out_dir = tmp_path / "converted"
    convert_reference_graph(ref_dir, out_dir)
    meta_out = yaml.safe_load(
        (out_dir / "metainfo.yaml").read_text(encoding="utf-8")
    )
    assert meta_out["mesh_features_prenormalized"] is True

    _, ga = load_graph(
        ds.root_path / "graph" / "hierarchical",
        mesh_node_features_scaling=1.0,
    )
    _, gb = load_graph(out_dir, mesh_node_features_scaling=1.0)
    np.testing.assert_array_equal(
        ga["g2m_edge_index"], gb["g2m_edge_index"]
    )
    np.testing.assert_array_equal(
        ga["m2g_edge_index"], gb["m2g_edge_index"]
    )
    for a, b in zip(ga["m2m_edge_index"], gb["m2m_edge_index"]):
        np.testing.assert_array_equal(a, b)


def test_converted_graph_drives_models(ds, tmp_path):
    """A converted reference graph is consumable by the models."""
    import jax

    for graph_name, cls in (("multiscale", GraphLAM),
                            ("hierarchical", HiLAM)):
        arrays, meta = _raw_graph(ds, graph_name)
        ref_dir = tmp_path / f"ref_{graph_name}"
        _write_reference_dir(
            ref_dir, arrays, meta["n_levels"], "0.1.0", mesh_first=True
        )
        out_dir = ds.root_path / "graph" / f"{graph_name}_converted"
        convert_reference_graph(ref_dir, out_dir)
        model = cls(
            ds, graph_name=f"{graph_name}_converted",
            hidden_dim=8, processor_layers=1,
        )
        params = model.init_params(jax.random.PRNGKey(0))
        n = ds.num_grid_points
        rng = np.random.default_rng(0)
        state = rng.normal(size=(n, 3)).astype(np.float32)
        out, _ = model.step(
            params, state, state,
            rng.normal(size=(n, 6)).astype(np.float32),
        )
        assert np.isfinite(np.asarray(out)).all()
