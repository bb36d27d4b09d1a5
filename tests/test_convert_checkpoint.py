"""Reference-checkpoint conversion: round-trip + torch-tensor input.

The reference cannot run in this image (no torch_geometric), so the
mapping is validated by round-trip (export our params under the
reference naming, convert back, tree-identical) plus structural checks
of the produced key set against the documented reference module layout
(reference: neural_lam/utils.py:538-570, gnn_layers.py:90-107).
"""

import jax
import numpy as np
import pytest

from neural_lam_tpu.convert_checkpoint import (
    convert_state_dict,
    export_state_dict,
)
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.models import MODELS


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("conv_ds")
    ds = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=10, root_path=root
    )
    for name, hier in (("multiscale", False), ("hierarchical", True)):
        create_graph_from_datastore(
            ds, ds.root_path / "graph" / name, hierarchical=hier
        )
    return ds


@pytest.mark.parametrize("model_name", sorted(MODELS))
def test_roundtrip(setup, model_name):
    ds = setup
    graph = "multiscale" if model_name == "graph_lam" else "hierarchical"
    model = MODELS[model_name](
        ds, graph_name=graph, hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(0))
    sd = export_state_dict(params)
    template = model.init_params(jax.random.PRNGKey(1))
    restored = convert_state_dict(sd, template)
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(restored)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_key_layout(setup):
    """Exported keys follow the reference Sequential/MLP naming."""
    ds = setup
    model = MODELS["graph_lam"](
        ds, graph_name="multiscale", hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(0))
    sd = export_state_dict(params)
    # make_mlp([in, 4, 4]) -> Linear(0), SiLU(1), Linear(2), LayerNorm(3)
    assert "grid_embedder.0.weight" in sd
    assert "grid_embedder.2.weight" in sd
    assert "grid_embedder.3.weight" in sd  # LayerNorm scale
    # output_map has no LayerNorm (reference: graph/base.py:172-175)
    assert "output_map.3.weight" not in sd
    assert "g2m_gnn.edge_mlp.0.weight" in sd
    assert "g2m_gnn.aggr_mlp.0.weight" in sd
    assert "processor.module_0.edge_mlp.0.weight" in sd
    # torch Linear layout is (out, in)
    w = sd["grid_embedder.0.weight"]
    assert w.shape == (4, model.grid_input_dim)


def test_torch_tensor_input_and_lightning_prefix(setup):
    """Accept torch tensors with the Lightning 'forecaster.predictor.'
    prefix (reference: module.py:974-1010)."""
    torch = pytest.importorskip("torch")
    ds = setup
    model = MODELS["graph_lam"](
        ds, graph_name="multiscale", hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(2))
    sd = {
        f"forecaster.predictor.{k}": torch.tensor(v)
        for k, v in export_state_dict(params).items()
    }
    restored = convert_state_dict(
        sd, model.init_params(jax.random.PRNGKey(3))
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_shape_mismatch_raises(setup):
    ds = setup
    model = MODELS["graph_lam"](
        ds, graph_name="multiscale", hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(0))
    sd = export_state_dict(params)
    sd["grid_embedder.0.weight"] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError, match="Shape mismatch"):
        convert_state_dict(
            sd, model.init_params(jax.random.PRNGKey(1))
        )


def test_missing_keys_strict(setup):
    ds = setup
    model = MODELS["graph_lam"](
        ds, graph_name="multiscale", hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(0))
    sd = export_state_dict(params)
    del sd["output_map.0.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(sd, params)
    # non-strict keeps the template value
    out = convert_state_dict(sd, params, strict=False)
    assert out is not None


def test_legacy_armodel_key_remap(setup):
    """Legacy flat 'g2m_gnn.grid_mlp' keys remap to encoding_grid_mlp
    (reference: module.py:974-1010)."""
    ds = setup
    model = MODELS["graph_lam"](
        ds, graph_name="multiscale", hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(4))
    sd = export_state_dict(params)
    legacy = {}
    for k, v in sd.items():
        if k.startswith("encoding_grid_mlp."):
            k = "g2m_gnn.grid_mlp." + k[len("encoding_grid_mlp."):]
        legacy[k] = v
    restored = convert_state_dict(
        legacy, model.init_params(jax.random.PRNGKey(5))
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_ckpt_file_end_to_end(tmp_path):
    """The VERDICT fixture: a Lightning-format ``.ckpt`` FILE from the
    live reference model, driven through the converter CLI into an
    orbax checkpoint, reconstructed via
    ``load_forecaster_from_checkpoint``, and forward-parity-checked
    against the reference (reference ckpt format:
    neural_lam/train_model.py:41-72, module.py:964-1010)."""
    import sys
    from pathlib import Path

    import torch
    import yaml

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_harness import (
        RefDatastoreAdapter,
        load_reference_module,
        write_reference_graph_dir,
    )

    root = tmp_path / "cfg"
    root.mkdir()
    (root / "dummy.datastore.yaml").write_text(
        yaml.safe_dump(
            {"n_grid_x": 27, "n_grid_y": 27, "n_timesteps": 10, "seed": 7}
        ),
        encoding="utf-8",
    )
    (root / "config.yaml").write_text(
        yaml.safe_dump(
            {
                "datastore": {
                    "kind": "dummydata",
                    "config_path": "dummy.datastore.yaml",
                }
            }
        ),
        encoding="utf-8",
    )
    ds = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=10, seed=7, root_path=root
    )
    create_graph_from_datastore(
        ds, root / "graph" / "multiscale", hierarchical=False
    )
    write_reference_graph_dir(
        root / "graph" / "multiscale",
        root / "refgraphs" / "graph" / "multiscale",
    )
    adapter = RefDatastoreAdapter(ds, root / "refgraphs")
    ref_cls = load_reference_module(
        "models.step_predictors.graph.graph_lam"
    ).GraphLAM
    torch.manual_seed(0)
    ref_model = ref_cls(
        adapter, graph_name="multiscale", hidden_dim=8,
        processor_layers=2,
    ).float()

    # Lightning-style checkpoint file: prefixed state_dict + hparams
    sd = {
        "forecaster.predictor." + k: v
        for k, v in ref_model.state_dict().items()
    }
    ckpt_path = tmp_path / "ref.ckpt"
    torch.save(
        {"state_dict": sd, "hyper_parameters": {"args": {}}}, ckpt_path
    )

    from neural_lam_tpu import convert_checkpoint
    from neural_lam_tpu.checkpoint import load_forecaster_from_checkpoint

    out_dir = tmp_path / "converted"
    convert_checkpoint.main([
        "--ckpt", str(ckpt_path),
        "--config_path", str(root / "config.yaml"),
        "--model", "graph_lam",
        "--graph", "multiscale",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--out", str(out_dir),
    ])

    fc, params, hparams = load_forecaster_from_checkpoint(out_dir, ds)
    assert hparams["model"] == "graph_lam"

    n = ds.num_grid_points
    rng = np.random.default_rng(3)
    prev_prev = rng.normal(size=(1, n, 3)).astype(np.float32)
    prev = rng.normal(size=(1, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(1, n, 6)).astype(np.float32)

    with torch.no_grad():
        want, _ = ref_model(
            torch.tensor(prev), torch.tensor(prev_prev),
            torch.tensor(forcing),
        )
    got, _ = jax.vmap(
        lambda a, b, c: fc.predictor.step(params, a, b, c)
    )(prev, prev_prev, forcing)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4
    )
