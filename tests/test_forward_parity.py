"""Full-forward parity: JAX GraphLAM vs a float64 numpy oracle.

The oracle re-implements the documented reference semantics end-to-end
(reference: models/step_predictors/graph/base.py:228-344,
graph_lam.py:152-183, gnn_layers.py:15-190) with literal scatter loops
and float64 math, using the SAME parameter pytree and graph arrays as
the JAX model. This is the in-image substitute for transplanted-weight
parity against the torch reference (torch_geometric is not installed),
and pins every numerical convention: concat order, residuals,
aggregation target sizes, diff-stat rescale, boundary blending.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore, load_graph
from neural_lam_tpu.models import ARForecaster, GraphLAM


def np_mlp(params, x):
    layers = params["layers"]
    x = np.asarray(x, dtype=np.float64)
    n = len(layers)
    for i, layer in enumerate(layers):
        x = x @ np.asarray(layer["w"], np.float64) + np.asarray(
            layer["b"], np.float64
        )
        if i != n - 1:
            x = x / (1.0 + np.exp(-x))  # SiLU
    if params["ln"] is not None:
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / np.sqrt(var + 1e-5)
        x = x * np.asarray(params["ln"]["scale"], np.float64) + np.asarray(
            params["ln"]["bias"], np.float64
        )
    return x


def np_interaction(
    params, senders, receivers, num_rec, send_rep, rec_rep, edge_rep,
    aggr="sum", update_edges=True,
):
    E = len(senders)
    d = rec_rep.shape[-1]
    msgs = np.zeros((E, d))
    for e in range(E):
        inp = np.concatenate(
            [edge_rep[e], send_rep[senders[e]], rec_rep[receivers[e]]]
        )
        msgs[e] = np_mlp(params["edge"][0], inp[None])[0]
    agg = np.zeros((num_rec, d))
    cnt = np.zeros(num_rec)
    for e in range(E):
        agg[receivers[e]] += msgs[e]
        cnt[receivers[e]] += 1
    if aggr == "mean":
        agg = agg / np.maximum(cnt, 1)[:, None]
    rec_diff = np_mlp(
        params["aggr"][0], np.concatenate([rec_rep, agg], axis=-1)
    )
    new_rec = rec_rep + rec_diff
    if update_edges:
        return new_rec, edge_rep + msgs
    return new_rec


class OracleGraphLAM:
    """Literal float64 implementation of the GraphLAM forward."""

    def __init__(self, model, datastore, graph_name):
        self.model = model
        graph_dir = datastore.root_path / "graph" / graph_name
        extent = datastore.get_xy_extent("state")
        span = max(extent[1] - extent[0], extent[3] - extent[2])
        _, g = load_graph(graph_dir, mesh_node_features_scaling=span)
        self.g = g
        self.static = np.asarray(model.grid_static_features, np.float64)
        self.diff_mean = np.asarray(model.diff_mean, np.float64)
        self.diff_std = np.asarray(model.diff_std, np.float64)

    def step(self, params, prev, prev_prev, forcing):
        g = self.g
        grid_features = np.concatenate(
            [prev, prev_prev, forcing, self.static], axis=-1
        )
        grid_emb = np_mlp(params["grid_embedder"], grid_features)
        g2m_emb = np_mlp(params["g2m_embedder"], g["g2m_features"])
        m2g_emb = np_mlp(params["m2g_embedder"], g["m2g_features"])
        mesh_emb = np_mlp(
            params["mesh_embedder"], g["mesh_static_features"]
        )

        mesh_rep = np_interaction(
            params["g2m_gnn"],
            g["g2m_edge_index"][0],
            g["g2m_edge_index"][1],
            mesh_emb.shape[0],
            grid_emb,
            mesh_emb,
            g2m_emb,
            update_edges=False,
        )
        grid_rep = grid_emb + np_mlp(
            params["encoding_grid_mlp"], grid_emb
        )

        edge_rep = np_mlp(params["m2m_embedder"], g["m2m_features"])
        for net in params["processor"]:
            mesh_rep, edge_rep = np_interaction(
                net,
                g["m2m_edge_index"][0],
                g["m2m_edge_index"][1],
                mesh_rep.shape[0],
                mesh_rep,
                mesh_rep,
                edge_rep,
                aggr=self.model.mesh_aggr,
            )

        grid_rep = np_interaction(
            params["m2g_gnn"],
            g["m2g_edge_index"][0],
            g["m2g_edge_index"][1],
            grid_rep.shape[0],
            mesh_rep,
            grid_rep,
            m2g_emb,
            update_edges=False,
        )
        out = np_mlp(params["output_map"], grid_rep)
        delta = out * self.diff_std + self.diff_mean
        return prev + delta


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_ds")
    ds = DummyDatastore(
        n_grid_x=9, n_grid_y=9, n_timesteps=10, root_path=root
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    return ds, model


def test_one_step_parity(setup):
    ds, model = setup
    params = model.init_params(jax.random.PRNGKey(0))
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    prev = rng.normal(size=(n, 3)).astype(np.float32)
    prev_prev = rng.normal(size=(n, 3)).astype(np.float32)
    forcing = rng.normal(size=(n, 6)).astype(np.float32)

    got, _ = jax.jit(model.step)(
        params, jnp.asarray(prev), jnp.asarray(prev_prev),
        jnp.asarray(forcing),
    )
    oracle = OracleGraphLAM(model, ds, "multiscale")
    want = oracle.step(
        params,
        prev.astype(np.float64),
        prev_prev.astype(np.float64),
        forcing.astype(np.float64),
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=2e-4
    )


def test_rollout_parity(setup):
    """5-step AR rollout with boundary blending vs the oracle
    (reference: forecasters/autoregressive.py:109-146)."""
    ds, model = setup
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(1))
    n = ds.num_grid_points
    T = 5
    rng = np.random.default_rng(1)
    init = rng.normal(size=(2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(T, n, 6)).astype(np.float32)
    boundary = rng.normal(size=(T, n, 3)).astype(np.float32)

    got, _ = jax.jit(fc.rollout)(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )

    oracle = OracleGraphLAM(model, ds, "multiscale")
    mask = np.asarray(ds.boundary_mask.data, np.float64).reshape(-1, 1)
    prev_prev, prev = init[0].astype(np.float64), init[1].astype(
        np.float64
    )
    preds = []
    for t in range(T):
        pred = oracle.step(
            params, prev, prev_prev, forcing[t].astype(np.float64)
        )
        new_state = mask * boundary[t] + (1 - mask) * pred
        preds.append(new_state)
        prev_prev, prev = prev, new_state
    want = np.stack(preds)
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-3, atol=2e-3
    )
