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


class OracleHiLAM:
    """Literal float64 implementation of the HiLAM forward
    (reference: hierarchical.py:176-282, hi_lam.py:165-360)."""

    def __init__(self, model, datastore, graph_name):
        self.model = model
        graph_dir = datastore.root_path / "graph" / graph_name
        extent = datastore.get_xy_extent("state")
        span = max(extent[1] - extent[0], extent[3] - extent[2])
        _, g = load_graph(graph_dir, mesh_node_features_scaling=span)
        self.g = g
        self.L = len(g["mesh_static_features"])
        self.static = np.asarray(model.grid_static_features, np.float64)
        self.diff_mean = np.asarray(model.diff_mean, np.float64)
        self.diff_std = np.asarray(model.diff_std, np.float64)

    def _apply(self, p, name, lev, send, rec, edge, **kw):
        ei = self.g[name][lev]
        return np_interaction(
            p, ei[0], ei[1], rec.shape[0], send, rec, edge, **kw
        )

    def step(self, params, prev, prev_prev, forcing):
        g = self.g
        L = self.L
        grid_features = np.concatenate(
            [prev, prev_prev, forcing, self.static], axis=-1
        )
        grid_emb = np_mlp(params["grid_embedder"], grid_features)
        g2m_emb = np_mlp(params["g2m_embedder"], g["g2m_features"])
        m2g_emb = np_mlp(params["m2g_embedder"], g["m2g_features"])
        mesh_emb0 = np_mlp(
            params["mesh_embedders"][0], g["mesh_static_features"][0]
        )
        mesh_rep = np_interaction(
            params["g2m_gnn"],
            g["g2m_edge_index"][0],
            g["g2m_edge_index"][1],
            mesh_emb0.shape[0],
            grid_emb,
            mesh_emb0,
            g2m_emb,
            update_edges=False,
        )
        grid_rep = grid_emb + np_mlp(
            params["encoding_grid_mlp"], grid_emb
        )

        # process_step: embed levels >=1 and all edge sets
        levels = [mesh_rep] + [
            np_mlp(params["mesh_embedders"][l], g["mesh_static_features"][l])
            for l in range(1, L)
        ]
        same = [
            np_mlp(params["mesh_same_embedders"][l], g["m2m_features"][l])
            for l in range(L)
        ]
        up = [
            np_mlp(params["mesh_up_embedders"][l], g["mesh_up_features"][l])
            for l in range(L - 1)
        ]
        down = [
            np_mlp(
                params["mesh_down_embedders"][l], g["mesh_down_features"][l]
            )
            for l in range(L - 1)
        ]

        # MESH INIT sweep up
        for l in range(1, L):
            new_node, new_edge = self._apply(
                params["mesh_init_gnns"][l - 1], "mesh_up_edge_index",
                l - 1, levels[l - 1], levels[l], up[l - 1],
            )
            levels[l] = new_node
            up[l - 1] = new_edge

        # hi_processor_step: down then up sweep per layer
        for layer in range(self.model.processor_layers):
            dg = params["mesh_down_gnns"][layer]
            dsg = params["mesh_down_same_gnns"][layer]
            ug = params["mesh_up_gnns"][layer]
            usg = params["mesh_up_same_gnns"][layer]
            # down sweep
            levels[-1], same[-1] = self._apply(
                dsg[-1], "m2m_edge_index", L - 1,
                levels[-1], levels[-1], same[-1],
            )
            for l in range(L - 2, -1, -1):
                new_node, down[l] = self._apply(
                    dg[l], "mesh_down_edge_index", l,
                    levels[l + 1], levels[l], down[l],
                )
                levels[l], same[l] = self._apply(
                    dsg[l], "m2m_edge_index", l,
                    new_node, new_node, same[l],
                )
            # up sweep
            levels[0], same[0] = self._apply(
                usg[0], "m2m_edge_index", 0,
                levels[0], levels[0], same[0],
            )
            for l in range(1, L):
                new_node, up[l - 1] = self._apply(
                    ug[l - 1], "mesh_up_edge_index", l - 1,
                    levels[l - 1], levels[l], up[l - 1],
                )
                levels[l], same[l] = self._apply(
                    usg[l], "m2m_edge_index", l,
                    new_node, new_node, same[l],
                )

        # MESH READ OUT sweep down
        for l in range(L - 2, -1, -1):
            levels[l] = self._apply(
                params["mesh_read_gnns"][l], "mesh_down_edge_index", l,
                levels[l + 1], levels[l], down[l],
                update_edges=False,
            )

        grid_rep = np_interaction(
            params["m2g_gnn"],
            g["m2g_edge_index"][0],
            g["m2g_edge_index"][1],
            grid_rep.shape[0],
            levels[0],
            grid_rep,
            m2g_emb,
            update_edges=False,
        )
        out = np_mlp(params["output_map"], grid_rep)
        delta = out * self.diff_std + self.diff_mean
        return prev + delta


def test_hi_lam_one_step_parity(tmp_path):
    from neural_lam_tpu.models import HiLAM

    ds = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=10, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "hierarchical", hierarchical=True
    )
    model = HiLAM(
        ds, graph_name="hierarchical", hidden_dim=4, processor_layers=2
    )
    params = model.init_params(jax.random.PRNGKey(0))
    n = ds.num_grid_points
    rng = np.random.default_rng(2)
    prev = rng.normal(size=(n, 3)).astype(np.float32)
    prev_prev = rng.normal(size=(n, 3)).astype(np.float32)
    forcing = rng.normal(size=(n, 6)).astype(np.float32)

    got, _ = jax.jit(model.step)(
        params, jnp.asarray(prev), jnp.asarray(prev_prev),
        jnp.asarray(forcing),
    )
    oracle = OracleHiLAM(model, ds, "hierarchical")
    want = oracle.step(
        params,
        prev.astype(np.float64),
        prev_prev.astype(np.float64),
        forcing.astype(np.float64),
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=5e-4, atol=5e-4
    )
