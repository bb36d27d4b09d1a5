"""Spatial partitioning: sharded == unsharded, on a real 8-device mesh.

The reference could only mock its collectives
(reference: tests/test_training.py:164-229); here the virtual CPU mesh
runs real shard_map all_gather/psum collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.models import ARForecaster, GraphLAM
from neural_lam_tpu.parallel import ShardedGraphLAM, build_spatial_partition


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("spatial_ds")
    ds = DummyDatastore(
        n_grid_x=18, n_grid_y=18, n_timesteps=12, root_path=root
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    return ds, model


def _mesh(data, spatial):
    devices = np.array(jax.devices()[: data * spatial]).reshape(
        data, spatial
    )
    return Mesh(devices, axis_names=("data", "spatial"))


def test_partition_covers_all_edges(setup):
    ds, model = setup
    part = build_spatial_partition(model, ds, n_shards=4)
    g = model.graph
    for name, sharded in (
        ("g2m", part.g2m), ("m2m", part.m2m), ("m2g", part.m2g)
    ):
        pe = getattr(g, name) if name != "m2m" else g.m2m[0]
        n_valid_src = pe.edges.num_valid
        n_valid_sharded = int(
            (sharded.recv_local < sharded.n_rec_local).sum()
        )
        assert n_valid_sharded == n_valid_src, name
    # interior count matches the datastore
    assert part.interior_mask.sum() == (
        (1 - np.asarray(ds.boundary_mask.data)).sum()
    )


def test_sharded_forward_matches_unsharded(setup):
    ds, model = setup
    mesh = _mesh(2, 4)
    sharded = ShardedGraphLAM(model, ds, mesh)
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(0))

    B, T = 2, 2
    n = ds.num_grid_points
    d = ds.get_num_data_vars("state")
    f = ds.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    init = rng.normal(size=(B, 2, n, d)).astype(np.float32)
    forcing = rng.normal(size=(B, T, n, f)).astype(np.float32)
    boundary = rng.normal(size=(B, T, n, d)).astype(np.float32)

    ref, _ = fc.forward(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )

    part = sharded.part
    init_p = part.pad_grid_array(init)
    forcing_p = part.pad_grid_array(forcing)
    boundary_p = part.pad_grid_array(boundary)
    got = sharded.forward(
        params,
        jnp.asarray(init_p),
        jnp.asarray(forcing_p),
        jnp.asarray(boundary_p),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sharded_train_step_reduces_loss(setup):
    ds, model = setup
    mesh = _mesh(2, 4)
    sharded = ShardedGraphLAM(model, ds, mesh)
    params = model.init_params(jax.random.PRNGKey(1))
    optimizer = optax.adamw(1e-3, b1=0.9, b2=0.95)
    opt_state = optimizer.init(params)
    per_var_std = jnp.asarray(np.ones(3, np.float32))
    train_step, _ = sharded.make_train_step(optimizer, per_var_std)

    B, T = 2, 1
    n = ds.num_grid_points
    rng = np.random.default_rng(1)
    part = sharded.part
    init = jnp.asarray(
        part.pad_grid_array(
            rng.normal(size=(B, 2, n, 3)).astype(np.float32)
        )
    )
    target = jnp.asarray(
        part.pad_grid_array(
            rng.normal(size=(B, T, n, 3)).astype(np.float32)
        )
    )
    forcing = jnp.asarray(
        part.pad_grid_array(
            rng.normal(size=(B, T, n, 6)).astype(np.float32)
        )
    )
    sharding = sharded.node_sharding()
    init = jax.device_put(init, sharding)
    target = jax.device_put(target, sharding)
    forcing = jax.device_put(forcing, sharding)

    losses = []
    for _ in range(5):
        params, opt_state, loss = train_step(
            params, opt_state, init, target, forcing
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
