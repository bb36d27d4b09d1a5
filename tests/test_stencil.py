"""Stencil (regular-structure) m2m path: detection + equivalence.

The stencil processor (ops/stencil.py) must be an exact reformulation
of the edge-list InteractionNet chain on regular multiscale meshes
(reference semantics: neural_lam/gnn_layers.py:111-190,
graph/graph_lam.py:102-121) and must disable itself cleanly on
anything irregular.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.create_graph import create_graph_from_datastore
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.models import ARForecaster, GraphLAM
from neural_lam_tpu.ops.stencil import detect_stencil


@pytest.fixture(autouse=True)
def _enable_stencil(monkeypatch):
    """conftest pins the stencil OFF suite-wide (parity tests must
    cover the production edge-list path); this file tests the stencil,
    so re-enable it here."""
    monkeypatch.setenv("NEURAL_LAM_TPU_STENCIL", "on")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("stencil_ds")
    ds = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=10, root_path=root
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "ms", hierarchical=False
    )
    return ds


def _build(ds, **kw):
    return GraphLAM(
        ds, graph_name="ms", hidden_dim=8, processor_layers=3, **kw
    )


def test_multiscale_mesh_detects(setup):
    ds = setup
    model = _build(ds)
    st = model._m2m_stencil()
    assert st is not None
    # every class has 8 offsets; edge coverage is exact
    pe = model.graph.m2m[0]
    assert st.num_edges == pe.edges.num_valid
    for g in st.groups:
        assert len(g.offsets) == 8
        assert sorted(g.offsets) == sorted(
            (dx, dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        )


def test_irregular_graph_falls_back():
    rng = np.random.default_rng(0)
    n = 25
    xy = rng.normal(size=(n, 2))  # not a lattice
    senders = rng.integers(0, n, size=60)
    receivers = rng.integers(0, n, size=60)
    feats = rng.normal(size=(60, 3))
    assert detect_stencil(senders, receivers, feats, xy) is None


def test_nonconstant_features_fall_back():
    # perfect lattice, but per-edge features vary within a class
    nx = ny = 4
    xy = np.stack(
        np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij"), -1
    ).reshape(-1, 2).astype(float)
    idx = np.arange(nx * ny).reshape(nx, ny)
    senders = idx[:-1, :].ravel()
    receivers = idx[1:, :].ravel()
    feats = np.random.default_rng(1).normal(size=(senders.size, 3))
    assert detect_stencil(senders, receivers, feats, xy) is None
    # and with constant features it succeeds
    const = np.ones((senders.size, 3))
    st = detect_stencil(senders, receivers, const, xy)
    assert st is not None and st.num_edges == senders.size


@pytest.mark.parametrize("mesh_aggr", ["sum", "mean"])
def test_stencil_matches_edge_list(setup, monkeypatch, mesh_aggr):
    ds = setup
    rng = np.random.default_rng(2)
    n = ds.num_grid_points
    prev = rng.normal(size=(2, n, 3)).astype(np.float32)
    prev_prev = rng.normal(size=(2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(2, n, 6)).astype(np.float32)

    model = _build(ds, mesh_aggr=mesh_aggr)
    assert model._m2m_stencil() is not None
    params = model.init_params(jax.random.PRNGKey(0))
    got = jax.vmap(lambda a, b, c: model.step(params, a, b, c)[0])(
        prev, prev_prev, forcing
    )

    monkeypatch.setenv("NEURAL_LAM_TPU_STENCIL", "off")
    model_el = _build(ds, mesh_aggr=mesh_aggr)
    assert model_el._m2m_stencil() is None
    want = jax.vmap(
        lambda a, b, c: model_el.step(params, a, b, c)[0]
    )(prev, prev_prev, forcing)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_stencil_gradients_match_edge_list(setup, monkeypatch):
    ds = setup
    rng = np.random.default_rng(3)
    n = ds.num_grid_points
    init = rng.normal(size=(2, 2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(2, 2, n, 6)).astype(np.float32)
    target = rng.normal(size=(2, 2, n, 3)).astype(np.float32)

    def loss_fn(model):
        fc = ARForecaster(model, ds)

        def loss(p):
            pred, _ = fc.forward(
                p, jnp.asarray(init), jnp.asarray(forcing),
                jnp.asarray(target),
            )
            return jnp.mean((pred - target) ** 2)

        return loss

    model = _build(ds)
    params = model.init_params(jax.random.PRNGKey(1))
    g_sten = jax.grad(loss_fn(model))(params)

    monkeypatch.setenv("NEURAL_LAM_TPU_STENCIL", "off")
    g_list = jax.grad(loss_fn(_build(ds)))(params)

    flat_a = jax.tree_util.tree_leaves(g_sten)
    flat_b = jax.tree_util.tree_leaves(g_list)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_stencil_env_off(setup, monkeypatch):
    monkeypatch.setenv("NEURAL_LAM_TPU_STENCIL", "off")
    model = _build(setup)
    assert model._m2m_stencil() is None


def test_multi_edge_falls_back():
    """A duplicated edge within an offset class must disable the
    stencil (fancy-index += would silently drop it; np.add.at trips
    the guard)."""
    nx = ny = 4
    xy = np.stack(
        np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij"), -1
    ).reshape(-1, 2).astype(float)
    idx = np.arange(nx * ny).reshape(nx, ny)
    senders = idx[:-1, :].ravel()
    receivers = idx[1:, :].ravel()
    const = np.ones((senders.size, 3))
    assert detect_stencil(senders, receivers, const, xy) is not None
    dup_s = np.concatenate([senders, senders[:1]])
    dup_r = np.concatenate([receivers, receivers[:1]])
    dup_f = np.ones((dup_s.size, 3))
    assert detect_stencil(dup_s, dup_r, dup_f, xy) is None
