"""Model family behaviour: shapes, determinism, AR semantics, learning.

Mirrors the behavioural specs of the reference model tests
(reference: tests/test_prediction_model_classes.py:36-405,
tests/test_training.py:144-161) at tiny sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.models import MODELS, ARForecaster

GRID = 30  # 30x30 grid -> 2 mesh levels for hierarchical graphs


@pytest.fixture(scope="module")
def datastore(tmp_path_factory):
    root = tmp_path_factory.mktemp("model_ds")
    ds = DummyDatastore(
        n_grid_x=GRID, n_grid_y=GRID, n_timesteps=12, root_path=root
    )
    for name, hier in (("multiscale", False), ("hierarchical", True)):
        create_graph_from_datastore(
            ds, ds.root_path / "graph" / name, hierarchical=hier
        )
    return ds


def _build(model_name, datastore, **kwargs):
    graph_name = (
        "multiscale" if model_name == "graph_lam" else "hierarchical"
    )
    cls = MODELS[model_name]
    return cls(
        datastore,
        graph_name=graph_name,
        hidden_dim=16,
        hidden_layers=1,
        processor_layers=2,
        **kwargs,
    )


@pytest.mark.parametrize("model_name", sorted(MODELS))
def test_step_shapes_and_determinism(datastore, model_name):
    model = _build(model_name, datastore)
    params = model.init_params(jax.random.PRNGKey(0))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3

    rng = np.random.default_rng(1)
    prev = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    prev_prev = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(n, f)), dtype=jnp.float32)

    step = jax.jit(model.step)
    out, std = step(params, prev, prev_prev, forcing)
    assert out.shape == (n, d)
    assert std is None
    assert bool(jnp.all(jnp.isfinite(out)))
    out2, _ = step(params, prev, prev_prev, forcing)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_output_std_head(datastore):
    model = _build("graph_lam", datastore, output_std=True)
    params = model.init_params(jax.random.PRNGKey(0))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(2)
    prev = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(n, f)), dtype=jnp.float32)
    out, std = jax.jit(model.step)(params, prev, prev, forcing)
    assert out.shape == (n, d)
    assert std.shape == (n, d)
    assert bool(jnp.all(std > 0))  # softplus output


def test_clamping_respects_bounds(datastore):
    names = datastore.get_vars_names("state")
    model = _build(
        "graph_lam",
        datastore,
        output_clamping_lower={names[0]: -0.5, names[1]: -1.0},
        output_clamping_upper={names[0]: 0.5},
    )
    params = model.init_params(jax.random.PRNGKey(0))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(3)
    # Start inside the valid range
    prev = jnp.asarray(
        rng.uniform(-0.4, 0.4, size=(n, d)), dtype=jnp.float32
    )
    forcing = jnp.asarray(
        10 * rng.normal(size=(n, f)), dtype=jnp.float32
    )
    out, _ = jax.jit(model.step)(params, prev, prev, forcing)
    out = np.asarray(out)
    # identity stats -> standardized bounds == physical bounds
    assert out[:, 0].min() > -0.5 and out[:, 0].max() < 0.5
    assert out[:, 1].min() > -1.0


def test_clamp_noop_when_within_linear_region(datastore):
    """Residual update must be exactly X_t + delta for unclamped features."""
    model = _build("graph_lam", datastore)
    delta = jnp.ones((4, 3))
    prev = jnp.full((4, 3), 2.0)
    new = model.get_clamped_new_state(delta, prev)
    np.testing.assert_allclose(np.asarray(new), 3.0, rtol=1e-6)


def test_ar_forecaster_boundary_overwrite(datastore):
    """Boundary nodes must equal the supplied boundary states exactly
    (reference: tests/test_prediction_model_classes.py:36-72)."""
    model = _build("graph_lam", datastore)
    fc = ARForecaster(model, datastore)
    params = fc.init_params(jax.random.PRNGKey(0))

    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    T = 3
    rng = np.random.default_rng(4)
    init = jnp.asarray(rng.normal(size=(2, n, d)), dtype=jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(T, n, f)), dtype=jnp.float32)
    boundary = jnp.asarray(rng.normal(size=(T, n, d)), dtype=jnp.float32)

    pred, std = jax.jit(fc.rollout)(params, init, forcing, boundary)
    assert pred.shape == (T, n, d)
    assert std is None

    mask = np.asarray(datastore.boundary_mask.data).astype(bool)
    np.testing.assert_allclose(
        np.asarray(pred)[:, mask, :], np.asarray(boundary)[:, mask, :],
        rtol=1e-6,
    )
    # Interior must NOT equal boundary input (the model actually ran)
    assert not np.allclose(
        np.asarray(pred)[:, ~mask, :], np.asarray(boundary)[:, ~mask, :]
    )


def test_ar_forecaster_batched_matches_unbatched(datastore):
    model = _build("graph_lam", datastore)
    fc = ARForecaster(model, datastore)
    params = fc.init_params(jax.random.PRNGKey(0))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(5)
    B, T = 2, 2
    init = jnp.asarray(rng.normal(size=(B, 2, n, d)), dtype=jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(B, T, n, f)), dtype=jnp.float32)
    boundary = jnp.asarray(rng.normal(size=(B, T, n, d)), dtype=jnp.float32)
    batched, _ = jax.jit(fc.forward)(params, init, forcing, boundary)
    for b in range(B):
        single, _ = fc.rollout(params, init[b], forcing[b], boundary[b])
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(single), rtol=2e-5, atol=1e-5
        )


@pytest.mark.parametrize("model_name", sorted(MODELS))
def test_gradients_flow(datastore, model_name):
    """Loss gradients must be finite and nonzero for every parameter leaf
    (reference: tests/test_gnn_layers.py:513-594)."""
    model = _build(model_name, datastore)
    fc = ARForecaster(model, datastore)
    params = fc.init_params(jax.random.PRNGKey(0))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(6)
    init = jnp.asarray(rng.normal(size=(2, n, d)), dtype=jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(2, n, f)), dtype=jnp.float32)
    boundary = jnp.asarray(rng.normal(size=(2, n, d)), dtype=jnp.float32)
    target = jnp.asarray(rng.normal(size=(2, n, d)), dtype=jnp.float32)

    def loss_fn(p):
        pred, _ = fc.rollout(p, init, forcing, boundary)
        return jnp.mean((pred - target) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    nonzero = [float(jnp.max(jnp.abs(g))) > 0 for g in flat]
    assert all(nonzero), f"{sum(nonzero)}/{len(nonzero)} leaves got gradient"


@pytest.mark.parametrize("model_name", ["graph_lam", "hi_lam"])
def test_padded_residency_equivalence(datastore, monkeypatch, model_name):
    """GraphLAM/HiLAM keep node arrays block-padded through the pipeline
    (padded_residency); values and gradients must match the unpadded
    path bit-for-bit up to f32 reduction order."""
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    model = _build(model_name, datastore)
    assert model.padded_residency
    grid_rows, mesh_rows = model._residency_rows()
    assert grid_rows is not None and grid_rows >= datastore.num_grid_points
    params = model.init_params(jax.random.PRNGKey(0))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(11)
    prev = jnp.asarray(rng.normal(size=(n, 2, d)), jnp.float32)
    prev_prev = jnp.asarray(rng.normal(size=(n, 2, d)), jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(n, 2, f)), jnp.float32)

    def run(p):
        out, _ = model.step(p, prev, prev_prev, forcing)
        return out

    padded = run(params)
    g_padded = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)

    model.padded_residency = False
    plain = run(params)
    g_plain = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)

    assert padded.shape == plain.shape == (n, 2, d)
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(plain), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_padded),
        jax.tree_util.tree_leaves(g_plain),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_hi_lam_parallel_fused_sections_match_combined(
    datastore, monkeypatch
):
    """HiLAMParallel's per-section fused processor (each section's edge
    phase as one Pallas kernel over its own per-level edge set) must
    reproduce the combined chunked-edge-set path — values AND
    gradients."""
    import neural_lam_tpu.models.hi_lam_parallel as hlp

    model = _build("hi_lam_parallel", datastore)
    params = model.init_params(jax.random.PRNGKey(7))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(13)
    prev = jnp.asarray(rng.normal(size=(n, 2, d)), jnp.float32)
    prev_prev = jnp.asarray(rng.normal(size=(n, 2, d)), jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(n, 2, f)), jnp.float32)

    def run(p):
        out, _ = model.step(p, prev, prev_prev, forcing)
        return out

    calls = {"fused": 0}
    orig = hlp.fused_edge_phase

    def spy(*a, **kw):
        calls["fused"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(hlp, "fused_edge_phase", spy)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    fused_out = run(params)
    assert calls["fused"] > 0, "per-section fused path was not routed"
    g_fused = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "off")
    plain_out = run(params)
    g_plain = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)

    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(plain_out), rtol=1e-4, atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused),
        jax.tree_util.tree_leaves(g_plain),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-4
        )
