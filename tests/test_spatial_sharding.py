"""Spatial partitioning: sharded == unsharded for every model family.

The reference could only mock its collectives
(reference: tests/test_training.py:164-229); here the virtual 8-device
CPU mesh runs real shard_map ppermute/all_gather/psum collectives
through the generic :class:`ShardedModel` executor, which runs the
models' own forward code on shard-local views.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.models import ARForecaster, GraphLAM, HiLAM, HiLAMParallel
from neural_lam_tpu.parallel import ShardedModel

N_STATE, N_FORCING = 3, 2


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("spatial_ds")
    store = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=12, root_path=root
    )
    create_graph_from_datastore(
        store, store.root_path / "graph" / "multiscale", hierarchical=False
    )
    create_graph_from_datastore(
        store, store.root_path / "graph" / "hierarchical", hierarchical=True
    )
    return store


def _mesh(data, spatial):
    devices = np.array(jax.devices()[: data * spatial]).reshape(
        data, spatial
    )
    return Mesh(devices, axis_names=("data", "spatial"))


def _batch(ds, B, T, seed=0):
    n = ds.num_grid_points
    f = ds.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=(B, 2, n, N_STATE)).astype(np.float32),
        rng.normal(size=(B, T, n, f)).astype(np.float32),
        rng.normal(size=(B, T, n, N_STATE)).astype(np.float32),
    )


def _make_model(ds, name, **kw):
    if name == "graph_lam":
        return GraphLAM(
            ds, graph_name="multiscale", hidden_dim=8,
            processor_layers=2, **kw,
        )
    cls = HiLAM if name == "hi_lam" else HiLAMParallel
    return cls(
        ds, graph_name="hierarchical", hidden_dim=8,
        processor_layers=2, **kw,
    )


@pytest.mark.parametrize(
    "model_name,model_kw",
    [
        ("graph_lam", {}),
        ("graph_lam", {"g2m_gnn_type": "PropagationNet",
                       "m2g_gnn_type": "PropagationNet"}),
        ("graph_lam", {"output_std": True}),
        ("hi_lam", {}),
        ("hi_lam", {"mesh_up_gnn_type": "PropagationNet",
                    "mesh_down_gnn_type": "PropagationNet"}),
        ("hi_lam_parallel", {}),
    ],
)
def test_sharded_forward_matches_unsharded(ds, model_name, model_kw):
    model = _make_model(ds, model_name, **model_kw)
    mesh = _mesh(2, 4)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=64)
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(0))

    init, forcing, boundary = _batch(ds, B=2, T=2)
    ref, ref_std = fc.forward(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )
    got, got_std = sharded.forward(
        params,
        fc,
        jnp.asarray(sharded.pad_grid(init)),
        jnp.asarray(sharded.pad_grid(forcing)),
        jnp.asarray(sharded.pad_grid(boundary)),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    if model.output_std:
        np.testing.assert_allclose(
            np.asarray(got_std), np.asarray(ref_std),
            rtol=2e-4, atol=2e-4,
        )
    else:
        assert got_std is None


def test_halo_strategy_scales_with_cut_edges(ds):
    """With halos enabled, the per-round collective payload must scale
    with the cut size, not the node count: the extended sender array is
    barely larger than the local slab, and grid-sized sender sets do
    NOT use all_gather."""
    model = _make_model(ds, "graph_lam")
    mesh = _mesh(1, 4)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=0)
    g2m = sharded.metas["g2m"]  # senders: the 729-node grid
    assert g2m.strategy == "halo", g2m
    # payload rows exchanged per round vs a full gather of the slab
    halo_rows = sum(g2m.halo_sizes)
    assert halo_rows < g2m.n_send_local, (
        f"halo ({halo_rows} rows) should be far below a full slab "
        f"gather ({g2m.n_send_local} rows)"
    )
    # every edge set records its strategy; the fine-level m2g must be
    # halo-based too (the merged multiscale m2m legitimately falls back
    # to all_gather: its coarse-level edges span the whole domain). The
    # 9x9 toy mesh's slabs are only ~2 columns wide, so the invariant
    # checked for mesh-sender sets is the weaker one that still holds
    # at any scale: the extended array stays below a full gather.
    m2g = sharded.metas["m2g"]
    assert m2g.strategy == "halo"
    assert m2g.ext_size < m2g.n_send_local * m2g.n_shards
    # on a hierarchical graph the finest-level same-level edges are
    # short-range -> halo exchange, payload below a full gather
    hi = _make_model(ds, "hi_lam")
    hi_sharded = ShardedModel(hi, ds, mesh, all_gather_max_nodes=0)
    m2m0 = hi_sharded.metas["m2m0"]
    assert m2m0.strategy == "halo", m2m0
    assert m2m0.ext_size < m2m0.n_send_local * m2m0.n_shards


def test_sharded_forward_with_forced_halos(ds):
    """Numerical equivalence through the ppermute halo path proper
    (not just the all_gather fallback)."""
    model = _make_model(ds, "graph_lam")
    mesh = _mesh(1, 8)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=0)
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(2))
    init, forcing, boundary = _batch(ds, B=1, T=1, seed=3)
    ref, _ = fc.forward(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )
    got, _ = sharded.forward(
        params, fc,
        jnp.asarray(sharded.pad_grid(init)),
        jnp.asarray(sharded.pad_grid(forcing)),
        jnp.asarray(sharded.pad_grid(boundary)),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize(
    "model_name,loss_name,model_kw",
    [
        ("graph_lam", "wmse", {}),
        ("graph_lam", "nll", {"output_std": True}),
        ("hi_lam", "wmse", {}),
    ],
)
def test_sharded_loss_matches_replicated(ds, model_name, loss_name,
                                         model_kw):
    """One sharded train step computes the same loss value as the
    replicated Trainer loss (metrics registry incl. NLL/output_std)."""
    from neural_lam_tpu.config import (
        DatastoreSelection,
        NeuralLAMConfig,
    )
    from neural_lam_tpu.trainer import Trainer, TrainingArgs

    model = _make_model(ds, model_name, **model_kw)
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(1))
    optimizer = optax.adamw(1e-3, b1=0.9, b2=0.95)
    opt_state = optimizer.init(params)

    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(batch_size=2, loss=loss_name)
    trainer = Trainer(fc, config, ds, args)

    mesh = _mesh(2, 4)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=64)
    train_step = sharded.make_train_step(
        fc, optimizer, trainer.per_var_std, loss_name=loss_name
    )

    init, forcing, target = _batch(ds, B=2, T=1, seed=7)
    # replicated loss value
    ref_loss = float(
        trainer._loss(
            params, jnp.asarray(init), jnp.asarray(target),
            jnp.asarray(forcing),
        )
    )
    sharding = sharded.node_sharding()
    dev = lambda a: jax.device_put(  # noqa: E731
        jnp.asarray(sharded.pad_grid(a)), sharding
    )
    _, _, loss = train_step(
        params, opt_state, dev(init), dev(target), dev(forcing)
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-4)


def test_sharded_train_step_reduces_loss(ds):
    model = _make_model(ds, "hi_lam")
    fc = ARForecaster(model, ds)
    mesh = _mesh(2, 4)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=64)
    params = model.init_params(jax.random.PRNGKey(1))
    optimizer = optax.adamw(1e-3, b1=0.9, b2=0.95)
    opt_state = optimizer.init(params)
    per_var_std = jnp.ones((N_STATE,), jnp.float32)
    train_step = sharded.make_train_step(fc, optimizer, per_var_std)

    init, forcing, target = _batch(ds, B=2, T=1, seed=1)
    sharding = sharded.node_sharding()
    dev = lambda a: jax.device_put(  # noqa: E731
        jnp.asarray(sharded.pad_grid(a)), sharding
    )
    init, forcing, target = dev(init), dev(forcing), dev(target)

    losses = []
    for _ in range(5):
        params, opt_state, loss = train_step(
            params, opt_state, init, target, forcing
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_sharded_eval_step(ds):
    """Per-sample eval metrics incl. per-unroll losses, matching the
    replicated eval step's values."""
    from neural_lam_tpu.config import (
        DatastoreSelection,
        NeuralLAMConfig,
    )
    from neural_lam_tpu.trainer import Trainer, TrainingArgs

    model = _make_model(ds, "graph_lam")
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(4))
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(batch_size=2, val_steps_to_log=(1, 2))
    trainer = Trainer(fc, config, ds, args)
    ref_eval = trainer.make_eval_step(pred_steps=2)

    mesh = _mesh(2, 4)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=64)
    eval_step = sharded.make_eval_step(
        fc, trainer.per_var_std, "wmse", (1, 2), pred_steps=2
    )

    init, forcing, target = _batch(ds, B=2, T=2, seed=9)
    ref = ref_eval(
        params, jnp.asarray(init), jnp.asarray(target),
        jnp.asarray(forcing),
    )
    sharding = sharded.node_sharding()
    dev = lambda a: jax.device_put(  # noqa: E731
        jnp.asarray(sharded.pad_grid(a)), sharding
    )
    got = eval_step(params, dev(init), dev(target), dev(forcing))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-5
        )


def test_sharded_static_tables_keep_compute_dtype(ds):
    """bf16 mixed precision must survive sharding: the static node
    slabs take the model's compute dtype instead of silently promoting
    every stream back to float32 through the input concat."""
    import jax.numpy as jnp

    model = _make_model(ds, "graph_lam", compute_dtype=jnp.bfloat16)
    mesh = _mesh(1, 4)
    sharded = ShardedModel(model, ds, mesh, all_gather_max_nodes=64)
    tables = sharded._host_tables
    assert tables["grid_static"].dtype == jnp.bfloat16
    for k, v in tables.items():
        if k.startswith("mesh_static"):
            assert v.dtype == jnp.bfloat16, k
    # masks stay f32 (they blend truth/pred exactly like the replicated
    # forecaster, models/forecaster.py:39-42)
    assert tables["boundary_mask"].dtype == np.float32
