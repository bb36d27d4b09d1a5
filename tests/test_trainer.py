"""Trainer harness: loss decreases, eval metrics, checkpoint round-trip.

Plays the role of the reference's slow end-to-end training test
(reference: tests/test_training.py:144-161) at tiny sizes, plus the
checkpoint round-trip semantics
(reference: tests/test_prediction_model_classes.py:74-170).
"""

import jax
import numpy as np
import pytest

from neural_lam_tpu.checkpoint import CheckpointManager
from neural_lam_tpu.config import (
    DatastoreSelection,
    NeuralLAMConfig,
)
from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.loader import DataLoader
from neural_lam_tpu.models import ARForecaster, GraphLAM
from neural_lam_tpu.trainer import Trainer, TrainingArgs


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_ds")
    ds = DummyDatastore(
        n_grid_x=12, n_grid_y=12, n_timesteps=20, root_path=root
    )
    create_graph_from_datastore(
        ds,
        ds.root_path / "graph" / "1level",
        hierarchical=False,
        n_max_levels=1,
    )
    model = GraphLAM(
        ds, graph_name="1level", hidden_dim=8, processor_layers=2
    )
    fc = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    return ds, fc, config


def _loaders(ds, ar_steps, batch_size=2):
    train = DataLoader(
        WeatherDataset(ds, split="train", ar_steps=ar_steps),
        batch_size=batch_size,
        shuffle=True,
        seed=0,
    )
    val = DataLoader(
        WeatherDataset(ds, split="val", ar_steps=ar_steps),
        batch_size=batch_size,
    )
    return train, val


def test_training_reduces_loss(setup):
    ds, fc, config = setup
    args = TrainingArgs(
        lr=1e-3, batch_size=2, ar_steps_train=1, val_steps_to_log=(1,)
    )
    trainer = Trainer(fc, config, ds, args)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    train_loader, val_loader = _loaders(ds, ar_steps=1)

    params, opt_state, history = trainer.fit(
        params, opt_state, train_loader, val_loader, epochs=5
    )
    losses = [h["train_loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"Loss did not decrease: {losses}"
    assert "val_loss" in history[-1]
    assert "val_loss_unroll1" in history[-1]


def test_eval_multi_step(setup):
    ds, fc, config = setup
    args = TrainingArgs(val_steps_to_log=(1, 3, 10))
    trainer = Trainer(fc, config, ds, args)
    params, _ = trainer.init_state(jax.random.PRNGKey(1))
    _, val_loader = _loaders(ds, ar_steps=3)
    metrics = trainer.evaluate(params, val_loader, prefix="test")
    assert "test_loss" in metrics
    assert "test_loss_unroll3" in metrics
    # Steps beyond the rollout must be skipped, not crash
    assert "test_loss_unroll10" not in metrics


def test_checkpoint_roundtrip(setup, tmp_path):
    ds, fc, config = setup
    trainer = Trainer(fc, config, ds, TrainingArgs())
    params, opt_state = trainer.init_state(jax.random.PRNGKey(2))

    mgr = CheckpointManager(tmp_path)
    mgr.save_latest(params, opt_state, step=7, hparams={"model": "graph_lam"})

    params2, opt2 = trainer.init_state(jax.random.PRNGKey(3))
    restored_p, restored_o, step = mgr.restore("latest", params2, opt2)
    assert step == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored_p),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.load_hparams("latest") == {"model": "graph_lam"}

    # Params-only restore (fresh optimizer, reference: module.py:1012-1014)
    p_only = mgr.restore_params_only("latest", params2)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(p_only),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_checkpoint_policy(setup, tmp_path):
    ds, fc, config = setup
    trainer = Trainer(fc, config, ds, TrainingArgs())
    params, opt_state = trainer.init_state(jax.random.PRNGKey(4))
    mgr = CheckpointManager(tmp_path)
    assert mgr.maybe_save_best(1.0, params, opt_state, 1)
    assert not mgr.maybe_save_best(2.0, params, opt_state, 2)
    assert mgr.maybe_save_best(0.5, params, opt_state, 3)
    _, _, step = mgr.restore("min_val_loss", params, opt_state)
    assert step == 3


def test_checkpoint_self_describing_reconstruction(setup, tmp_path):
    """Rebuild the exact architecture from a checkpoint alone
    (reference: neural_lam/train_model.py:41-72)."""
    from neural_lam_tpu.checkpoint import load_forecaster_from_checkpoint

    ds, fc, config = setup
    trainer = Trainer(fc, config, ds, TrainingArgs())
    params, opt_state = trainer.init_state(jax.random.PRNGKey(5))
    mgr = CheckpointManager(tmp_path)
    hparams = {
        "model": "graph_lam",
        "graph": "1level",
        "hidden_dim": 8,
        "hidden_layers": 1,
        "processor_layers": 2,
        "mesh_aggr": "sum",
        "output_std": False,
    }
    mgr.save_latest(params, opt_state, step=3, hparams=hparams)

    fc2, params2, hp2 = load_forecaster_from_checkpoint(tmp_path, ds)
    assert hp2["hidden_dim"] == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(params2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The rebuilt forecaster runs with the restored params
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    out, _ = fc2.predictor.step(
        params2,
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 6)).astype(np.float32),
    )
    assert out.shape == (n, 3)


def test_bf16_mixed_precision_training(setup):
    """bf16 compute path: finite decreasing loss, f32 outputs close to
    the f32 path at init."""
    ds, _, config = setup
    import jax.numpy as jnp

    model16 = GraphLAM(
        ds, graph_name="1level", hidden_dim=8, processor_layers=2,
        compute_dtype=jnp.bfloat16,
    )
    model32 = GraphLAM(
        ds, graph_name="1level", hidden_dim=8, processor_layers=2,
    )
    params = model32.init_params(jax.random.PRNGKey(0))
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    forcing = jnp.asarray(rng.normal(size=(n, 6)), dtype=jnp.float32)
    out32, _ = model32.step(params, prev, prev, forcing)
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params
    )
    out16, _ = model16.step(p16, prev, prev, forcing)
    assert out16.dtype == jnp.float32  # state update stays f32
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.1, atol=0.1
    )

    fc = ARForecaster(model16, ds)
    trainer = Trainer(
        fc, config, ds,
        TrainingArgs(batch_size=2, precision="bf16", val_steps_to_log=(1,)),
    )
    tp, topt = trainer.init_state(jax.random.PRNGKey(1))
    train_loader, _ = _loaders(ds, ar_steps=1)
    tp, topt, history = trainer.fit(tp, topt, train_loader, epochs=3)
    losses = [h["train_loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # master params stay f32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(tp)
    )


def test_probabilistic_training_nll(setup):
    """output_std head + nll loss trains (BASELINE config 5)."""
    ds, _, config = setup
    model = GraphLAM(
        ds, graph_name="1level", hidden_dim=8, processor_layers=2,
        output_std=True,
    )
    fc = ARForecaster(model, ds)
    trainer = Trainer(
        fc, config, ds,
        TrainingArgs(batch_size=2, loss="nll", val_steps_to_log=(1,)),
    )
    assert trainer.per_var_std is None  # model predicts its own std
    params, opt_state = trainer.init_state(jax.random.PRNGKey(7))
    train_loader, _ = _loaders(ds, ar_steps=2)
    params, opt_state, history = trainer.fit(
        params, opt_state, train_loader, epochs=4
    )
    losses = [h["train_loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # Forecaster emits a positive std trajectory
    import jax.numpy as jnp

    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    pred, std = fc.forward(
        params,
        jnp.asarray(rng.normal(size=(2, 2, n, 3)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, n, 6)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, n, 3)), dtype=jnp.float32),
    )
    assert std is not None and std.shape == pred.shape
    assert bool(jnp.all(std > 0))


def test_data_parallel_equivalence(setup):
    """Loss on an 8-device data-parallel mesh equals the 1-device loss
    (the DDP-equivalence check the reference could only mock,
    reference: tests/test_training.py:164-229)."""
    from jax.sharding import Mesh

    ds, fc, config = setup
    args = TrainingArgs(batch_size=8, ar_steps_train=1)
    devices = jax.devices()
    mesh8 = Mesh(np.array(devices[:8]), axis_names=("data",))
    mesh1 = Mesh(np.array(devices[:1]), axis_names=("data",))

    n = ds.num_grid_points
    rng = np.random.default_rng(9)
    batch = (
        rng.normal(size=(8, 2, n, 3)).astype(np.float32),
        rng.normal(size=(8, 1, n, 3)).astype(np.float32),
        rng.normal(size=(8, 1, n, 6)).astype(np.float32),
    )

    losses = {}
    for name, mesh in (("dp8", mesh8), ("dp1", mesh1)):
        trainer = Trainer(fc, config, ds, args, mesh=mesh)
        params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step()
        db, _ = trainer.device_put_batch(batch)
        params, opt_state, loss = step(params, opt_state, *db)
        losses[name] = float(loss)
    np.testing.assert_allclose(losses["dp8"], losses["dp1"], rtol=1e-5)


def test_sharded_optimizer_state_parity(tmp_path):
    """ZeRO-1 moment sharding over the data axis: identical training
    trajectory to replicated optimizer state, with AdamW moment leaves
    actually partitioned across devices."""
    import optax  # noqa: F401

    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=12, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(4, 2, n, 3)).astype(np.float32),
        rng.normal(size=(4, 1, n, 3)).astype(np.float32),
        rng.normal(size=(4, 1, n, 6)).astype(np.float32),
    )

    results = {}
    for shard_opt in (False, True):
        fc = ARForecaster(model, ds)
        args = TrainingArgs(batch_size=4, shard_opt_state=shard_opt)
        trainer = Trainer(fc, config, ds, args)
        params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
        if shard_opt:
            assert trainer.mesh.shape["data"] > 1, "needs a multi-device mesh"
            sharded_leaves = [
                leaf
                for leaf in jax.tree_util.tree_leaves(opt_state)
                if hasattr(leaf, "sharding")
                and not leaf.sharding.is_fully_replicated
            ]
            assert sharded_leaves, "no optimizer leaf was partitioned"
        step = trainer.make_train_step()
        db, _ = trainer.device_put_batch(batch)
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, *db)
        results[shard_opt] = (
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
            float(loss),
        )

    ref_params, ref_loss = results[False]
    got_params, got_loss = results[True]
    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(got_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_validation_metrics_watch_promotion(tmp_path):
    """Watched (metric, variable, lead) scalars appear in every
    validation record (reference: models/module.py:806-817)."""
    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=14, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    fc = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(
        batch_size=2,
        val_steps_to_log=(1, 2),
        metrics_watch=("val_rmse",),
        var_leads_metrics_watch={"state_var_0": [1, 2]},
    )
    trainer = Trainer(fc, config, ds, args)
    params, _ = trainer.init_state(jax.random.PRNGKey(0))
    loader = DataLoader(
        WeatherDataset(ds, split="val", ar_steps=2),
        batch_size=2, shuffle=False,
    )
    metrics = trainer.evaluate(params, loader, "val")
    assert "val_rmse_state_var_0_step1" in metrics
    assert "val_rmse_state_var_0_step2" in metrics
    assert np.isfinite(metrics["val_rmse_state_var_0_step1"])
    assert "val_mse_table" not in metrics


def test_eval_tail_batch_smaller_than_mesh(tmp_path):
    """Eval with a tail batch smaller than the data mesh: padded rows
    (repeats of the last sample) must not contaminate the metric — the
    exact DistributedSampler caveat the reference documents
    (reference: README.md:528-530)."""
    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=13, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    fc = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(batch_size=4, val_steps_to_log=(1,))
    trainer = Trainer(fc, config, ds, args)
    assert trainer.num_data_shards > 1, "needs a multi-device mesh"
    params, _ = trainer.init_state(jax.random.PRNGKey(0))

    dataset = WeatherDataset(ds, split="val", ar_steps=1)
    n_samples = len(dataset)
    # choose a batch size that leaves a ragged tail vs the mesh size
    loader = DataLoader(dataset, batch_size=4, shuffle=False)
    tail = n_samples % 4
    assert tail not in (0,), (
        f"fixture must produce a ragged tail (got {n_samples} samples)"
    )
    got = trainer.evaluate(params, loader, "val")

    # reference value: every sample evaluated exactly once at batch 1
    loader1 = DataLoader(dataset, batch_size=1, shuffle=False)
    want = trainer.evaluate(params, loader1, "val")
    np.testing.assert_allclose(
        got["val_loss"], want["val_loss"], rtol=1e-5
    )


def test_scanned_multi_step_matches_sequential(setup):
    """``make_train_step(scan_steps=k)`` over a k-stack of batches must
    produce the same params/opt_state/losses as k sequential dispatches
    of the plain step (it is the same math in one executable)."""
    ds, fc, config = setup
    args = TrainingArgs(lr=1e-3, batch_size=2, ar_steps_train=1)
    trainer = Trainer(fc, config, ds, args)
    step = trainer.make_train_step()
    multi = trainer.make_train_step(scan_steps=3)

    loader, _ = _loaders(ds, ar_steps=1)
    batches = []
    it = iter(loader)
    for _ in range(3):
        dev_batch, _real = trainer.device_put_batch(next(it))
        batches.append(tuple(np.asarray(a) for a in dev_batch))

    params0, opt0 = trainer.init_state(jax.random.PRNGKey(1))
    p_seq, o_seq = params0, opt0
    seq_losses = []
    for b in batches:
        p_seq, o_seq, loss = step(p_seq, o_seq, *b)
        seq_losses.append(float(loss))

    params1, opt1 = trainer.init_state(jax.random.PRNGKey(1))
    stacked = tuple(
        np.stack([b[i] for b in batches]) for i in range(3)
    )
    p_scan, o_scan, losses = multi(params1, opt1, *stacked)

    np.testing.assert_allclose(
        np.asarray(losses), seq_losses, rtol=1e-6
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        p_seq,
        p_scan,
    )


def test_preemption_signal_stops_training(setup):
    """A SIGTERM mid-epoch drains the step loop and fit() returns early
    with the record marked preempted (SURVEY.md 5.3)."""
    import os
    import signal
    import threading

    ds, fc, config = setup
    args = TrainingArgs(lr=1e-3, batch_size=2, ar_steps_train=1)
    trainer = Trainer(fc, config, ds, args)
    trainer.install_preemption_handler()
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    train_loader, _ = _loaders(ds, ar_steps=1)

    # deliver SIGTERM shortly after training starts
    timer = threading.Timer(
        0.5, lambda: os.kill(os.getpid(), signal.SIGTERM)
    )
    timer.start()
    try:
        params, opt_state, history = trainer.fit(
            params, opt_state, train_loader, epochs=50
        )
    finally:
        timer.cancel()
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
    assert trainer.preempt_event.is_set()
    assert len(history) < 50, "fit should stop at the preempted epoch"
    assert history[-1].get("preempted") is True


def test_fit_zero_batch_epoch(setup):
    """An epoch with no batches (empty shard / drop_last on a tiny
    dataset) records NaN instead of crashing on jnp.stack([])."""
    ds, fc, config = setup
    trainer = Trainer(fc, config, ds, TrainingArgs(batch_size=2))
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))

    class EmptyLoader:
        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            return iter(())

    params, opt_state, history = trainer.fit(
        params, opt_state, EmptyLoader(), epochs=1
    )
    assert len(history) == 1
    assert np.isnan(history[0]["train_loss"])


def test_device_prefetch_early_exit_joins_producer(setup):
    """Abandoning the prefetch generator early (preemption, a raising
    step) must unblock and finish the producer thread instead of
    leaving it pinned on a full queue."""
    import threading

    ds, fc, config = setup
    trainer = Trainer(fc, config, ds, TrainingArgs(batch_size=2))
    train_loader, _ = _loaders(ds, ar_steps=1)
    train_loader.set_epoch(0)
    gen = trainer.device_prefetch(train_loader, depth=1)
    next(gen)  # producer is now running and blocked on the full queue
    gen.close()  # early exit; must not hang and must join the producer
    assert not any(
        t.name == "neural-lam-prefetch" and t.is_alive()
        for t in threading.enumerate()
    )


def test_metrics_watch_mse_mae_wmae_and_unsupported_warning(tmp_path):
    """metrics_watch: mse/mae/wmae scalars promote alongside rmse
    (mae without any warning — reference promotes from every computed
    metric table, module.py:806-817); genuinely unsupported metric
    names warn once instead of silently emitting nothing."""
    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=14, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    fc = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(
        batch_size=2,
        val_steps_to_log=(1,),
        metrics_watch=("val_mse", "val_mae", "val_wmae"),
        var_leads_metrics_watch={"state_var_0": [1]},
    )
    trainer = Trainer(fc, config, ds, args)
    params, _ = trainer.init_state(jax.random.PRNGKey(0))
    loader = DataLoader(
        WeatherDataset(ds, split="val", ar_steps=2),
        batch_size=2, shuffle=False,
    )
    import warnings as warnings_mod

    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")  # mae must NOT warn anymore
        metrics = trainer.evaluate(params, loader, "val")
    for key in ("mse", "mae", "wmae"):
        name = f"val_{key}_state_var_0_step1"
        assert name in metrics, sorted(metrics)
        assert np.isfinite(metrics[name])
    assert "val_rmse_state_var_0_step1" not in metrics
    assert metrics["val_mae_state_var_0_step1"] >= 0.0

    # a genuinely unknown watch entry still warns once
    args2 = TrainingArgs(
        batch_size=2,
        val_steps_to_log=(1,),
        metrics_watch=("val_nll",),
        var_leads_metrics_watch={"state_var_0": [1]},
    )
    trainer2 = Trainer(fc, config, ds, args2)
    with pytest.warns(UserWarning, match="nll"):
        metrics2 = trainer2.evaluate(params, loader, "val")
    assert "val_nll_state_var_0_step1" not in metrics2


def test_probabilistic_training_crps_hi_lam_parallel(tmp_path):
    """hi_lam_parallel with a probabilistic objective trains
    (BASELINE config 5: hierarchical parallel model + CRPS)."""
    from neural_lam_tpu.models import HiLAMParallel

    ds = DummyDatastore(
        n_grid_x=30, n_grid_y=30, n_timesteps=14, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "hierarchical", hierarchical=True
    )
    model = HiLAMParallel(
        ds, graph_name="hierarchical", hidden_dim=8,
        processor_layers=2, output_std=True,
    )
    fc = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    trainer = Trainer(
        fc, config, ds,
        TrainingArgs(batch_size=2, loss="crps_gauss", val_steps_to_log=(1,)),
    )
    assert trainer.per_var_std is None
    params, opt_state = trainer.init_state(jax.random.PRNGKey(11))
    loader = DataLoader(
        WeatherDataset(ds, split="train", ar_steps=1),
        batch_size=2, shuffle=True, seed=0,
    )
    params, opt_state, history = trainer.fit(
        params, opt_state, loader, epochs=4
    )
    losses = [h["train_loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"CRPS did not decrease: {losses}"


def test_on_device_standardization_once_and_std_clamped(setup):
    """Counterpart of the reference's on_after_batch_transfer tests
    (reference: tests/test_gpu_normalization.py): the loader yields RAW
    tensors, standardization is applied exactly once inside the step,
    and a near-zero std is clamped so it cannot produce inf/NaN."""
    ds, fc, config = setup
    trainer = Trainer(fc, config, ds, TrainingArgs(batch_size=2))

    # raw loader output: matches the datastore's unstandardized values
    loader = DataLoader(
        WeatherDataset(ds, split="train", ar_steps=1), batch_size=2
    )
    init, target, forcing, _ = next(iter(loader))
    raw_state = np.asarray(
        ds.get_dataarray("state", "train", standardize=False).data
    )
    # every init-state row must appear verbatim in the raw data
    assert np.isin(
        np.asarray(init)[:, 0].round(5), raw_state.round(5)
    ).mean() > 0.99

    # standardize_batch == the formula, applied once
    stats = ds.get_standardization_dataarray("state")
    mean = np.asarray(stats["state_mean"], np.float32)
    std = np.asarray(stats["state_std"], np.float32)
    init_s, target_s, _ = trainer.standardize_batch(
        np.asarray(init), np.asarray(target), np.asarray(forcing)
    )
    np.testing.assert_allclose(
        np.asarray(init_s), (np.asarray(init) - mean) / std, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(target_s),
        (np.asarray(target) - mean) / std,
        rtol=1e-5,
    )

    # clamped stds: never below float32 eps, so standardization of a
    # constant feature stays finite
    eps = np.finfo(np.float32).eps
    assert np.all(np.asarray(trainer.state_std) >= eps)
    assert np.all(np.isfinite(np.asarray(init_s)))


def test_flat_optimizer_parity(tmp_path):
    """flat_opt (optax.flatten over AdamW): identical training
    trajectory to the per-tensor optimizer — AdamW is elementwise, so
    raveling all parameters into one vector changes only the op count
    (collapses the per-tensor optimizer op storm in the XLA tail,
    docs/performance.md round-4 profile), never the numerics. Also
    covers the checkpoint round-trip of the flat opt_state."""
    from neural_lam_tpu.checkpoint import CheckpointManager

    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=12, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(4, 2, n, 3)).astype(np.float32),
        rng.normal(size=(4, 1, n, 3)).astype(np.float32),
        rng.normal(size=(4, 1, n, 6)).astype(np.float32),
    )

    results = {}
    for flat in (False, True):
        fc = ARForecaster(model, ds)
        args = TrainingArgs(batch_size=4, flat_opt=flat)
        trainer = Trainer(fc, config, ds, args)
        params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step()
        db, _ = trainer.device_put_batch(batch)
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, *db)
        results[flat] = (
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
            float(loss),
            trainer,
            params,
            opt_state,
        )

    ref_params, ref_loss = results[False][:2]
    got_params, got_loss = results[True][:2]
    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(got_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    # flat opt_state round-trips through the checkpoint manager
    _, _, trainer, params, opt_state = results[True]
    ckpt = CheckpointManager(tmp_path / "run_flat")
    ckpt.save("latest", params, opt_state, step=3)
    fresh_p, fresh_o = trainer.init_state(jax.random.PRNGKey(1))
    r_params, r_opt, r_step = ckpt.restore("latest", fresh_p, fresh_o)
    assert r_step == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(r_opt),
        jax.tree_util.tree_leaves(opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
