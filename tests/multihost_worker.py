"""Worker for the 2-process multi-host test (run via subprocess).

Each process owns 2 virtual CPU devices of a 4-device cluster; the
script drives the full multi-host path: distributed init, per-host
loader shards assembled into global batches with
``make_array_from_process_local_data``, three SPMD train steps,
process-coordinated checkpoint save + restore round-trip, and a
sharded-eval metric gather. Prints one JSON line with the results.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    coord = sys.argv[3]
    workdir = sys.argv[4]

    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs

    import numpy as np

    from neural_lam_tpu.checkpoint import CheckpointManager
    from neural_lam_tpu.config import (
        DatastoreSelection,
        NeuralLAMConfig,
    )
    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.graphs import create_graph_from_datastore
    from neural_lam_tpu.loader import DataLoader
    from neural_lam_tpu.dataset import WeatherDataset
    from neural_lam_tpu.models import ARForecaster, GraphLAM
    from neural_lam_tpu.trainer import Trainer, TrainingArgs

    # Per-process root with a fixed seed -> identical data, no file races
    root = os.path.join(workdir, f"proc{proc_id}")
    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=16, seed=7, root_path=root
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    forecaster = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(batch_size=2, epochs=1, val_steps_to_log=(1,))
    trainer = Trainer(forecaster, config, ds, args)
    assert trainer.num_data_shards == 2 * num_procs

    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.make_train_step()

    loader = DataLoader(
        WeatherDataset(ds, split="train", ar_steps=1),
        batch_size=2,  # local batch per host
        shuffle=True,
        seed=0,
        shard_index=proc_id,
        num_shards=num_procs,
    )
    losses = []
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        device_batch, real = trainer.device_put_batch(batch)
        assert device_batch[0].shape[0] == 2 * num_procs  # global batch
        params, opt_state, loss = step(params, opt_state, *device_batch)
        losses.append(float(loss))

    # checkpoint round-trip with process coordination
    ckpt = CheckpointManager(os.path.join(workdir, "shared_run"))
    ckpt.save("latest", params, opt_state, step=3)
    p2, o2 = trainer.init_state(jax.random.PRNGKey(1))
    p3, o3, step_no = ckpt.restore("latest", p2, o2)
    leaves_a = jax.tree_util.tree_leaves(jax.device_get(params))
    leaves_b = jax.tree_util.tree_leaves(p3)
    max_diff = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(leaves_a, leaves_b)
    )

    # multi-host eval (metric gather across hosts, odd sample count
    # exercising the padded-tail masking)
    val_loader = DataLoader(
        WeatherDataset(ds, split="val", ar_steps=2),
        batch_size=2,
        shuffle=False,
        shard_index=proc_id,
        num_shards=num_procs,
    )
    metrics = trainer.evaluate(params, val_loader, "val")

    # full artifact evaluation: cross-host metric gather + rank-0-only
    # artifact writes (reference metric sync: module.py:399-418)
    from neural_lam_tpu.evaluation import run_test_evaluation

    eval_dir = os.path.join(workdir, "shared_eval")
    test_metrics = run_test_evaluation(
        trainer,
        params,
        val_loader,
        ds,
        eval_dir,
        split="test",
        # example plots come from rank 0's own shard rows (the
        # globally-first samples); the gif below proves they were drawn
        n_example_pred=1,
        create_gif=True,
    )

    # mid-epoch coordinated preemption: SIGTERM lands on process 0 only,
    # partway through a long fit; the step-interval flag allreduce
    # (preempt_check_every) must drain BOTH processes at the same step
    # index (no peer left mid-collective), and a coordinated rescue
    # checkpoint must still commit afterwards.
    import signal
    import threading

    pre_args = TrainingArgs(
        batch_size=2,
        epochs=500,
        preempt_check_every=2,
        val_interval=10**9,
    )
    pre_trainer = Trainer(forecaster, config, ds, pre_args)
    pre_trainer.install_preemption_handler()
    if proc_id == 0:
        threading.Timer(
            1.0, lambda: signal.raise_signal(signal.SIGTERM)
        ).start()
    pp, oo = pre_trainer.init_state(jax.random.PRNGKey(2))
    pp, oo, history = pre_trainer.fit(pp, oo, loader)
    preempted = bool(history and history[-1].get("preempted"))
    rescue = CheckpointManager(os.path.join(workdir, "shared_rescue"))
    rescue.save("latest", pp, oo, step=len(history))

    # Spatial sharding composed with multi-host data parallelism: the
    # supported mesh layout is data ACROSS hosts, spatial WITHIN each
    # host (jax.devices() is process-major, so reshape(2, 2) puts each
    # host's 2 devices on one data row). Batch assembly, the sharded
    # fused/fallback step, full-mesh ZeRO-1 and the sharded eval all
    # run across the real process boundary.
    from jax.sharding import Mesh

    sp_mesh = Mesh(
        np.array(jax.devices()).reshape(num_procs, 2),
        axis_names=("data", "spatial"),
    )
    sp_trainer = Trainer(
        forecaster,
        config,
        ds,
        TrainingArgs(batch_size=2, val_steps_to_log=(1,)),
        mesh=sp_mesh,
    )
    assert sp_trainer.spatial is not None
    sp_params, sp_opt = sp_trainer.init_state(jax.random.PRNGKey(3))
    sp_step = sp_trainer.make_train_step()
    sp_losses = []
    it_sp = iter(loader)
    for _ in range(2):
        db, _real = sp_trainer.device_put_batch(next(it_sp))
        sp_params, sp_opt, sp_loss = sp_step(sp_params, sp_opt, *db)
        sp_losses.append(float(sp_loss))
    sp_val = sp_trainer.evaluate(sp_params, val_loader, "val")

    print(
        json.dumps(
            {
                "proc": proc_id,
                "losses": losses,
                "restored_step": step_no,
                "ckpt_max_diff": max_diff,
                "val_loss": metrics["val_loss"],
                "test_loss": test_metrics["test_loss"],
                "preempted": preempted,
                "preempt_epochs": len(history),
                "spatial_losses": sp_losses,
                "spatial_val_loss": sp_val["val_loss"],
            }
        )
    )


if __name__ == "__main__":
    main()
