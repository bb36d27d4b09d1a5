"""End-to-end CLI: create graph, train 2 epochs, evaluate from checkpoint.

The CLI-level integration test (reference: tests/test_cli.py,
tests/test_training.py:144-161) at tiny sizes.
"""

import json

import pytest
import yaml

from neural_lam_tpu import create_graph, train_model


@pytest.fixture(scope="module")
def config_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    ds_cfg = root / "dummy.datastore.yaml"
    ds_cfg.write_text(
        yaml.safe_dump(
            {
                "n_grid_x": 10,
                "n_grid_y": 10,
                "n_timesteps": 16,
                "seed": 7,
            }
        ),
        encoding="utf-8",
    )
    cfg = root / "config.yaml"
    cfg.write_text(
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
    return cfg


def test_create_graph_cli(config_path):
    create_graph.main(
        ["--config_path", str(config_path), "--name", "1level", "--levels", "1"]
    )
    graph_dir = config_path.parent / "graph" / "1level"
    assert (graph_dir / "graph.npz").exists()


def test_train_and_eval_cli(config_path, tmp_path):
    runs_root = tmp_path / "runs"
    common = [
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(runs_root),
        "--logger_run_name", "testrun",
        "--val_steps_to_log", "1",
    ]
    train_model.main(common + ["--epochs", "2"])

    run_dir = runs_root / "testrun"
    assert (run_dir / "checkpoints" / "latest").exists()
    assert (run_dir / "checkpoints" / "min_val_loss").exists()
    history = [
        json.loads(line)
        for line in (run_dir / "history.jsonl").read_text().splitlines()
    ]
    assert len(history) == 2
    assert all("train_loss" in h for h in history)

    # Eval from the saved checkpoint
    train_model.main(
        common
        + [
            "--eval", "test",
            "--ar_steps_eval", "2",
            "--load", str(run_dir),
            "--logger_run_name", "testeval",
        ]
    )
    eval_dir = runs_root / "testeval"
    metrics = json.loads(
        (eval_dir / "test_metrics.json").read_text(encoding="utf-8")
    )
    assert "test_loss" in metrics and metrics["test_loss"] > 0


def test_eval_without_load_warns(config_path, tmp_path, capsys):
    """--eval with no --load evaluates fresh parameters and must say so
    (reference: tests/test_train_model_warnings.py,
    train_model.py:382-385)."""
    train_model.main([
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(tmp_path / "runs_warn"),
        "--logger_run_name", "warnrun",
        "--val_steps_to_log", "1",
        "--eval", "test",
        "--ar_steps_eval", "1",
    ])
    out = capsys.readouterr().out
    assert "--eval without --load" in out


def test_eval_with_gif_and_watch(config_path, tmp_path):
    runs_root = tmp_path / "runs2"
    common = [
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(runs_root),
        "--val_steps_to_log", "1",
    ]
    train_model.main(
        common + ["--epochs", "1", "--logger_run_name", "gifrun"]
    )
    train_model.main(
        common
        + [
            "--eval", "test",
            "--ar_steps_eval", "3",
            "--load", str(runs_root / "gifrun"),
            "--logger_run_name", "gifeval",
            "--create_gif",
            "--metrics_watch", "test_rmse",
            "--var_leads_metrics_watch", '{"state_var_0": [1, 3]}',
        ]
    )
    eval_dir = runs_root / "gifeval"
    metrics = json.loads(
        (eval_dir / "test_metrics.json").read_text(encoding="utf-8")
    )
    assert "test_rmse_state_var_0_step1" in metrics
    assert "test_rmse_state_var_0_step3" in metrics
    gifs = list(eval_dir.glob("*.gif"))
    assert gifs, "expected example-prediction GIFs"


def test_train_cli_spatial_shards(config_path, tmp_path):
    """--spatial_shards trains through the sharded executor end-to-end
    (graph partitioned over 4 of the 8 virtual devices, batch over 2)."""
    graph_dir = config_path.parent / "graph" / "1level"
    if not (graph_dir / "graph.npz").exists():
        create_graph.main(
            ["--config_path", str(config_path), "--name", "1level",
             "--levels", "1"]
        )
    runs_root = tmp_path / "runs"
    train_model.main([
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--epochs", "2",
        "--spatial_shards", "4",
        "--runs_root", str(runs_root),
        "--logger_run_name", "spatialrun",
        "--val_steps_to_log", "1",
    ])
    run_dir = runs_root / "spatialrun"
    history = [
        json.loads(line)
        for line in (run_dir / "history.jsonl").read_text().splitlines()
    ]
    assert len(history) == 2
    assert all("train_loss" in h and "val_loss" in h for h in history)
    import numpy as np

    assert np.isfinite([h["train_loss"] for h in history]).all()

    # evaluation from the spatial checkpoint, still sharded
    train_model.main([
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--spatial_shards", "4",
        "--eval", "test",
        "--ar_steps_eval", "2",
        "--load", str(run_dir),
        "--runs_root", str(runs_root),
        "--logger_run_name", "spatialeval",
        "--val_steps_to_log", "1",
    ])
    metrics = json.loads(
        (runs_root / "spatialeval" / "test_metrics.json").read_text()
    )
    assert np.isfinite(list(metrics.values())).all()


def test_debug_nans_cli(config_path, tmp_path):
    """--debug_nans enables the NaN tripwire (counterpart of the
    reference's detect_anomaly, reference: tests/test_training.py:77):
    normal training still completes with the flag on."""
    graph_dir = config_path.parent / "graph" / "1level"
    if not (graph_dir / "graph.npz").exists():
        create_graph.main(
            ["--config_path", str(config_path), "--name", "1level",
             "--levels", "1"]
        )
    import jax

    try:
        train_model.main([
            "--config_path", str(config_path),
            "--graph", "1level",
            "--hidden_dim", "8",
            "--processor_layers", "1",
            "--batch_size", "2",
            "--epochs", "1",
            "--debug_nans",
            "--runs_root", str(tmp_path / "runs"),
            "--logger_run_name", "nanrun",
            "--val_steps_to_log", "1",
        ])
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)


def test_load_accepts_checkpoints_dir_and_named_checkpoint(
    config_path, tmp_path
):
    """--load resolves a run dir, its checkpoints/ dir, and a specific
    checkpoint path to the same checkpoint."""
    graph_dir = config_path.parent / "graph" / "1level"
    if not (graph_dir / "graph.npz").exists():
        create_graph.main(
            ["--config_path", str(config_path), "--name", "1level",
             "--levels", "1"]
        )
    runs_root = tmp_path / "runs"
    common = [
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(runs_root),
        "--val_steps_to_log", "1",
    ]
    train_model.main(
        common + ["--epochs", "1", "--logger_run_name", "loadsrc"]
    )
    run_dir = runs_root / "loadsrc"
    for i, load_path in enumerate(
        (
            run_dir / "checkpoints",
            run_dir / "checkpoints" / "min_val_loss",
        )
    ):
        train_model.main(
            common
            + [
                "--eval", "test",
                "--ar_steps_eval", "1",
                "--load", str(load_path),
                "--logger_run_name", f"loadeval{i}",
            ]
        )
        metrics = json.loads(
            (runs_root / f"loadeval{i}" / "test_metrics.json").read_text()
        )
        assert "test_loss" in metrics
    # no spurious runs_root-level checkpoints dir was created
    assert not (runs_root / "checkpoints").exists()
    # missing checkpoint gives a clear error, not a FileNotFoundError
    # deep inside orbax
    with pytest.raises(SystemExit, match="no checkpoint"):
        train_model.main(
            common
            + [
                "--eval", "test",
                "--ar_steps_eval", "1",
                "--load", str(runs_root / "nosuchrun"),
                "--logger_run_name", "loadevalmissing",
            ]
        )


def test_resume_continues_epochs_and_keeps_best(config_path, tmp_path):
    """--load <run> --restore_opt into the same run dir continues epoch
    numbering and must not clobber a better historical min_val_loss
    checkpoint (Lightning restores best_model_score across resume)."""
    graph_dir = config_path.parent / "graph" / "1level"
    if not (graph_dir / "graph.npz").exists():
        create_graph.main(
            ["--config_path", str(config_path), "--name", "1level",
             "--levels", "1"]
        )
    runs_root = tmp_path / "runs"
    common = [
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(runs_root),
        "--logger_run_name", "resumerun",
        "--val_steps_to_log", "1",
    ]
    train_model.main(common + ["--epochs", "2"])
    run_dir = runs_root / "resumerun"
    best_meta = json.loads(
        (run_dir / "checkpoints" / "best.json").read_text()
    )

    train_model.main(
        common
        + ["--epochs", "4", "--load", str(run_dir), "--restore_opt"]
    )
    history = [
        json.loads(line)
        for line in (run_dir / "history.jsonl").read_text().splitlines()
    ]
    # epochs 0,1 then resumed 2,3 — no restart at 0
    assert [h["epoch"] for h in history] == [0, 1, 2, 3]
    best_meta2 = json.loads(
        (run_dir / "checkpoints" / "best.json").read_text()
    )
    assert best_meta2["val_loss"] <= best_meta["val_loss"]


def test_kernel_tuning_flags(monkeypatch):
    """The NEURAL_LAM_TPU_* perf knobs are discoverable as CLI flags
    (VERDICT r2 #8); an explicitly set env var wins over the flag."""
    import os

    for env in train_model._KERNEL_FLAG_ENV.values():
        # setenv-then-delenv (not bare delenv): monkeypatch only
        # registers an undo for vars it SET, so this guarantees the
        # values apply_kernel_flags writes below are scrubbed after the
        # test instead of leaking kernel-mode env into the whole session
        monkeypatch.setenv(env, "sentinel")
        monkeypatch.delenv(env)
    args = train_model.build_parser().parse_args(
        [
            "--config_path", "unused",
            "--pallas", "interpret",
            "--matmul_precision", "high-kernels",
            "--cache_pre", "off",
        ]
    )
    train_model.apply_kernel_flags(args)
    assert os.environ["NEURAL_LAM_TPU_PALLAS"] == "interpret"
    assert os.environ["NEURAL_LAM_TPU_MATMUL_PRECISION"] == "high-kernels"
    assert os.environ["NEURAL_LAM_TPU_CACHE_PRE"] == "off"
    # unset flags leave their env vars untouched
    assert "NEURAL_LAM_TPU_TILING" not in os.environ
    # explicit env beats the flag (the documented escape hatch)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "off")
    train_model.apply_kernel_flags(args)
    assert os.environ["NEURAL_LAM_TPU_PALLAS"] == "off"
    # every knob in the map has a matching CLI flag
    for flag in train_model._KERNEL_FLAG_ENV:
        assert hasattr(args, flag)


def test_predict_cli_exports_forecasts(config_path, tmp_path):
    """The serving path: train via the CLI, then export physical-unit
    forecasts from the checkpoint with python -m neural_lam_tpu.predict
    (the reference's --eval writes metrics/plots only; there is no way
    to get forecast fields out of it)."""
    import numpy as np

    from neural_lam_tpu import predict
    from neural_lam_tpu.checkpoint import load_forecaster_from_checkpoint
    from neural_lam_tpu.config import load_config_and_datastore

    if not (config_path.parent / "graph" / "1level" / "graph.npz").exists():
        create_graph.main([
            "--config_path", str(config_path),
            "--name", "1level",
            "--levels", "1",
        ])
    runs_root = tmp_path / "runs"
    train_model.main([
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(runs_root),
        "--logger_run_name", "servetrain",
        "--val_steps_to_log", "1",
        "--epochs", "1",
    ])
    out_dir = tmp_path / "forecasts"
    predict.main([
        "--config_path", str(config_path),
        "--load", str(runs_root / "servetrain"),
        "--split", "test",
        "--ar_steps", "3",
        "--batch_size", "2",
        "--n_samples", "3",
        "--out", str(out_dir),
    ])

    meta = json.loads(
        (out_dir / "forecast_meta.json").read_text(encoding="utf-8")
    )
    _, datastore = load_config_and_datastore(str(config_path))
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    assert meta["num_grid_points"] == n
    assert len(meta["var_names"]) == d

    files = sorted(out_dir.glob("forecast_test_*.npz"))
    assert len(files) == 3
    first = np.load(files[0])
    assert first["prediction"].shape == (3, n, d)
    assert first["target_times"].shape == (3,)
    assert np.isfinite(first["prediction"]).all()

    # physical-unit round trip: destandardizing the raw forward by hand
    # must reproduce the exported file exactly
    import jax
    import jax.numpy as jnp

    from neural_lam_tpu.dataset import WeatherDataset
    from neural_lam_tpu.trainer import Trainer, TrainingArgs
    from neural_lam_tpu.config import NeuralLAMConfig, DatastoreSelection

    fc, params, _ = load_forecaster_from_checkpoint(
        runs_root / "servetrain", datastore
    )
    dataset = WeatherDataset(datastore, split="test", ar_steps=3)
    init, target, forcing, _times = dataset[0]
    trainer = Trainer(
        fc,
        NeuralLAMConfig(
            datastore=DatastoreSelection(kind="dummydata", config_path="")
        ),
        datastore,
        TrainingArgs(batch_size=1),
    )
    init_s, target_s, forcing_s = trainer.standardize_batch(
        jnp.asarray(init)[None], jnp.asarray(target)[None],
        jnp.asarray(forcing)[None],
    )
    pred_s, _ = fc.forward(params, init_s, forcing_s, target_s)
    stats = datastore.get_standardization_dataarray(category="state")
    want = np.asarray(pred_s)[0] * np.asarray(
        stats["state_std"], np.float32
    ) + np.asarray(stats["state_mean"], np.float32)
    np.testing.assert_allclose(
        first["prediction"], want, rtol=1e-5, atol=1e-6
    )

    # --batch_size 1 dispatches pad to 2 (single-sample kernels run
    # half-width lanes and measure SLOWER than a padded pair on v5e);
    # the padding must be invisible in the exported fields
    out_b1 = tmp_path / "forecasts_b1"
    predict.main([
        "--config_path", str(config_path),
        "--load", str(runs_root / "servetrain"),
        "--split", "test",
        "--ar_steps", "3",
        "--batch_size", "1",
        "--n_samples", "2",
        "--out", str(out_b1),
    ])
    files_b1 = sorted(out_b1.glob("forecast_test_*.npz"))
    assert len(files_b1) == 2
    for fa, fb in zip(files_b1, files):
        a, b = np.load(fa), np.load(fb)
        np.testing.assert_allclose(
            a["prediction"], b["prediction"], rtol=1e-5, atol=1e-6
        )


def test_reference_compat_flags(config_path, tmp_path):
    """The reference's runtime flags have direct counterparts:
    --devices caps the data mesh, --num_workers sets prefetch depth,
    --wandb_id aliases --logger_run_id, --num_nodes validates the
    process count (reference: train_model.py:108-123, 300-306)."""
    args = train_model.build_parser().parse_args(
        ["--config_path", "x", "--wandb_id", "abc123"]
    )
    assert args.logger_run_id == "abc123"

    if not (config_path.parent / "graph" / "1level" / "graph.npz").exists():
        create_graph.main([
            "--config_path", str(config_path),
            "--name", "1level",
            "--levels", "1",
        ])
    train_model.main([
        "--config_path", str(config_path),
        "--graph", "1level",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--batch_size", "2",
        "--runs_root", str(tmp_path / "runs"),
        "--logger_run_name", "compat",
        "--val_steps_to_log", "1",
        "--epochs", "1",
        "--devices", "2",
        "--num_workers", "1",
        "--num_nodes", "1",
    ])
    assert (tmp_path / "runs" / "compat" / "history.jsonl").exists()

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="num_nodes"):
        train_model.main([
            "--config_path", str(config_path),
            "--graph", "1level",
            "--num_nodes", "7",
            "--runs_root", str(tmp_path / "runs"),
        ])


def test_accuracy_probe_compare(tmp_path):
    """scripts/accuracy_probe.py --compare: pure-numpy comparison path
    (the backend runs are exercised on hardware; the compare path must
    stay runnable anywhere)."""
    import json
    import subprocess
    import sys
    from pathlib import Path as _Path

    import numpy as np

    repo = _Path(__file__).resolve().parent.parent
    rng = np.random.default_rng(0)
    want = rng.normal(size=(1, 3, 10, 2)).astype(np.float32)
    got = want + 0.01 * rng.normal(size=want.shape).astype(np.float32)
    a, b = tmp_path / "got.npz", tmp_path / "want.npz"
    np.savez_compressed(a, prediction=got)
    np.savez_compressed(b, prediction=want)
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "accuracy_probe.py"),
         "--compare", str(a), str(b)],
        capture_output=True, text=True, check=True,
    )
    rows = json.loads(out.stdout)
    assert [r["step"] for r in rows] == [1, 2, 3]
    scale = np.abs(want).mean()
    d = np.abs(got[:, 0] - want[:, 0])
    np.testing.assert_allclose(rows[0]["mean_rel"], d.mean() / scale,
                               rtol=1e-5)
    np.testing.assert_allclose(rows[0]["max_rel"], d.max() / scale,
                               rtol=1e-5)
