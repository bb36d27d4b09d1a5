"""run_test_evaluation artifact pipeline: padding correctness and
multi-batch example plotting.

Counterpart of the reference's test-phase artifact checks
(reference: neural_lam/models/module.py:511-962); regression tests for
the third review batch.
"""

import jax
import numpy as np
import pytest

from neural_lam_tpu.config import DatastoreSelection, NeuralLAMConfig
from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.evaluation import run_test_evaluation
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.loader import DataLoader
from neural_lam_tpu.loggers import BaseLogger
from neural_lam_tpu.models import ARForecaster, GraphLAM
from neural_lam_tpu.trainer import Trainer, TrainingArgs


class _CountingLogger(BaseLogger):
    def __init__(self):
        self.images = []
        self.metrics = {}

    def log_metrics(self, metrics, step=None):
        self.metrics.update(metrics)

    def log_image(self, key, figure, step=None):
        self.images.append(key)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_ds")
    ds = DummyDatastore(
        n_grid_x=10, n_grid_y=10, n_timesteps=14, root_path=root
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "1level",
        hierarchical=False, n_max_levels=1,
    )
    model = GraphLAM(
        ds, graph_name="1level", hidden_dim=8, processor_layers=2
    )
    fc = ARForecaster(model, ds)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    return ds, fc, config


def _run(ds, fc, config, run_dir, batch_size, n_example_pred=0):
    args = TrainingArgs(batch_size=batch_size, val_steps_to_log=(1,))
    trainer = Trainer(fc, config, ds, args)
    params, _ = trainer.init_state(jax.random.PRNGKey(0))
    dataset = WeatherDataset(ds, split="test", ar_steps=2)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False)
    logger = _CountingLogger()
    metrics = run_test_evaluation(
        trainer, params, loader, ds, run_dir,
        logger=logger, split="test",
        n_example_pred=n_example_pred,
    )
    return metrics, logger, len(dataset)


def test_spatial_loss_unbiased_by_tail_padding(setup, tmp_path):
    """mean_spatial_loss must weight every real sample once even when
    the last batch is padded (repeats of the final sample)."""
    ds, fc, config = setup
    dataset = WeatherDataset(ds, split="test", ar_steps=2)
    n = len(dataset)
    batch = 4
    assert n % batch != 0, f"fixture must leave a ragged tail (n={n})"

    _, _, _ = _run(ds, fc, config, tmp_path / "ragged", batch)
    spatial_ragged = np.load(tmp_path / "ragged" / "mean_spatial_loss.npy")
    _, _, _ = _run(ds, fc, config, tmp_path / "b1", 1)
    spatial_ref = np.load(tmp_path / "b1" / "mean_spatial_loss.npy")
    np.testing.assert_allclose(
        spatial_ragged, spatial_ref, rtol=2e-5, atol=1e-7
    )


def test_example_plots_span_batches(setup, tmp_path):
    """n_example_pred larger than the batch size must keep plotting
    distinct examples from subsequent batches
    (reference: module.py:584-768 plots the first N samples)."""
    ds, fc, config = setup
    n_examples = 3
    metrics, logger, n = _run(
        ds, fc, config, tmp_path, batch_size=2,
        n_example_pred=n_examples,
    )
    assert n >= n_examples
    n_vars = len(ds.get_vars_names("state"))
    example_keys = [k for k in logger.images if "_example_" in k]
    assert len(example_keys) == n_examples * n_vars
    # distinct global example indices 0..n_examples-1 in the keys
    indices = {k.split("_example_")[1].split("/")[0] for k in example_keys}
    assert indices == {str(i) for i in range(n_examples)}
