"""Logger adapters: CSV native, W&B/MLflow against faked backends.

Counterpart of the reference logger tests
(reference: tests/test_custom_loggers.py): the W&B/MLflow client
libraries are faked in sys.modules so the adapters' call contracts
(resume-by-id, float coercion, figure file naming, run teardown) are
pinned without the services installed.
"""

import json
import sys
import types

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pytest  # noqa: E402

from neural_lam_tpu.loggers import (  # noqa: E402
    CSVLogger,
    MLFlowLogger,
    NullLogger,
    WandbLogger,
    setup_training_logger,
)


@pytest.fixture()
def fig():
    f = plt.figure(figsize=(1, 1))
    yield f
    plt.close(f)


def test_csv_logger_roundtrip(tmp_path, fig):
    logger = CSVLogger(tmp_path)
    logger.log_hparams({"lr": 1e-3, "model": "graph_lam"})
    logger.log_metrics({"train_loss": 1.5}, step=0)
    logger.log_metrics({"train_loss": 1.25, "val_loss": 2.0}, step=1)
    logger.log_image("val/example", fig, step=1)
    logger.finish()

    records = [
        json.loads(line)
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert records[0] == {"train_loss": 1.5, "step": 0}
    assert records[1]["val_loss"] == 2.0
    assert json.loads((tmp_path / "hparams.json").read_text())[
        "model"
    ] == "graph_lam"
    # slashes sanitised in figure file names
    assert (tmp_path / "figures" / "val_example_1.png").exists()


class _FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.calls = []
        self.init_kwargs = None

    def init(self, **kwargs):
        self.init_kwargs = kwargs
        self.run = types.SimpleNamespace(
            config=types.SimpleNamespace(
                update=lambda *a, **k: self.calls.append(("config", a))
            ),
            define_metric=lambda key, summary=None: self.calls.append(
                ("define_metric", key, summary)
            ),
        )
        return self.run

    def log(self, data, step=None):
        self.calls.append(("log", data, step))

    def Image(self, figure):
        return ("image", figure)

    def finish(self):
        self.calls.append(("finish",))


def test_wandb_adapter_contract(monkeypatch, fig):
    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    logger = WandbLogger(
        project="proj", run_name="run", run_id="abc123",
        config={"a": 1},
    )
    # resume-by-id semantics (reference: utils.py:746-772)
    assert fake.init_kwargs["id"] == "abc123"
    assert fake.init_kwargs["resume"] == "allow"
    # min-summary registration (reference: utils.py:689-713)
    logger.watch_min_metrics(["val_loss", "val_loss_unroll1"])
    logger.log_metrics({"loss": 1.0}, step=3)
    logger.log_image("examples/t2m", fig, step=3)
    logger.finish()
    kinds = [c[0] for c in fake.calls]
    assert kinds == [
        "define_metric", "define_metric", "log", "log", "finish",
    ]
    assert fake.calls[0][1:] == ("val_loss", "min")
    assert fake.calls[1][1:] == ("val_loss_unroll1", "min")
    assert fake.calls[2][1:] == ({"loss": 1.0}, 3)
    # images fold the lead-time step into the key and log WITHOUT an
    # explicit wandb step: W&B silently drops logs whose step is below
    # the run's current step, and image steps are lead times
    assert fake.calls[3][1]["examples/t2m_step3"] == ("image", fig)
    assert fake.calls[3][2] is None


class _FakeMLflow(types.ModuleType):
    def __init__(self):
        super().__init__("mlflow")
        self.calls = []

    def set_tracking_uri(self, uri):
        self.calls.append(("uri", uri))

    def set_experiment(self, name):
        self.calls.append(("experiment", name))

    def start_run(self, run_name=None):
        self.calls.append(("start", run_name))
        return types.SimpleNamespace()

    def log_metrics(self, metrics, step=None):
        self.calls.append(("metrics", metrics, step))

    def log_figure(self, figure, name):
        self.calls.append(("figure", name))

    def log_params(self, params):
        self.calls.append(("params", params))

    def end_run(self):
        self.calls.append(("end",))


def test_mlflow_adapter_contract(monkeypatch, fig):
    fake = _FakeMLflow()
    monkeypatch.setitem(sys.modules, "mlflow", fake)
    logger = MLFlowLogger(
        experiment="exp", run_name="r1", tracking_uri="file:/tmp/mlf"
    )
    import numpy as np

    logger.log_metrics({"loss": np.float32(2.5)}, step=1)
    logger.log_image("maps/pred", fig, step=4)
    logger.log_hparams({"hidden_dim": 64})
    logger.finish()
    names = [c[0] for c in fake.calls]
    assert names == [
        "uri", "experiment", "start", "metrics", "figure", "params",
        "end",
    ]
    # metric values coerced to python floats
    # (reference custom_loggers only handles floats)
    (_, metrics, step) = fake.calls[3]
    assert isinstance(metrics["loss"], float) and step == 1
    # figure path slash-sanitised with step suffix
    assert fake.calls[4][1] == "maps_pred_4.png"
    assert fake.calls[5][1] == {"hidden_dim": "64"}


def test_setup_logger_fallbacks(tmp_path, monkeypatch):
    assert isinstance(
        setup_training_logger("none", tmp_path), NullLogger
    )
    # missing backend -> CSV fallback instead of a crash
    monkeypatch.setitem(sys.modules, "wandb", None)
    logger = setup_training_logger("wandb", tmp_path)
    assert isinstance(logger, CSVLogger)


def test_plot_error_map_deprecated_alias():
    import numpy as np

    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.vis import plot_error_map

    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_timesteps=8)
    errors = np.abs(np.random.default_rng(0).normal(size=(3, 3)))
    with pytest.warns(DeprecationWarning):
        fig = plot_error_map(errors, ds)
    plt.close(fig)
