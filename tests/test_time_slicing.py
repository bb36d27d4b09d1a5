"""Exact time-window semantics of WeatherDataset.

Mirrors the reference's behaviour tests
(reference: tests/test_time_slicing.py:15-160): a 1-node, 1-var analysis
series with values [0..9] lets us assert the exact windows produced for
each (ar_steps, num_past, num_future) combination.
"""

from datetime import timedelta
from pathlib import Path

import numpy as np
import pytest

from neural_lam_tpu.datastore.base import BaseDatastore
from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.utils.labeled import FieldArray


class SinglePointDatastore(BaseDatastore):
    """1 grid point, 1 state var, values equal to the time index."""

    is_forecast = False

    def __init__(self, values, forcing_values=None):
        self._values = np.asarray(values, dtype=np.float32)
        self._forcing = (
            np.asarray(forcing_values, dtype=np.float32)
            if forcing_values is not None
            else None
        )
        t0 = np.datetime64("2020-01-01T00:00")
        self._times = t0 + np.timedelta64(1, "h") * np.arange(
            len(self._values)
        )

    @property
    def root_path(self):
        return Path("/nonexistent")

    @property
    def config(self):
        return {}

    @property
    def step_length(self):
        return timedelta(hours=1)

    def get_vars_units(self, category):
        return ["unit"]

    def get_vars_names(self, category):
        return [f"{category}_var"]

    def get_vars_long_names(self, category):
        return [f"{category} var"]

    def get_num_data_vars(self, category):
        if category == "forcing":
            return 0 if self._forcing is None else 1
        return 1

    def get_standardization_dataarray(self, category):
        return {
            f"{category}_mean": np.zeros(1, np.float32),
            f"{category}_std": np.ones(1, np.float32),
            "state_diff_mean_standardized": np.zeros(1, np.float32),
            "state_diff_std_standardized": np.ones(1, np.float32),
        }

    def get_dataarray(self, category, split, standardize=False):
        if category == "state":
            vals = self._values
        elif category == "forcing":
            if self._forcing is None:
                return None
            vals = self._forcing
        else:
            return None
        return FieldArray(
            data=vals.reshape(-1, 1, 1),
            dims=("time", "grid_index", f"{category}_feature"),
            coords={
                "time": self._times[: len(vals)],
                "grid_index": np.arange(1),
                f"{category}_feature": np.array([f"{category}_var"]),
            },
        )

    @property
    def boundary_mask(self):
        return FieldArray(
            data=np.zeros(1, np.float32),
            dims=("grid_index",),
            coords={"grid_index": np.arange(1)},
        )

    def get_xy(self, category, stacked):
        return np.zeros((1, 2))

    @property
    def num_grid_points(self):
        return 1


VALUES = np.arange(10)

# (ar_steps, num_past, num_future) -> expected (init, targets) values for
# sample idx 0, matching reference test_time_slicing.py expectations.
CASES = {
    (3, 0, 0): ([0, 1], [2, 3, 4]),
    (3, 1, 0): ([0, 1], [2, 3, 4]),
    (3, 2, 0): ([0, 1], [2, 3, 4]),
    (3, 3, 0): ([1, 2], [3, 4, 5]),
    (3, 0, 1): ([0, 1], [2, 3, 4]),
    (3, 0, 2): ([0, 1], [2, 3, 4]),
    (1, 2, 2): ([0, 1], [2]),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_init_and_target_window(case):
    ar_steps, past, future = case
    ds = SinglePointDatastore(VALUES, forcing_values=VALUES)
    dataset = WeatherDataset(
        ds,
        split="train",
        ar_steps=ar_steps,
        num_past_forcing_steps=past,
        num_future_forcing_steps=future,
    )
    init_states, target_states, forcing, target_times = dataset[0]
    want_init, want_target = CASES[case]
    np.testing.assert_array_equal(init_states.flatten(), want_init)
    np.testing.assert_array_equal(target_states.flatten(), want_target)
    assert forcing.shape == (ar_steps, 1, past + future + 1)


def test_dataset_length_formula():
    # analysis: T - (max(2, past) + ar + future) + 1
    for ar_steps in (1, 3):
        for past in (0, 1, 3):
            for future in (0, 2):
                window = max(2, past) + ar_steps + future
                want = len(VALUES) - window + 1
                ds = SinglePointDatastore(VALUES, forcing_values=VALUES)
                dataset = WeatherDataset(
                    ds,
                    ar_steps=ar_steps,
                    num_past_forcing_steps=past,
                    num_future_forcing_steps=future,
                )
                assert len(dataset) == want, (ar_steps, past, future)


def test_forcing_window_values():
    # For idx 0 with past=1, future=1, ar=2: targets are values [2, 3];
    # windows around target t are [t-1, t, t+1].
    ds = SinglePointDatastore(VALUES, forcing_values=VALUES)
    dataset = WeatherDataset(
        ds, ar_steps=2, num_past_forcing_steps=1, num_future_forcing_steps=1
    )
    _, targets, forcing, _ = dataset[0]
    np.testing.assert_array_equal(targets.flatten(), [2, 3])
    np.testing.assert_array_equal(forcing[0, 0], [1, 2, 3])
    np.testing.assert_array_equal(forcing[1, 0], [2, 3, 4])


def test_index_error_and_negative_index():
    ds = SinglePointDatastore(VALUES, forcing_values=VALUES)
    dataset = WeatherDataset(ds, ar_steps=3)
    n = len(dataset)
    with pytest.raises(IndexError):
        dataset[n]
    init_last, *_ = dataset[-1]
    init_same, *_ = dataset[n - 1]
    np.testing.assert_array_equal(init_last, init_same)


def test_too_few_timesteps_raises():
    ds = SinglePointDatastore(np.arange(4), forcing_values=np.arange(4))
    with pytest.raises(ValueError):
        WeatherDataset(ds, ar_steps=5)


class SinglePointForecastDatastore(BaseDatastore):
    """Forecast-mode single point: value = analysis_idx*100 + step.

    Lets forecast-window arithmetic be asserted exactly, like the
    reference's EnsembleDummyDatastore value-encoding trick
    (reference: tests/dummy_datastore.py:483-768).
    """

    is_forecast = True

    def __init__(self, n_analysis=3, n_steps=8, with_forcing=True):
        self.n_analysis = n_analysis
        self.n_steps = n_steps
        self.with_forcing = with_forcing
        t0 = np.datetime64("2020-01-01T00:00")
        self._analysis_times = t0 + np.timedelta64(6, "h") * np.arange(
            n_analysis
        )
        self._elapsed = np.timedelta64(1, "h") * np.arange(n_steps)

    root_path = Path("/nonexistent")
    config = {}

    @property
    def step_length(self):
        return timedelta(hours=1)

    def get_vars_units(self, category):
        return ["unit"]

    def get_vars_names(self, category):
        return [f"{category}_var"]

    def get_vars_long_names(self, category):
        return [f"{category} var"]

    def get_num_data_vars(self, category):
        if category == "forcing":
            return 1 if self.with_forcing else 0
        return 1

    def get_standardization_dataarray(self, category):
        return {
            f"{category}_mean": np.zeros(1, np.float32),
            f"{category}_std": np.ones(1, np.float32),
            "state_diff_mean_standardized": np.zeros(1, np.float32),
            "state_diff_std_standardized": np.ones(1, np.float32),
        }

    def get_dataarray(self, category, split, standardize=False):
        if category == "static":
            return None
        if category == "forcing" and not self.with_forcing:
            return None
        a = np.arange(self.n_analysis)[:, None]
        s = np.arange(self.n_steps)[None, :]
        vals = (a * 100 + s).astype(np.float32)
        if category == "forcing":
            vals = vals + 0.5  # distinguishable from state
        return FieldArray(
            data=vals.reshape(self.n_analysis, self.n_steps, 1, 1),
            dims=(
                "analysis_time",
                "elapsed_forecast_duration",
                "grid_index",
                f"{category}_feature",
            ),
            coords={
                "analysis_time": self._analysis_times,
                "elapsed_forecast_duration": self._elapsed.astype(
                    "timedelta64[ns]"
                ),
                "grid_index": np.arange(1),
                f"{category}_feature": np.array([f"{category}_var"]),
            },
        )

    @property
    def boundary_mask(self):
        return FieldArray(
            data=np.zeros(1, np.float32),
            dims=("grid_index",),
            coords={"grid_index": np.arange(1)},
        )

    def get_xy(self, category, stacked):
        return np.zeros((1, 2))

    num_grid_points = 1


def test_forecast_mode_windows():
    """One sample per analysis time; init = steps [0,1], targets follow
    (reference: weather_dataset.py:201-264 forecast branch)."""
    ds = SinglePointForecastDatastore(n_analysis=3, n_steps=8)
    dataset = WeatherDataset(
        ds, ar_steps=3, num_past_forcing_steps=1,
        num_future_forcing_steps=1,
    )
    assert len(dataset) == 3
    init, target, forcing, times = dataset[1]
    np.testing.assert_allclose(init.reshape(-1), [100, 101])
    np.testing.assert_allclose(target.reshape(-1), [102, 103, 104])
    # forcing windows [t-1, t, t+1] per target step, feature-major
    np.testing.assert_allclose(
        forcing.reshape(3, 3),
        np.array(
            [[101.5, 102.5, 103.5],
             [102.5, 103.5, 104.5],
             [103.5, 104.5, 105.5]]
        ),
    )


def test_forecast_mode_large_past_offset():
    """num_past > 2 shifts the usable window start
    (reference: weather_dataset.py:222-236)."""
    ds = SinglePointForecastDatastore(n_analysis=2, n_steps=8)
    dataset = WeatherDataset(
        ds, ar_steps=2, num_past_forcing_steps=3,
        num_future_forcing_steps=0,
    )
    init, target, forcing, _ = dataset[0]
    # init states start at step max(0, past-2) = 1
    np.testing.assert_allclose(init.reshape(-1), [1, 2])
    np.testing.assert_allclose(target.reshape(-1), [3, 4])
    # forcing window [t-3..t] for each target step
    np.testing.assert_allclose(
        forcing.reshape(2, 4),
        np.array([[0.5, 1.5, 2.5, 3.5], [1.5, 2.5, 3.5, 4.5]]),
    )


def test_forecast_mode_too_few_steps_raises():
    ds = SinglePointForecastDatastore(n_analysis=2, n_steps=4)
    with pytest.raises(ValueError):
        WeatherDataset(
            ds, ar_steps=3, num_past_forcing_steps=1,
            num_future_forcing_steps=1,
        )
