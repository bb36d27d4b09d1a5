"""FieldArray / LazyTimeSeries indexing semantics and CF time decoding.

Regression tests from the third review batch: FieldArray.isel must use
xarray-style outer indexing (not numpy pointwise broadcasting),
LazyTimeSeries must honour boolean masks, and the minizarr CF time
decoder must keep fractional offsets and decode NaN fills to NaT.
"""

import numpy as np
import pytest

from neural_lam_tpu.utils.labeled import FieldArray
from neural_lam_tpu.utils.lazy import LazyTimeSeries
from neural_lam_tpu.utils.minizarr import _decode_cf_time


def _fa():
    data = np.arange(4 * 5 * 6, dtype=np.float32).reshape(4, 5, 6)
    return FieldArray(
        data=data,
        dims=("analysis_time", "grid_index", "state_feature"),
        coords={
            "analysis_time": np.arange(4),
            "grid_index": np.arange(5),
            "state_feature": np.arange(6),
        },
        name="state",
    )


def test_isel_outer_indexing_two_arrays():
    """Two array indexers select the cross product, like xarray."""
    da = _fa()
    out = da.isel(analysis_time=[0, 2], grid_index=[1, 3, 4])
    assert out.dims == ("analysis_time", "grid_index", "state_feature")
    assert out.data.shape == (2, 3, 6)
    np.testing.assert_array_equal(
        out.data, da.data[np.ix_([0, 2], [1, 3, 4])]
    )
    np.testing.assert_array_equal(out.coords["grid_index"], [1, 3, 4])


def test_isel_outer_indexing_with_int_and_slice():
    da = _fa()
    out = da.isel(
        analysis_time=[1, 3], grid_index=2, state_feature=[0, 5]
    )
    assert out.dims == ("analysis_time", "state_feature")
    assert out.data.shape == (2, 2)
    np.testing.assert_array_equal(
        out.data, da.data[[1, 3]][:, 2][:, [0, 5]]
    )


def test_isel_single_array_unchanged():
    da = _fa()
    out = da.isel(grid_index=np.array([4, 0]))
    np.testing.assert_array_equal(out.data, da.data[:, [4, 0], :])


def test_isel_boolean_mask():
    da = _fa()
    mask = np.array([True, False, True, False])
    out = da.isel(analysis_time=mask, grid_index=[0, 1])
    assert out.data.shape == (2, 2, 6)
    np.testing.assert_array_equal(
        out.data, da.data[np.ix_([0, 2], [0, 1])]
    )


def test_lazy_time_series_boolean_mask():
    items = [np.full((3,), i, dtype=np.float32) for i in range(4)]
    series = LazyTimeSeries(
        loader=lambda i: items[i],
        num_items=4,
        item_shape=(3,),
        dtype=np.float32,
    )
    mask = np.array([False, True, True, False])
    out = np.asarray(series[mask])
    assert out.shape == (2, 3)
    np.testing.assert_array_equal(out[:, 0], [1.0, 2.0])


def test_lazy_time_series_boolean_mask_wrong_length():
    series = LazyTimeSeries(
        loader=lambda i: np.zeros(3, np.float32),
        num_items=4,
        item_shape=(3,),
        dtype=np.float32,
    )
    with pytest.raises(IndexError):
        series[np.array([True, False])]


def test_cf_time_fractional_float_offsets():
    out = _decode_cf_time(
        np.array([0.0, 0.5, 1.0]), "days since 1990-01-01"
    )
    assert out.dtype == np.dtype("datetime64[ns]")
    assert out[1] - out[0] == np.timedelta64(12, "h")
    assert out[2] == np.datetime64("1990-01-02", "ns")


def test_cf_time_nan_decodes_to_nat():
    out = _decode_cf_time(
        np.array([0.0, np.nan, 2.0]), "hours since 2000-06-01 06:00:00"
    )
    assert np.isnat(out[1])
    assert out[0] == np.datetime64("2000-06-01T06:00:00", "ns")
    assert out[2] == np.datetime64("2000-06-01T08:00:00", "ns")


def test_cf_time_integer_path_unchanged():
    out = _decode_cf_time(
        np.array([0, 3], dtype=np.int64), "hours since 2000-01-01"
    )
    assert out[1] == np.datetime64("2000-01-01T03:00:00", "ns")


def test_cf_time_large_fractional_offsets_exact():
    # whole/frac split keeps ns exactness for large day offsets
    out = _decode_cf_time(
        np.array([36524.25]), "days since 1900-01-01"
    )
    want = np.datetime64("2000-01-01T06:00:00", "ns")
    assert out[0] == want
