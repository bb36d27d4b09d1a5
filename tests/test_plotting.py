"""Vis/plotting smoke + artifact tests (cartopy-free environment).

Covers the artifact set of the reference test phase
(reference: tests/test_plotting.py, neural_lam/models/module.py:770-962).
"""

import numpy as np
import pytest

from neural_lam_tpu import vis
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.datastore.plot_example import plot_example_from_datastore
from neural_lam_tpu.graphs import create_graph_from_datastore
from neural_lam_tpu.plot_graph import plot_graph


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    return DummyDatastore(
        n_grid_x=12, n_grid_y=12,
        root_path=tmp_path_factory.mktemp("plot_ds"),
    )


def test_plot_prediction(ds):
    rng = np.random.default_rng(0)
    n = ds.num_grid_points
    fig = vis.plot_prediction(
        rng.normal(size=n), rng.normal(size=n), ds, title="t2m"
    )
    assert len(fig.axes) >= 2
    vis.plt.close(fig)


def test_plot_spatial_error_and_heatmap(ds, tmp_path):
    rng = np.random.default_rng(1)
    fig = vis.plot_spatial_error(
        rng.uniform(size=ds.num_grid_points), ds, title="err"
    )
    vis.plt.close(fig)

    errors = rng.uniform(1, 2, size=(5, ds.get_num_data_vars("state")))
    fig = vis.plot_error_heatmap(errors, ds, title="rmse")
    vis.plt.close(fig)

    csv = tmp_path / "m.csv"
    vis.save_metrics_csv(errors, ds, csv)
    lines = csv.read_text().splitlines()
    assert len(lines) == 6
    assert lines[0].startswith("lead_time_h,")
    # lead times use the datastore step length (3h)
    assert lines[1].split(",")[0] == "3"


def test_plot_example_from_datastore(ds):
    fig = plot_example_from_datastore("state", ds, n_examples=2)
    vis.plt.close(fig)


@pytest.mark.parametrize("hierarchical", [False, True])
def test_plot_graph(tmp_path, hierarchical):
    ds = DummyDatastore(n_grid_x=30, n_grid_y=30, root_path=tmp_path)
    name = "hier" if hierarchical else "flat"
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / name, hierarchical=hierarchical
    )
    fig = plot_graph(ds, name, show_grid_edges=True)
    fig.savefig(tmp_path / "graph.png", dpi=50)
    assert (tmp_path / "graph.png").exists()
    vis.plt.close(fig)


def test_grid_values_respects_datastore_stacking(ds):
    """_grid_values must delegate to the datastore's unstack rule so
    y-major stores (reference: MDP auto-detected stacking) plot
    correctly rather than scrambling node order."""

    class YMajor(type(ds)):
        # a store whose grid_index runs y-fastest
        def unstack_grid_coords(self, field_grid):
            shape = self.grid_shape_state
            lead = field_grid.shape[:-1]
            out = field_grid.reshape(lead + (shape.y, shape.x))
            return np.swapaxes(out, -1, -2)

    ym = ds
    ym.__class__ = YMajor
    try:
        values = np.arange(ds.num_grid_points, dtype=np.float32)
        got = vis._grid_values(ym, values)
        shape = ds.grid_shape_state
        want = np.swapaxes(
            values.reshape(shape.y, shape.x), -1, -2
        )
        np.testing.assert_array_equal(got, want)
    finally:
        ym.__class__ = DummyDatastore


def test_error_heatmap_fractional_lead_times(ds, tmp_path):
    """Fractional step lengths must label lead times exactly, not
    int-truncated."""
    n_vars = len(ds.get_vars_names("state"))
    errors = np.random.default_rng(0).random((3, n_vars))

    fig = vis.plot_error_heatmap(
        errors, ds, title="t", step_length_hours=1.5
    )
    labels = [t.get_text() for t in fig.axes[0].get_xticklabels()]
    assert labels == ["1.5", "3", "4.5"]
    vis.plt.close(fig)


class _StubGeoAxes(vis.plt.Axes):
    """Minimal cartopy-GeoAxes stand-in: a real matplotlib Axes plus the
    ``coastlines`` method the projection branch calls. Lets the gated
    projection path (reference: vis.py:342-469) execute in an image
    without cartopy installed."""

    name = "stub_geo"
    coastlines_called = 0

    def coastlines(self, resolution=None):
        _StubGeoAxes.coastlines_called += 1


class _StubProjection:
    """Object accepted by ``fig.add_subplot(projection=...)`` via the
    matplotlib ``_as_mpl_axes`` protocol (what cartopy's CRS uses)."""

    def _as_mpl_axes(self):
        return _StubGeoAxes, {}


def test_projection_branch_with_stub_cartopy(ds):
    """The projection-aware plotting branch (projection axes +
    coastlines + boundary overlay + crop-to-interior) executes when the
    datastore reports a projection — smoke-tested with a cartopy-like
    stub since the image has no cartopy."""

    class ProjDS(type(ds)):
        @property
        def coords_projection(self):
            return _StubProjection()

    proj_ds = object.__new__(ProjDS)
    proj_ds.__dict__.update(ds.__dict__)
    assert proj_ds.coords_projection is not None

    _StubGeoAxes.coastlines_called = 0
    rng = np.random.default_rng(3)
    n = proj_ds.num_grid_points
    fig = vis.plot_prediction(
        rng.normal(size=n), rng.normal(size=n), proj_ds, title="t2m"
    )
    # both subplots took the projection path and drew coastlines
    assert _StubGeoAxes.coastlines_called == 2
    assert any(isinstance(ax, _StubGeoAxes) for ax in fig.axes)
    vis.plt.close(fig)

    fig2 = vis.plot_spatial_error(rng.normal(size=n), proj_ds, title="err")
    assert _StubGeoAxes.coastlines_called >= 3
    vis.plt.close(fig2)

    # crop-to-interior on a projection axis (reference: vis.py:403-428)
    fig3 = vis.plt.figure()
    ax, is_proj = vis._make_axis(fig3, proj_ds)
    assert is_proj
    vis.plot_on_axis(
        ax, rng.normal(size=n), proj_ds,
        boundary_alpha=0.4, crop_to_interior=True,
    )
    xs = proj_ds.get_xy("state", stacked=False)[..., 0]
    # cropped x-limits sit strictly inside the full grid extent
    assert ax.get_xlim()[0] > xs.min() - 1e-9
    assert ax.get_xlim()[1] < xs.max() + 1e-9
    vis.plt.close(fig3)
