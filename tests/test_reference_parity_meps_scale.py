"""Reference parity at MEPS-scale shapes (268x238 grid).

VERDICT r3 #4: the toy-size parity suites (27x27 / 45x45) never
exercise the code paths that only trigger at real sizes — banded
visit-table construction over the 63,784-row grid sender space, stripe
decomposition, and padded residency with many receiver blocks per
level. This module builds the full 268x238 multiscale graph (the exact
graph ``bench.py`` runs), transplants live-reference torch weights,
and asserts one-step + 3-step rollout parity through the REAL kernel
path (Pallas interpret mode runs the same blocked/banded kernel logic
the TPU executes; reference forward contract:
models/step_predictors/graph/base.py:228-344).

Slow-marked: the graph build is ~3 min of host KDTree work and each
interpret-mode forward is ~5 s on CPU.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
from reference_harness import (  # noqa: E402
    RefDatastoreAdapter,
    load_reference_module,
    write_reference_graph_dir,
)

from neural_lam_tpu.convert_checkpoint import convert_state_dict  # noqa: E402
from neural_lam_tpu.datastore.dummy import DummyDatastore  # noqa: E402
from neural_lam_tpu.graphs import create_graph_from_datastore  # noqa: E402
from neural_lam_tpu.models import ARForecaster, GraphLAM  # noqa: E402

REF_GRAPH_LAM = load_reference_module(
    "models.step_predictors.graph.graph_lam"
).GraphLAM
REF_AR = load_reference_module(
    "models.forecasters.autoregressive"
).ARForecaster

pytestmark = pytest.mark.slow

GRID_X, GRID_Y = 268, 238  # bench.py's MEPS-size configuration


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("meps_scale_ds")
    ds = DummyDatastore(
        n_grid_x=GRID_X, n_grid_y=GRID_Y, n_timesteps=8, root_path=root
    )
    our_dir = ds.root_path / "graph" / "multiscale"
    create_graph_from_datastore(ds, our_dir, hierarchical=False)
    write_reference_graph_dir(
        our_dir, ds.root_path / "refgraphs" / "graph" / "multiscale"
    )
    adapter = RefDatastoreAdapter(ds, ds.root_path / "refgraphs")

    torch.manual_seed(0)
    ref_model = REF_GRAPH_LAM(
        adapter, graph_name="multiscale", hidden_dim=8,
        processor_layers=2,
    ).float()
    our_model = GraphLAM(
        ds, graph_name="multiscale", hidden_dim=8, processor_layers=2
    )
    sd = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }
    template = our_model.init_params(jax.random.PRNGKey(0))
    params = convert_state_dict(sd, template)
    return ds, ref_model, our_model, params


def test_meps_scale_layouts_are_nontrivial(setup):
    """The size-dependent machinery under test must actually be armed:
    banded visit tables over the grid-sized sender space and multiple
    receiver blocks per edge set (at toy sizes these collapse to one
    window / one block, which is what this module exists to avoid)."""
    ds, _, our_model, _ = setup
    g = our_model.graph
    assert ds.num_grid_points == GRID_X * GRID_Y == 63784
    for name, pe in (("g2m", g.g2m), ("m2g", g.m2g), ("m2m0", g.m2m[0])):
        es = pe.edges
        assert es.banded is not None, f"{name}: no banded tables"
        assert es.layout.num_blocks > 1, f"{name}: single receiver block"
        # multi-window sender space -> chunks straddle windows, so the
        # visit count strictly exceeds the chunk count somewhere
        assert int(es.banded.gvisit_chunk.shape[0]) >= int(
            es.banded.n_chunks
        ), name
    g2m = g.g2m.edges
    assert g2m.banded.num_send == 63784  # the grid-sized sender space


@pytest.mark.parametrize("pallas", ["interpret", "off"])
def test_meps_scale_one_step_matches_reference(setup, pallas, monkeypatch):
    """One predictor step at bench shapes: reference torch forward vs
    ours with transplanted weights, through the kernel path (interpret)
    and the segment-sum fallback."""
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", pallas)
    ds, ref_model, our_model, params = setup
    n = ds.num_grid_points
    rng = np.random.default_rng(1)
    prev = rng.normal(size=(1, n, 3)).astype(np.float32)
    prev_prev = rng.normal(size=(1, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(1, n, 6)).astype(np.float32)

    with torch.no_grad():
        want, _ = ref_model(
            torch.tensor(prev), torch.tensor(prev_prev),
            torch.tensor(forcing),
        )
    got, _ = jax.vmap(
        lambda a, b, c: our_model.step(params, a, b, c)
    )(jnp.asarray(prev), jnp.asarray(prev_prev), jnp.asarray(forcing))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4
    )


def test_meps_scale_3_step_rollout_matches_reference(setup, monkeypatch):
    """3-step AR rollout at bench shapes through the fused kernel path
    (node-major batched layout, boundary blending included)."""
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    ds, ref_model, our_model, params = setup
    ref_fc = REF_AR(ref_model, RefDatastoreAdapter(
        ds, ds.root_path / "refgraphs"
    )).float()
    our_fc = ARForecaster(our_model, ds)

    n = ds.num_grid_points
    T, B = 3, 1
    rng = np.random.default_rng(2)
    init = rng.normal(size=(B, 2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(B, T, n, 6)).astype(np.float32)
    boundary = rng.normal(size=(B, T, n, 3)).astype(np.float32)

    with torch.no_grad():
        want, _ = ref_fc(
            torch.tensor(init), torch.tensor(forcing),
            torch.tensor(boundary),
        )
    got, _ = our_fc.forward(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )
    got, want = np.asarray(got), want.numpy()
    assert got.shape == want.shape == (B, T, n, 3)
    for t in range(T):
        np.testing.assert_allclose(
            got[:, t], want[:, t], rtol=1e-3, atol=1e-3,
            err_msg=f"rollout diverged at step {t + 1}",
        )
