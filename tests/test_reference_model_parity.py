"""Full-model golden parity: the reference models executing live.

The north-star check (BASELINE.md): build the REFERENCE GraphLAM /
HiLAM / HiLAMParallel + ARForecaster from /root/reference (via
tests/reference_harness), transplant their torch weights into our
parameter pytrees through ``convert_checkpoint.convert_state_dict``,
and assert allclose predictions — including a full 19-step
autoregressive rollout — between the reference forward and ours on the
same graph and inputs. This simultaneously validates the checkpoint
converter's key mapping against the real reference module tree.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_harness import (  # noqa: E402
    RefDatastoreAdapter,
    load_reference_module,
    write_reference_graph_dir,
)

from neural_lam_tpu.convert_checkpoint import convert_state_dict  # noqa: E402
from neural_lam_tpu.datastore.dummy import DummyDatastore  # noqa: E402
from neural_lam_tpu.graphs import create_graph_from_datastore  # noqa: E402
from neural_lam_tpu.models import (  # noqa: E402
    ARForecaster,
    GraphLAM,
    HiLAM,
    HiLAMParallel,
)

REF_GRAPH_LAM = load_reference_module(
    "models.step_predictors.graph.graph_lam"
).GraphLAM
REF_HI_LAM = load_reference_module(
    "models.step_predictors.graph.hi_lam"
).HiLAM
REF_HI_LAM_PARALLEL = load_reference_module(
    "models.step_predictors.graph.hi_lam_parallel"
).HiLAMParallel
REF_AR = load_reference_module(
    "models.forecasters.autoregressive"
).ARForecaster

OURS = {
    "graph_lam": (GraphLAM, REF_GRAPH_LAM, "multiscale"),
    "hi_lam": (HiLAM, REF_HI_LAM, "hierarchical"),
    "hi_lam_parallel": (HiLAMParallel, REF_HI_LAM_PARALLEL,
                        "hierarchical"),
}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("refparity_ds")
    ds = DummyDatastore(
        n_grid_x=27, n_grid_y=27, n_timesteps=30, root_path=root
    )
    for name, hier in (("multiscale", False), ("hierarchical", True)):
        our_dir = ds.root_path / "graph" / name
        create_graph_from_datastore(ds, our_dir, hierarchical=hier)
        write_reference_graph_dir(
            our_dir, ds.root_path / "refgraphs" / "graph" / name
        )
    adapter = RefDatastoreAdapter(ds, ds.root_path / "refgraphs")
    return ds, adapter


def _build_pair(ds, adapter, model_name, **kw):
    our_cls, ref_cls, graph_name = OURS[model_name]
    torch.manual_seed(0)
    ref_model = ref_cls(
        adapter, graph_name=graph_name, hidden_dim=8,
        processor_layers=2, **kw,
    ).float()
    our_model = our_cls(
        ds, graph_name=graph_name, hidden_dim=8, processor_layers=2,
        **kw,
    )
    sd = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }
    template = our_model.init_params(jax.random.PRNGKey(0))
    params = convert_state_dict(sd, template)
    return ref_model, our_model, params


@pytest.mark.parametrize(
    "model_name,kw",
    [
        ("graph_lam", {}),
        ("graph_lam", {"output_std": True}),
        ("graph_lam", {"g2m_gnn_type": "PropagationNet",
                       "m2g_gnn_type": "PropagationNet"}),
        ("hi_lam", {}),
        ("hi_lam", {"mesh_up_gnn_type": "PropagationNet",
                    "mesh_down_gnn_type": "PropagationNet"}),
        ("hi_lam_parallel", {}),
    ],
)
def test_one_step_matches_reference(setup, model_name, kw):
    """Single predictor step: reference torch forward vs ours with
    transplanted weights."""
    ds, adapter = setup
    ref_model, our_model, params = _build_pair(
        ds, adapter, model_name, **kw
    )
    n = ds.num_grid_points
    rng = np.random.default_rng(1)
    prev = rng.normal(size=(2, n, 3)).astype(np.float32)
    prev_prev = rng.normal(size=(2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(2, n, 6)).astype(np.float32)

    with torch.no_grad():
        want, want_std = ref_model(
            torch.tensor(prev), torch.tensor(prev_prev),
            torch.tensor(forcing),
        )
    import jax.numpy as jnp

    got, got_std = jax.vmap(
        lambda a, b, c: our_model.step(params, a, b, c)
    )(jnp.asarray(prev), jnp.asarray(prev_prev), jnp.asarray(forcing))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4
    )
    if kw.get("output_std"):
        np.testing.assert_allclose(
            np.asarray(got_std), want_std.numpy(), rtol=1e-4, atol=1e-4
        )


def test_19_step_rollout_matches_reference(setup):
    """The north star (BASELINE.md): allclose 19-step AR rollout with
    transplanted weights, boundary forcing included."""
    ds, adapter = setup
    ref_model, our_model, params = _build_pair(ds, adapter, "graph_lam")
    ref_fc = REF_AR(ref_model, adapter).float()
    our_fc = ARForecaster(our_model, ds)

    n = ds.num_grid_points
    T, B = 19, 1
    rng = np.random.default_rng(2)
    init = rng.normal(size=(B, 2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(B, T, n, 6)).astype(np.float32)
    boundary = rng.normal(size=(B, T, n, 3)).astype(np.float32)

    with torch.no_grad():
        want, _ = ref_fc(
            torch.tensor(init), torch.tensor(forcing),
            torch.tensor(boundary),
        )
    import jax.numpy as jnp

    got, _ = our_fc.forward(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )
    got = np.asarray(got)
    want = want.numpy()
    assert got.shape == want.shape == (B, T, n, 3)
    # error may compound across the rollout; assert per-step
    for t in range(T):
        np.testing.assert_allclose(
            got[:, t], want[:, t], rtol=2e-3, atol=2e-3,
            err_msg=f"rollout diverged at step {t + 1}",
        )


def test_rollout_matches_reference_hierarchical(setup):
    """Multi-step rollout parity for the hierarchical family too."""
    ds, adapter = setup
    for name in ("hi_lam", "hi_lam_parallel"):
        ref_model, our_model, params = _build_pair(ds, adapter, name)
        ref_fc = REF_AR(ref_model, adapter).float()
        our_fc = ARForecaster(our_model, ds)
        n = ds.num_grid_points
        T = 4
        rng = np.random.default_rng(3)
        init = rng.normal(size=(1, 2, n, 3)).astype(np.float32)
        forcing = rng.normal(size=(1, T, n, 6)).astype(np.float32)
        boundary = rng.normal(size=(1, T, n, 3)).astype(np.float32)
        with torch.no_grad():
            want, _ = ref_fc(
                torch.tensor(init), torch.tensor(forcing),
                torch.tensor(boundary),
            )
        import jax.numpy as jnp

        got, _ = our_fc.forward(
            params, jnp.asarray(init), jnp.asarray(forcing),
            jnp.asarray(boundary),
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-3,
            err_msg=name,
        )


def test_trained_ckpt_19_step_rollout_parity(setup, tmp_path):
    """VERDICT r2 #6: train the live reference model a few hundred torch
    AdamW steps, save a genuine Lightning-format ``.ckpt``, convert it
    through the converter CLI, and assert 19-step rollout parity on the
    TRAINED (non-random) weights — trained scales expose LN-statistic
    and residual-magnitude numerics that random init does not."""
    import yaml

    ds, adapter = setup
    ref_model, our_model, _ = _build_pair(ds, adapter, "graph_lam")

    # Short training run on a learnable AR relation so the weights move
    # to realistic magnitudes (loss must actually decrease).
    opt = torch.optim.AdamW(
        ref_model.parameters(), lr=1e-3, betas=(0.9, 0.95)
    )
    n = ds.num_grid_points
    rng = np.random.default_rng(11)
    losses = []
    for _ in range(200):
        prev_prev = torch.tensor(
            rng.normal(size=(2, n, 3)).astype(np.float32)
        )
        forcing = torch.tensor(
            rng.normal(size=(2, n, 6)).astype(np.float32)
        )
        prev = 0.8 * prev_prev + 0.1
        target = (
            0.9 * prev
            + 0.1 * prev_prev
            + 0.05 * forcing[..., :3]
        )
        pred, _ = ref_model(prev, prev_prev, forcing)
        loss = torch.mean((pred - target) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    # Genuine Lightning-format checkpoint file with the trained weights
    sd = {
        "forecaster.predictor." + k: v
        for k, v in ref_model.state_dict().items()
    }
    ckpt_path = tmp_path / "trained.ckpt"
    torch.save(
        {"state_dict": sd, "hyper_parameters": {"args": {}}}, ckpt_path
    )

    # Converter CLI needs a config tree rooted at the graph/datastore
    root = ds.root_path
    if not (root / "config.yaml").exists():
        (root / "dummy.datastore.yaml").write_text(
            yaml.safe_dump(
                {"n_grid_x": 27, "n_grid_y": 27, "n_timesteps": 30}
            ),
            encoding="utf-8",
        )
        (root / "config.yaml").write_text(
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

    from neural_lam_tpu import convert_checkpoint
    from neural_lam_tpu.checkpoint import load_forecaster_from_checkpoint

    out_dir = tmp_path / "converted"
    convert_checkpoint.main([
        "--ckpt", str(ckpt_path),
        "--config_path", str(root / "config.yaml"),
        "--model", "graph_lam",
        "--graph", "multiscale",
        "--hidden_dim", "8",
        "--processor_layers", "2",
        "--out", str(out_dir),
    ])
    our_fc, params, _ = load_forecaster_from_checkpoint(out_dir, ds)

    # 19-step rollout on the trained weights, reference vs ours
    ref_fc = REF_AR(ref_model, adapter).float()
    T, B = 19, 1
    rng = np.random.default_rng(17)
    init = rng.normal(size=(B, 2, n, 3)).astype(np.float32)
    forcing = rng.normal(size=(B, T, n, 6)).astype(np.float32)
    boundary = rng.normal(size=(B, T, n, 3)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref_fc(
            torch.tensor(init), torch.tensor(forcing),
            torch.tensor(boundary),
        )
    import jax.numpy as jnp

    got, _ = our_fc.forward(
        params, jnp.asarray(init), jnp.asarray(forcing),
        jnp.asarray(boundary),
    )
    got, want = np.asarray(got), want.numpy()
    for t in range(T):
        np.testing.assert_allclose(
            got[:, t], want[:, t], rtol=2e-3, atol=2e-3,
            err_msg=f"trained rollout diverged at step {t + 1}",
        )
