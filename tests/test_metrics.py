"""Metric behaviour specs.

Mirrors the reference's probabilistic-objective tests
(reference: tests/test_probabilistic_objectives.py:15-112): weighted
metrics reward variance inflation, nll/crps prefer calibrated std,
pred_std broadcasting, and mask/reduction semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.metrics import (
    DEFINED_METRICS,
    crps_gauss,
    get_metric,
    mae,
    mask_and_reduce_metric,
    mse,
    nll,
    wmae,
    wmse,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    target = pred + 0.5 * jnp.asarray(
        rng.normal(size=(2, 10, 3)).astype(np.float32)
    )
    return pred, target


def test_registry_and_lookup():
    assert set(DEFINED_METRICS) == {
        "mse", "mae", "wmse", "wmae", "nll", "crps_gauss",
    }
    assert get_metric("WMSE") is wmse
    # ValueError (not assert): survives python -O and matches
    # get_metric_entry's error contract
    with pytest.raises(ValueError, match="bogus"):
        get_metric("bogus")


def test_wmse_rewards_variance_inflation(data):
    """Larger pred_std lowers wmse on mispredicted entries
    (reference: test_probabilistic_objectives.py:15-50)."""
    pred, target = data
    small = jnp.full_like(pred, 0.5)
    large = jnp.full_like(pred, 2.0)
    assert float(jnp.mean(wmse(pred, target, large))) < float(
        jnp.mean(wmse(pred, target, small))
    )
    assert float(jnp.mean(wmae(pred, target, large))) < float(
        jnp.mean(wmae(pred, target, small))
    )


def test_mse_mae_ignore_pred_std(data):
    pred, target = data
    a = mse(pred, target, jnp.full_like(pred, 0.1))
    b = mse(pred, target, jnp.full_like(pred, 10.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    a = mae(pred, target, jnp.full_like(pred, 0.1))
    b = mae(pred, target, jnp.full_like(pred, 10.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("metric", [nll, crps_gauss])
def test_calibrated_std_preferred(metric, data):
    """nll/crps are minimised near the true error scale, not at
    extremes (reference: test_probabilistic_objectives.py:52-112)."""
    pred, target = data
    true_scale = float(jnp.std(target - pred))
    losses = {
        s: float(jnp.mean(metric(pred, target, jnp.full_like(pred, s))))
        for s in (0.05 * true_scale, true_scale, 20 * true_scale)
    }
    vals = list(losses.values())
    assert vals[1] < vals[0] and vals[1] < vals[2], losses


def test_pred_std_broadcasting(data):
    """(num_vars,) pred_std broadcasts like a full-shape array."""
    pred, target = data
    per_var = jnp.asarray([0.5, 1.0, 2.0])
    full = jnp.broadcast_to(per_var, pred.shape)
    for metric in (wmse, wmae, nll, crps_gauss):
        np.testing.assert_allclose(
            np.asarray(metric(pred, target, per_var)),
            np.asarray(metric(pred, target, full)),
            rtol=1e-5,
        )


def test_mask_and_reduce_shapes(data):
    pred, target = data
    entry = (pred - target) ** 2
    mask = np.zeros(10, dtype=bool)
    mask[:4] = True
    # all four reduction combinations
    full = mask_and_reduce_metric(entry, mask, True, True)
    assert full.shape == (2,)
    per_var = mask_and_reduce_metric(entry, mask, True, False)
    assert per_var.shape == (2, 3)
    per_node = mask_and_reduce_metric(entry, mask, False, True)
    assert per_node.shape == (2, 4)
    raw = mask_and_reduce_metric(entry, mask, False, False)
    assert raw.shape == (2, 4, 3)
    # masked mean == manual mean over selected nodes
    np.testing.assert_allclose(
        np.asarray(per_var),
        np.asarray(entry[:, :4, :].mean(axis=1)),
        rtol=1e-6,
    )


def test_nll_closed_form():
    """nll equals the Gaussian -log pdf."""
    pred = jnp.zeros((1, 1, 1))
    target = jnp.full((1, 1, 1), 1.5)
    std = jnp.full((1, 1, 1), 2.0)
    got = float(jnp.sum(nll(pred, target, std)))
    want = 0.5 * np.log(2 * np.pi * 4.0) + 1.5**2 / (2 * 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_crps_perfect_forecast_limit():
    """CRPS of a sharp, correct forecast approaches zero."""
    pred = jnp.zeros((1, 1, 1))
    target = jnp.zeros((1, 1, 1))
    sharp = float(jnp.sum(crps_gauss(pred, target, jnp.full((1, 1, 1), 1e-3))))
    broad = float(jnp.sum(crps_gauss(pred, target, jnp.full((1, 1, 1), 1.0))))
    assert abs(sharp) < 1e-3
    assert broad > sharp


def test_masked_nan_targets_do_not_poison_gradients():
    """NaN targets at masked-OUT nodes (NaN-filled exterior is common
    in LAM datastores) must not reach parameter gradients: the
    select-sum keeps the VALUE clean, but without input sanitization
    the cotangent would be 0 * NaN = NaN (the single-where trap)."""
    import jax
    import jax.numpy as jnp

    n, d = 6, 3
    rng = np.random.default_rng(0)
    target = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.array([True, True, False, True, False, True])
    target[~mask] = np.nan
    std = np.full((n, d), 1.5, np.float32)
    std[~mask] = np.nan

    for name in sorted(DEFINED_METRICS):
        fn = get_metric(name)

        def loss(pred):
            return jnp.mean(
                fn(pred, jnp.asarray(target), jnp.asarray(std), mask=mask)
            )

        pred0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        val = loss(pred0)
        grad = jax.grad(loss)(pred0)
        assert np.isfinite(float(val)), name
        assert np.isfinite(np.asarray(grad)).all(), (
            f"{name}: NaN gradient leaked through the mask"
        )
