"""Output clamping semantics (reference: tests/test_clamping.py).

Verifies the clamp-function algebra directly: inverse round-trips,
bounds respected for arbitrary deltas, linear behaviour far from
bounds, and the delta-domain update rule
``X_{t+1} = f(f^{-1}(X_t) + delta)``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.models.base import (
    get_clamped_new_state,
    prepare_clamping_params,
)
from neural_lam_tpu.utils.numerics import inverse_sigmoid, inverse_softplus


@pytest.fixture(scope="module")
def clamp():
    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_state_features=4)
    names = ds.get_vars_names("state")
    return prepare_clamping_params(
        ds,
        np.zeros(4, np.float32),
        np.ones(4, np.float32),
        # var0: both bounds (sigmoid); var1: lower only; var2: upper only
        {names[0]: -1.0, names[1]: 0.0},
        {names[0]: 1.0, names[2]: 5.0},
    )


def test_spec_construction(clamp):
    assert clamp.sigmoid_idx == (0,)
    assert clamp.softplus_lower_idx == (1,)
    assert clamp.softplus_upper_idx == (2,)
    assert clamp.any_clamping


def test_inverse_roundtrips():
    x = jnp.linspace(0.05, 15.0, 50)
    np.testing.assert_allclose(
        np.asarray(jnp.log1p(jnp.exp(inverse_softplus(x)))),
        np.asarray(x),
        rtol=1e-4,
        atol=1e-4,
    )
    p = jnp.linspace(0.01, 0.99, 50)
    np.testing.assert_allclose(
        np.asarray(1 / (1 + jnp.exp(-inverse_sigmoid(p)))),
        np.asarray(p),
        rtol=1e-5,
    )


def test_bounds_hold_for_extreme_deltas(clamp):
    rng = np.random.default_rng(0)
    prev = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.9, 0.9, 64),   # inside (-1, 1)
                rng.uniform(0.1, 3.0, 64),    # above 0
                rng.uniform(-3.0, 4.9, 64),   # below 5
                rng.normal(size=64),          # unclamped
            ],
            axis=-1,
        ).astype(np.float32)
    )
    for scale in (0.1, 10.0, 1000.0):
        delta = jnp.asarray(
            scale * rng.normal(size=(64, 4)).astype(np.float32)
        )
        new = np.asarray(get_clamped_new_state(clamp, delta, prev))
        # float32 saturation may land exactly on the bound
        assert new[:, 0].min() >= -1.0 and new[:, 0].max() <= 1.0
        assert new[:, 1].min() >= 0.0
        assert new[:, 2].max() <= 5.0
        # unclamped feature is the exact residual update
        np.testing.assert_allclose(
            new[:, 3], np.asarray(prev[:, 3] + delta[:, 3]), rtol=1e-5
        )


def test_zero_delta_is_identity(clamp):
    """f(f^{-1}(x) + 0) == x for states inside the valid range."""
    prev = jnp.asarray(
        np.array(
            [[0.3, 1.2, 2.0, -0.7], [-0.8, 0.05, 4.5, 2.2]],
            np.float32,
        )
    )
    new = get_clamped_new_state(clamp, jnp.zeros_like(prev), prev)
    np.testing.assert_allclose(
        np.asarray(new), np.asarray(prev), rtol=1e-4, atol=1e-5
    )


def test_linear_far_from_bounds(clamp):
    """Softplus clamping is ~identity deep inside the valid region."""
    prev = jnp.asarray(np.array([[0.0, 10.0, -10.0, 0.0]], np.float32))
    delta = jnp.asarray(np.array([[0.0, 1.0, 1.0, 0.0]], np.float32))
    new = np.asarray(get_clamped_new_state(clamp, delta, prev))
    np.testing.assert_allclose(new[0, 1], 11.0, rtol=1e-4)
    np.testing.assert_allclose(new[0, 2], -9.0, rtol=1e-4)


def test_unknown_feature_raises():
    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_state_features=2)
    with pytest.raises(ValueError, match="unknown features"):
        prepare_clamping_params(
            ds,
            np.zeros(2, np.float32),
            np.ones(2, np.float32),
            {"nonexistent_var": 0.0},
            None,
        )


def test_invalid_bounds_raise():
    ds = DummyDatastore(n_grid_x=4, n_grid_y=4, n_state_features=2)
    names = ds.get_vars_names("state")
    with pytest.raises(AssertionError):
        prepare_clamping_params(
            ds,
            np.zeros(2, np.float32),
            np.ones(2, np.float32),
            {names[0]: 2.0},
            {names[0]: 1.0},  # lower > upper
        )
