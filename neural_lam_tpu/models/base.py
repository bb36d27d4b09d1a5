"""Step-predictor base: shared statics, statistics and output clamping.

Functional counterpart of the reference ``StepPredictor``
(reference: neural_lam/models/step_predictors/base.py:15-383). All
data-derived quantities (static grid features, standardisation stats,
clamping limits) are loaded once at construction and closed over by the
jitted step function as constants; only learned parameters live in the
params pytree.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datastore.base import BaseDatastore
from ..utils.numerics import inverse_sigmoid, inverse_softplus


@dataclasses.dataclass(frozen=True)
class ClampParams:
    """Per-feature clamping spec in standardized space.

    Features with both bounds use a rescaled-sigmoid clamp, features with
    one bound a (shifted/negated) softplus clamp
    (reference: models/step_predictors/base.py:222-320). Index tuples are
    static Python ints so the gather/scatter lowers to constant-index ops.
    """

    sigmoid_idx: tuple[int, ...]
    sigmoid_lower: jax.Array  # (len(sigmoid_idx),)
    sigmoid_upper: jax.Array
    softplus_lower_idx: tuple[int, ...]
    softplus_lower: jax.Array
    softplus_upper_idx: tuple[int, ...]
    softplus_upper: jax.Array

    @property
    def any_clamping(self) -> bool:
        return bool(
            self.sigmoid_idx or self.softplus_lower_idx
            or self.softplus_upper_idx
        )


def prepare_clamping_params(
    datastore: BaseDatastore,
    state_mean: np.ndarray,
    state_std: np.ndarray,
    lower_lims: Optional[dict[str, float]],
    upper_lims: Optional[dict[str, float]],
) -> ClampParams:
    """Build :class:`ClampParams` from per-variable physical-space limits.

    Limits are normalized into standardized space with the state mean/std
    (reference: models/step_predictors/base.py:207-221).
    """
    lower_lims = dict(lower_lims or {})
    upper_lims = dict(upper_lims or {})
    names = datastore.get_vars_names(category="state")
    unknown = (set(lower_lims) | set(upper_lims)) - set(names)
    if unknown:
        raise ValueError(
            "State feature limits were provided for unknown features: "
            f"{unknown}"
        )

    def normalize(x: float, i: int) -> float:
        return (x - float(state_mean[i])) / float(state_std[i])

    sig_idx, sig_lo, sig_hi = [], [], []
    sp_lo_idx, sp_lo = [], []
    sp_hi_idx, sp_hi = [], []
    for i, name in enumerate(names):
        has_lo, has_hi = name in lower_lims, name in upper_lims
        if has_lo and has_hi:
            assert lower_lims[name] < upper_lims[name], (
                f"Invalid clamping limits for feature {name!r}: lower "
                f"{lower_lims[name]} not below upper {upper_lims[name]}"
            )
            sig_idx.append(i)
            sig_lo.append(normalize(lower_lims[name], i))
            sig_hi.append(normalize(upper_lims[name], i))
        elif has_lo:
            sp_lo_idx.append(i)
            sp_lo.append(normalize(lower_lims[name], i))
        elif has_hi:
            sp_hi_idx.append(i)
            sp_hi.append(normalize(upper_lims[name], i))

    f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)  # noqa: E731
    return ClampParams(
        sigmoid_idx=tuple(sig_idx),
        sigmoid_lower=f32(sig_lo),
        sigmoid_upper=f32(sig_hi),
        softplus_lower_idx=tuple(sp_lo_idx),
        softplus_lower=f32(sp_lo),
        softplus_upper_idx=tuple(sp_hi_idx),
        softplus_upper=f32(sp_hi),
    )


def get_clamped_new_state(
    clamp: ClampParams, state_delta: jax.Array, prev_state: jax.Array
) -> jax.Array:
    """Residual update with per-feature range clamping.

    ``X_{t+1} = f(f^{-1}(X_t) + delta)`` per clamped feature, plain
    ``X_t + delta`` otherwise
    (reference: models/step_predictors/base.py:322-383). Sharpness and
    center constants are 1 and 0 as in the reference.
    """
    new_state = prev_state + state_delta

    if clamp.sigmoid_idx:
        idx = list(clamp.sigmoid_idx)
        lo, hi = clamp.sigmoid_lower, clamp.sigmoid_upper
        span = hi - lo
        inv = inverse_sigmoid((prev_state[..., idx] - lo) / span)
        clamped = lo + span * jax.nn.sigmoid(inv + state_delta[..., idx])
        new_state = new_state.at[..., idx].set(clamped)

    if clamp.softplus_lower_idx:
        idx = list(clamp.softplus_lower_idx)
        lo = clamp.softplus_lower
        inv = inverse_softplus(prev_state[..., idx] - lo)
        clamped = lo + jax.nn.softplus(inv + state_delta[..., idx])
        new_state = new_state.at[..., idx].set(clamped)

    if clamp.softplus_upper_idx:
        idx = list(clamp.softplus_upper_idx)
        hi = clamp.softplus_upper
        inv = -inverse_softplus(hi - prev_state[..., idx])
        clamped = hi - jax.nn.softplus(-(inv + state_delta[..., idx]))
        new_state = new_state.at[..., idx].set(clamped)

    return new_state


class StepPredictor(abc.ABC):
    """One-step predictor ``(X_{t-1}, X_t, forcing_t) -> X_{t+1}``.

    Instances are static (graph, stats, config); learned parameters are a
    pytree produced by :meth:`init_params` and consumed by :meth:`step`.
    """

    def __init__(
        self,
        datastore: BaseDatastore,
        output_std: bool = False,
        output_clamping_lower: Optional[dict[str, float]] = None,
        output_clamping_upper: Optional[dict[str, float]] = None,
    ) -> None:
        self.num_state_vars = datastore.get_num_data_vars(category="state")

        # Standardized static grid features, or an (N, 0) placeholder
        # (reference: models/step_predictors/base.py:50-71).
        da_static = datastore.get_dataarray(
            category="static", split=None, standardize=True
        )
        if da_static is None:
            num_grid_nodes = datastore.num_grid_points
            static_np = np.empty((num_grid_nodes, 0), dtype=np.float32)
        else:
            static_np = np.asarray(da_static.data, dtype=np.float32)
        self.grid_static_features = jnp.asarray(static_np)
        self.num_grid_nodes = int(static_np.shape[0])

        stats = datastore.get_standardization_dataarray(category="state")
        state_mean = np.asarray(stats["state_mean"], dtype=np.float32)
        state_std = np.asarray(stats["state_std"], dtype=np.float32)
        self.state_mean = jnp.asarray(state_mean)
        self.state_std = jnp.asarray(state_std)

        self.output_std = bool(output_std)
        self.grid_output_dim = (
            2 * self.num_state_vars if self.output_std else self.num_state_vars
        )

        self.clamp = prepare_clamping_params(
            datastore,
            state_mean,
            state_std,
            output_clamping_lower,
            output_clamping_upper,
        )

    @property
    def predicts_std(self) -> bool:
        return self.output_std

    def get_clamped_new_state(
        self, state_delta: jax.Array, prev_state: jax.Array
    ) -> jax.Array:
        return get_clamped_new_state(self.clamp, state_delta, prev_state)

    @abc.abstractmethod
    def init_params(self, rng: jax.Array) -> dict:
        """Initialise the learned-parameter pytree."""

    @abc.abstractmethod
    def step(
        self,
        params: dict,
        prev_state: jax.Array,
        prev_prev_state: jax.Array,
        forcing: jax.Array,
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        """Advance one step on unbatched ``(N, d)`` arrays.

        Returns ``(new_state, pred_std | None)``; batch via ``jax.vmap``.
        """
