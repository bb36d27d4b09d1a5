"""Evaluation metrics on ``(..., N, num_vars)`` gridded tensors.

Jax counterpart of the reference metric registry
(reference: neural_lam/metrics.py:11-397). All metrics share the
signature ``metric(pred, target, pred_std, mask, average_grid, sum_vars)``
and the ``mask_and_reduce_metric`` reduction. The grid mask must be a
*static* (host numpy) boolean array so masked selection lowers to a
constant-index gather under ``jit``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_metric(metric_name: str) -> Callable[..., jax.Array]:
    """Look up a metric function by (case-insensitive) name."""
    metric_name_lower = metric_name.lower()
    if metric_name_lower not in DEFINED_METRICS:
        # ValueError, not assert: survives python -O and matches
        # get_metric_entry's error contract
        raise ValueError(
            f"Unknown metric: {metric_name!r} "
            f"(available: {sorted(DEFINED_METRICS)})"
        )
    return DEFINED_METRICS[metric_name_lower]


def mask_and_reduce_metric(
    metric_entry_vals: jax.Array,
    mask: Optional[np.ndarray],
    average_grid: bool,
    sum_vars: bool,
) -> jax.Array:
    """Select masked grid nodes, then mean over grid / sum over vars
    (reference: metrics.py:38-85).

    With ``average_grid`` the masked mean is computed by select-sum
    (``where`` keeps excluded NaNs out) instead of materialising a
    gathered copy of the interior nodes — the gather showed up as a
    per-step device op at MEPS size. Without ``average_grid`` the
    caller gets per-node values, so the gather is required to match the
    reference's masked shape.
    """
    if mask is not None:
        mask = np.asarray(mask, dtype=bool)
        if average_grid:
            n_sel = int(mask.sum())
            sel = jnp.where(
                jnp.asarray(mask)[:, None], metric_entry_vals, 0.0
            )
            metric_entry_vals = jnp.sum(sel, axis=-2) / max(n_sel, 1)
            if sum_vars:
                metric_entry_vals = jnp.sum(metric_entry_vals, axis=-1)
            return metric_entry_vals
        (node_idx,) = np.nonzero(mask)
        metric_entry_vals = metric_entry_vals[..., node_idx, :]
    if average_grid:
        metric_entry_vals = jnp.mean(metric_entry_vals, axis=-2)
    if sum_vars:
        metric_entry_vals = jnp.sum(metric_entry_vals, axis=-1)
    return metric_entry_vals


def _wmse_entry(pred, target, pred_std):
    return (pred - target) ** 2 / (pred_std**2)


def _mse_entry(pred, target, pred_std):
    return (pred - target) ** 2


def _wmae_entry(pred, target, pred_std):
    return jnp.abs(pred - target) / pred_std


def _mae_entry(pred, target, pred_std):
    return jnp.abs(pred - target)


def _nll_entry(pred, target, pred_std):
    var = pred_std**2
    return 0.5 * (jnp.log(2 * math.pi * var) + (target - pred) ** 2 / var)


def _crps_entry(pred, target, pred_std):
    target_standard = (target - pred) / pred_std
    return -pred_std * (
        math.pi ** (-0.5)
        - 2 * _std_normal_pdf(target_standard)
        - target_standard * (2 * _std_normal_cdf(target_standard) - 1)
    )


# Per-element error terms before any mask/reduction: the sharded loss
# (parallel/spatial.py) reduces these with its own psum'd masked mean.
ENTRY_FNS = {
    "wmse": _wmse_entry,
    "mse": _mse_entry,
    "wmae": _wmae_entry,
    "mae": _mae_entry,
    "nll": _nll_entry,
    "crps_gauss": _crps_entry,
}


def get_metric_entry(metric_name: str):
    """Per-element (unreduced) form of a registered metric."""
    name = metric_name.lower()
    if name not in ENTRY_FNS:
        raise ValueError(
            f"Unknown metric {metric_name!r} (available: "
            f"{sorted(ENTRY_FNS)})"
        )
    return ENTRY_FNS[name]


def _sanitize_masked_inputs(pred, target, pred_std, mask):
    """Double-where: neutralise inputs at masked-OUT nodes BEFORE the
    entry computation. The select-sum in ``mask_and_reduce_metric``
    keeps excluded NaNs out of the VALUE, but a single ``where`` does
    not protect gradients: if target/pred_std is NaN at an excluded
    node (NaN-filled exterior is common in LAM datastores), the
    cotangent is 0 * d(entry)/d(pred) = NaN and poisons every parameter
    gradient. Zeroing the inputs at excluded nodes (std -> 1) makes the
    entry finite there; the outer mask still drops it from the value.
    """
    if mask is None:
        return pred, target, pred_std
    m = jnp.asarray(np.asarray(mask, dtype=bool))[:, None]
    pred = jnp.where(m, pred, 0.0)
    target = jnp.where(m, target, 0.0)
    if jnp.ndim(pred_std) == jnp.ndim(pred):
        # node-dependent std head; per-variable (d,) std is finite by
        # construction (trainer eps-clamps it) and must not broadcast
        pred_std = jnp.where(m, pred_std, 1.0)
    return pred, target, pred_std


def wmse(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Squared error weighted by ``1 / pred_std**2``
    (reference: metrics.py:88-138)."""
    pred, target, pred_std = _sanitize_masked_inputs(
        pred, target, pred_std, mask
    )
    entry = _wmse_entry(pred, target, pred_std)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def mse(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Unweighted squared error (pred_std replaced by ones)."""
    return wmse(
        pred, target, jnp.ones_like(pred_std), mask, average_grid, sum_vars
    )


def wmae(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Absolute error weighted by ``1 / pred_std``
    (reference: metrics.py:186-236)."""
    pred, target, pred_std = _sanitize_masked_inputs(
        pred, target, pred_std, mask
    )
    entry = _wmae_entry(pred, target, pred_std)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def mae(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Unweighted absolute error (pred_std replaced by ones)."""
    return wmae(
        pred, target, jnp.ones_like(pred_std), mask, average_grid, sum_vars
    )


def nll(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Gaussian negative log likelihood (reference: metrics.py:284-330)."""
    pred, target, pred_std = _sanitize_masked_inputs(
        pred, target, pred_std, mask
    )
    entry = _nll_entry(pred, target, pred_std)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def _std_normal_pdf(x: jax.Array) -> jax.Array:
    return jnp.exp(-0.5 * x * x) / math.sqrt(2 * math.pi)


def _std_normal_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def crps_gauss(
    pred, target, pred_std, mask=None, average_grid=True, sum_vars=True
):
    """Closed-form Gaussian CRPS, negated for minimisation
    (reference: metrics.py:333-387)."""
    pred, target, pred_std = _sanitize_masked_inputs(
        pred, target, pred_std, mask
    )
    entry = _crps_entry(pred, target, pred_std)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


DEFINED_METRICS = {
    "mse": mse,
    "mae": mae,
    "wmse": wmse,
    "wmae": wmae,
    "nll": nll,
    "crps_gauss": crps_gauss,
}
