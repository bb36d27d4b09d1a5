"""Numerical helpers (clamping inverses).

Semantics match the reference implementations
(reference: neural_lam/utils.py:800-874) so clamped-rollout outputs agree
bit-for-bit where the reference clamps.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_softplus(x, beta: float = 1.0, threshold: float = 20.0):
    """Inverse of softplus(x) = log(1 + exp(beta*x)) / beta.

    Inputs above ``threshold / beta`` are treated as linear (softplus is
    identity there); inputs are clamped slightly above zero so the log stays
    finite.
    """
    x = jnp.asarray(x)
    x_clamped = jnp.clip(
        x,
        jnp.log(jnp.asarray(1e-6 + 1.0, x.dtype)) / beta,
        threshold / beta,
    )
    non_linear_part = jnp.log(jnp.expm1(x_clamped * beta)) / beta
    return jnp.where(x * beta <= threshold, non_linear_part, x)


def inverse_sigmoid(x):
    """Inverse of the logistic sigmoid with clamping away from {0, 1}."""
    x_clamped = jnp.clip(x, 1e-6, 1 - 1e-6)
    return jnp.log(x_clamped / (1 - x_clamped))
