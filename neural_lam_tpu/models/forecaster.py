"""Autoregressive forecaster: ``lax.scan`` rollout with boundary forcing.

TPU-native counterpart of the reference ``ARForecaster``
(reference: neural_lam/models/forecasters/autoregressive.py:14-146). The
Python AR loop becomes a ``lax.scan`` over prediction steps so the
unrolled graph compiles once regardless of rollout length; each step is
optionally rematerialised (``jax.checkpoint``) so training-memory stays
O(1) in ``pred_steps`` instead of storing every step's activations
(the reference eats the full activation cost, SURVEY.md 5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datastore.base import BaseDatastore
from .base import StepPredictor


class ARForecaster:
    """Unrolls a :class:`StepPredictor`, overwriting boundary nodes with
    ground truth at every step."""

    def __init__(
        self,
        predictor: StepPredictor,
        datastore: BaseDatastore,
        remat_steps: Optional[bool] = None,
    ) -> None:
        self.predictor = predictor
        self.remat_steps = remat_steps
        # (N, 1) masks, matching the reference's buffers
        # (reference: forecasters/autoregressive.py:36-45).
        mask = np.asarray(
            datastore.boundary_mask.data, dtype=np.float32
        ).reshape(-1, 1)
        self.boundary_mask = jnp.asarray(mask)
        self.interior_mask = 1.0 - self.boundary_mask

    @property
    def predicts_std(self) -> bool:
        return self.predictor.predicts_std

    def init_params(self, rng: jax.Array) -> dict:
        return self.predictor.init_params(rng)

    def rollout(
        self,
        params: dict,
        init_states: jax.Array,  # (2, N, d_state)
        forcing_features: jax.Array,  # (T, N, d_forcing)
        boundary_states: jax.Array,  # (T, N, d_state)
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        """Unbatched AR rollout; returns ``(prediction (T, N, d), std|None)``.

        Per step: predict, then blend
        ``boundary_mask * truth + interior_mask * pred``
        (reference: autoregressive.py:116-136). Batch via ``jax.vmap``.
        """
        output_std = self.predictor.predicts_std

        def step(carry, inputs):
            prev_prev_state, prev_state = carry
            forcing, boundary_state = inputs
            pred_state, pred_std = self.predictor.step(
                params, prev_state, prev_prev_state, forcing
            )
            new_state = (
                self.boundary_mask * boundary_state
                + self.interior_mask * pred_state
            )
            out = (
                (new_state, pred_std)
                if output_std
                else (new_state, jnp.zeros((0,), dtype=new_state.dtype))
            )
            return (prev_state, new_state), out

        # Rematerialise per AR step to bound rollout memory; for a 1-step
        # rollout remat is a pure extra forward, so default it off there.
        pred_steps = int(forcing_features.shape[0])
        use_remat = (
            self.remat_steps
            if self.remat_steps is not None
            else pred_steps > 1
        )
        if use_remat:
            step = jax.checkpoint(step)

        carry0 = (init_states[0], init_states[1])
        _, (prediction, stds) = jax.lax.scan(
            step, carry0, (forcing_features, boundary_states)
        )
        return prediction, (stds if output_std else None)

    def forward(
        self,
        params: dict,
        init_states: jax.Array,  # (B, 2, N, d_state)
        forcing_features: jax.Array,  # (B, T, N, d_forcing)
        boundary_states: jax.Array,  # (B, T, N, d_state)
        batched_layout: bool = True,
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        """Batched rollout.

        Default path transposes once into the node-major layout
        ``(N, B, d)`` and runs the whole rollout there: every
        gather/segment op then moves B-times wider rows, which is the
        TPU-fast regime (row-bound ops dominate at hidden_dim 64).
        ``batched_layout=False`` falls back to ``vmap`` over
        :meth:`rollout` (identical numerics; used for equivalence
        tests).
        """
        if not batched_layout:
            prediction, stds = jax.vmap(
                lambda i, f, b: self.rollout(params, i, f, b)
            )(init_states, forcing_features, boundary_states)
            return prediction, (stds if self.predicts_std else None)

        output_std = self.predictor.predicts_std
        # (B, T, N, d) -> (T, N, B, d)
        init_nm = jnp.moveaxis(init_states, 0, 2)
        forcing_nm = jnp.moveaxis(forcing_features, 0, 2)
        boundary_nm = jnp.moveaxis(boundary_states, 0, 2)
        bmask = self.boundary_mask[:, None, :]  # (N, 1, 1)
        imask = 1.0 - bmask

        def step(carry, inputs):
            prev_prev_state, prev_state = carry
            forcing, boundary_state = inputs
            pred_state, pred_std = self.predictor.step(
                params, prev_state, prev_prev_state, forcing
            )
            new_state = bmask * boundary_state + imask * pred_state
            out = (
                (new_state, pred_std)
                if output_std
                else (new_state, jnp.zeros((0,), dtype=new_state.dtype))
            )
            return (prev_state, new_state), out

        pred_steps = int(forcing_nm.shape[0])
        use_remat = (
            self.remat_steps
            if self.remat_steps is not None
            else pred_steps > 1
        )
        if use_remat:
            step = jax.checkpoint(step)
        carry0 = (init_nm[0], init_nm[1])
        _, (prediction, stds) = jax.lax.scan(
            step, carry0, (forcing_nm, boundary_nm)
        )
        # (T, N, B, d) -> (B, T, N, d)
        prediction = jnp.moveaxis(prediction, 2, 0)
        if output_std:
            return prediction, jnp.moveaxis(stds, 2, 0)
        return prediction, None
