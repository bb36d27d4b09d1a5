"""Per-state-feature loss weighting.

Mirrors the reference (reference: neural_lam/loss_weighting.py:12-120):
manual weights must cover every state variable exactly; the uniform
fallback is ``1/n_features`` per variable.
"""

from __future__ import annotations

import numpy as np

from .config import (
    ManualStateFeatureWeighting,
    NeuralLAMConfig,
    UniformFeatureWeighting,
)
from .datastore.base import BaseDatastore


def get_manual_state_feature_weights(
    weighting_config: ManualStateFeatureWeighting, datastore: BaseDatastore
) -> list[float]:
    """Weights ordered like the datastore's state features; exact cover
    required (reference: loss_weighting.py:37-52)."""
    state_feature_names = datastore.get_vars_names(category="state")
    feature_weight_names = weighting_config.weights.keys()

    if set(feature_weight_names) != set(state_feature_names):
        additional_features = set(feature_weight_names) - set(
            state_feature_names
        )
        missing_features = set(state_feature_names) - set(
            feature_weight_names
        )
        raise ValueError(
            f"State feature weights must be provided for each state feature"
            f" in the datastore ({state_feature_names}). {missing_features}"
            " are missing and weights are defined for the features "
            f"{additional_features} which are not in the datastore."
        )

    return [
        weighting_config.weights[feature] for feature in state_feature_names
    ]


def get_uniform_state_feature_weights(
    datastore: BaseDatastore,
) -> list[float]:
    """``1/n_features`` per feature (reference: loss_weighting.py:60-79)."""
    n_features = len(datastore.get_vars_names(category="state"))
    return [1.0 / n_features] * n_features


def get_state_feature_weighting(
    config: NeuralLAMConfig, datastore: BaseDatastore
) -> np.ndarray:
    """Resolve the configured weighting into a ``(n_state,)`` array."""
    weighting_config = config.training.state_feature_weighting
    if isinstance(weighting_config, ManualStateFeatureWeighting):
        weights = get_manual_state_feature_weights(
            weighting_config, datastore
        )
    elif isinstance(weighting_config, UniformFeatureWeighting):
        weights = get_uniform_state_feature_weights(datastore)
    else:
        raise NotImplementedError(
            "Unsupported state feature weighting configuration: "
            f"{weighting_config}"
        )
    return np.asarray(weights, dtype=np.float32)
