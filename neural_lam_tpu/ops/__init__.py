"""Compute kernels: MLPs, segment aggregation and interaction networks.

This layer is the TPU-native replacement for the reference's
``gnn_layers.py`` + PyG ``MessagePassing`` machinery
(reference: neural_lam/gnn_layers.py).
"""

from .mlp import MLPParams, apply_mlp, init_mlp  # noqa: F401
from .interaction import (  # noqa: F401
    EdgeSet,
    InteractionNetParams,
    apply_interaction_net,
    init_interaction_net,
    make_edge_set,
    place_edge_features,
)
from .segment import (  # noqa: F401
    aggregate_mean,
    aggregate_sum,
    segment_mean,
    segment_sum,
)
