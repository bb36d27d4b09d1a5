"""Model family: graph-based step predictors and forecasters.

Mirrors the reference registry (reference: neural_lam/models/__init__.py:14-18)
with a TPU-native implementation: functional parameter pytrees, static
padded-edge graphs, ``lax.scan`` rollouts.
"""

from .forecaster import ARForecaster
from .graph_lam import GraphLAM
from .hi_lam import HiLAM
from .hi_lam_parallel import HiLAMParallel

MODELS = {
    "graph_lam": GraphLAM,
    "hi_lam": HiLAM,
    "hi_lam_parallel": HiLAMParallel,
}

__all__ = [
    "MODELS",
    "ARForecaster",
    "GraphLAM",
    "HiLAM",
    "HiLAMParallel",
]
