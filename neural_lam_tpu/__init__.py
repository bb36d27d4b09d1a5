"""neural-lam-tpu: a TPU-native limited-area neural weather prediction
framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mllam/neural-lam (graph-based LAM forecasting: GraphCast-LAM, Hi-LAM,
Hi-LAM-parallel) built TPU-first:

- message passing as gather -> edge-MLP -> segment-sum over padded,
  static, blocked-CSR edge arrays (Pallas kernels with custom-VJP
  gathers; XLA fallback off-TPU),
- autoregressive rollout as ``lax.scan`` with per-step
  rematerialisation and a node-major batched layout,
- SPMD scale-out over a ``jax.sharding.Mesh`` (data-parallel batch
  sharding and spatial graph partitioning with halo exchange),
- functional parameter pytrees, optax optimisers, orbax checkpoints.

The reference implementation's behaviour (layer semantics, dataset
window arithmetic, graph construction) is matched; its architecture is
not. See ``docs/parity_matrix.md`` for the component-by-component map.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    NeuralLAMConfig,
    load_config,
    load_config_and_datastore,
)
from .dataset import WeatherDataset  # noqa: F401
from .loader import DataLoader, WeatherDataModule  # noqa: F401
from .metrics import DEFINED_METRICS, get_metric  # noqa: F401


def __getattr__(name):
    # Heavier subpackages load lazily so `import neural_lam_tpu` stays
    # cheap for datastore-only users.
    if name in ("MODELS", "ARForecaster", "GraphLAM", "HiLAM",
                "HiLAMParallel"):
        from . import models

        return getattr(models, name)
    if name in ("Trainer", "TrainingArgs"):
        from . import trainer

        return getattr(trainer, name)
    raise AttributeError(name)
