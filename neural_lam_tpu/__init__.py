"""neural-lam-tpu: a TPU-native limited-area neural weather prediction
framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mllam/neural-lam (graph-based LAM forecasting: GraphCast-LAM, Hi-LAM,
Hi-LAM-parallel) built TPU-first:

- message passing as gather -> edge-MLP -> segment-sum over padded, static,
  receiver-sorted edge arrays (XLA path + fused Pallas kernels),
- autoregressive rollout as ``lax.scan`` with per-step rematerialisation,
- SPMD scale-out over a ``jax.sharding.Mesh`` (data-parallel batch sharding
  and spatial graph partitioning with halo exchange over ICI),
- functional parameter pytrees, optax optimisers, orbax checkpoints.

The reference implementation's behaviour (layer semantics, dataset window
arithmetic, graph construction) is matched; its architecture is not.
"""

__version__ = "0.1.0"
