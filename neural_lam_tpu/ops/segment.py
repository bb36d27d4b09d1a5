"""Segment aggregation primitives.

These replace the native scatter kernels the reference pulls in through
torch-geometric's ``MessagePassing.aggregate``
(reference: neural_lam/gnn_layers.py:176-190). Edges are static, padded and
sorted by receiver at graph-load time, so XLA lowers these to efficient
one-pass segment reductions on TPU; a fused Pallas path lives in
``pallas_gnn.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``.

    Padding edges must carry ``segment_ids == num_segments`` (one past the
    end) and are dropped by aggregating into ``num_segments + 1`` buckets and
    slicing. This keeps padded edge blocks fully static with no masking
    multiplies on the hot path.
    """
    out = jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments + 1,
        indices_are_sorted=indices_are_sorted,
    )
    return out[:num_segments]


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    segment_counts: jax.Array,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean-aggregate with precomputed per-segment valid-edge counts.

    ``segment_counts`` is computed once at graph-load time from the valid
    (non-padding) edges, clamped to a minimum of 1 so receivers with no
    incoming edges aggregate to zero (same convention as PyG scatter-mean).
    """
    summed = segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    counts = jnp.maximum(segment_counts, 1).astype(summed.dtype)
    return summed / counts[:, None]
