"""SPMD parallelism: device meshes, data parallelism, spatial sharding.

The reference's only strategy is Lightning DDP data parallelism
(reference: neural_lam/train_model.py:517-530); here the batch axis is
sharded over a ``data`` mesh axis (XLA inserts the gradient all-reduce)
and, additionally, grid+mesh nodes can be sharded over a ``spatial``
axis with halo exchange of sender features — the graph analog of
context parallelism (SURVEY.md 2.2, 5.7).
"""

from .spatial import (  # noqa: F401
    EdgeMeta,
    ShardedModel,
)
