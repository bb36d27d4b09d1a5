"""Device-ready graph buffers: padded edge sets + static feature arrays.

Bridges the host-side graph loader (``graphs/load.py``, numpy) and the
models: every edge set becomes a static, padded, receiver-sorted
:class:`~neural_lam_tpu.ops.interaction.EdgeSet` plus a matching padded
per-edge feature array, so all shapes are jit-time constants.

Index convention is zero-based per node set (sender indices into the
sender set, receiver indices into the receiver set), matching the
reference graph storage spec
(reference: docs/graph_storage_spec.md:132-160). Receiver-set sizes are
given by the owning node set (grid or mesh level), not ``max(recv)+1``,
so receivers with no incoming edges still get a (zero) aggregate.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interaction import EdgeSet, make_edge_set, place_edge_features


@dataclasses.dataclass(frozen=True)
class PaddedEdges:
    """An edge set together with its padded per-edge features."""

    edges: EdgeSet
    features: jax.Array  # (E_pad, d_feat) float32

    @property
    def feature_dim(self) -> int:
        return int(self.features.shape[-1])


def _make_padded(
    edge_index: np.ndarray,
    features: np.ndarray,
    num_rec: int,
    num_send: int,
    dtype=np.float32,
) -> PaddedEdges:
    senders, receivers = edge_index[0], edge_index[1]
    edges, perm = make_edge_set(
        senders, receivers, num_rec=num_rec, num_send=num_send
    )
    feats = place_edge_features(
        np.asarray(features, dtype=np.float32), perm, edges
    )
    return PaddedEdges(edges=edges, features=jnp.asarray(feats, dtype=dtype))


@dataclasses.dataclass(frozen=True)
class GraphBuffers:
    """All graph connectivity/features in device-ready padded form.

    Level lists follow the reference convention: level 0 is the finest
    mesh level; ``up[l]`` connects level ``l`` -> ``l+1`` and ``down[l]``
    connects level ``l+1`` -> ``l``
    (reference: neural_lam/utils.py:465-535). Flat (non-hierarchical)
    graphs have single-element ``m2m`` / ``mesh_static_features`` lists
    and empty ``up`` / ``down``.
    """

    hierarchical: bool
    num_grid_nodes: int
    g2m: PaddedEdges  # senders: grid, receivers: mesh level 0
    m2g: PaddedEdges  # senders: mesh level 0, receivers: grid
    m2m: tuple[PaddedEdges, ...]  # same-level mesh edges per level
    mesh_static_features: tuple[jax.Array, ...]  # (n_mesh[l], 2) per level
    up: tuple[PaddedEdges, ...]  # level l -> l+1
    down: tuple[PaddedEdges, ...]  # level l+1 -> l

    @property
    def num_levels(self) -> int:
        return len(self.mesh_static_features)

    @property
    def level_mesh_sizes(self) -> tuple[int, ...]:
        return tuple(int(m.shape[0]) for m in self.mesh_static_features)

    @property
    def num_mesh_nodes(self) -> int:
        """Total mesh nodes over all levels.

        Matches ``get_num_mesh`` in the reference
        (reference: models/step_predictors/graph/hierarchical.py:143-159).
        """
        return sum(self.level_mesh_sizes)


def build_graph_buffers(
    hierarchical: bool,
    graph: dict[str, Any],
    num_grid_nodes: int,
    dtype=np.float32,
) -> GraphBuffers:
    """Convert a loaded (numpy) graph dict into padded device buffers."""
    if hierarchical:
        mesh_static = [
            np.asarray(m, dtype=np.float32)
            for m in graph["mesh_static_features"]
        ]
        m2m_indices = graph["m2m_edge_index"]
        m2m_features = graph["m2m_features"]
    else:
        mesh_static = [np.asarray(graph["mesh_static_features"], np.float32)]
        m2m_indices = [graph["m2m_edge_index"]]
        m2m_features = [graph["m2m_features"]]

    level_sizes = [m.shape[0] for m in mesh_static]

    m2m = tuple(
        _make_padded(
            idx, feat, num_rec=level_sizes[lev], num_send=level_sizes[lev],
            dtype=dtype,
        )
        for lev, (idx, feat) in enumerate(zip(m2m_indices, m2m_features))
    )
    g2m = _make_padded(
        graph["g2m_edge_index"],
        graph["g2m_features"],
        num_rec=level_sizes[0],
        num_send=num_grid_nodes,
        dtype=dtype,
    )
    m2g = _make_padded(
        graph["m2g_edge_index"],
        graph["m2g_features"],
        num_rec=num_grid_nodes,
        num_send=level_sizes[0],
        dtype=dtype,
    )

    up: tuple[PaddedEdges, ...] = ()
    down: tuple[PaddedEdges, ...] = ()
    if hierarchical:
        up = tuple(
            _make_padded(
                idx,
                feat,
                num_rec=level_sizes[lev + 1],
                num_send=level_sizes[lev],
                dtype=dtype,
            )
            for lev, (idx, feat) in enumerate(
                zip(graph["mesh_up_edge_index"], graph["mesh_up_features"])
            )
        )
        down = tuple(
            _make_padded(
                idx,
                feat,
                num_rec=level_sizes[lev],
                num_send=level_sizes[lev + 1],
                dtype=dtype,
            )
            for lev, (idx, feat) in enumerate(
                zip(graph["mesh_down_edge_index"], graph["mesh_down_features"])
            )
        )

    return GraphBuffers(
        hierarchical=hierarchical,
        num_grid_nodes=num_grid_nodes,
        g2m=g2m,
        m2g=m2g,
        m2m=m2m,
        mesh_static_features=tuple(
            jnp.asarray(m, dtype=dtype) for m in mesh_static
        ),
        up=up,
        down=down,
    )
