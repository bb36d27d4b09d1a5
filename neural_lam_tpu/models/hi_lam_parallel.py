"""Hi-LAM-Parallel: all mesh edge sets processed in one fused GNN.

TPU-native counterpart of the reference ``HiLAMParallel``
(reference: neural_lam/models/step_predictors/graph/hi_lam_parallel.py:16-209):
same-level, up and down mesh edges are concatenated into one global edge
set over the flattened multi-level node space, with separate per-chunk
edge/aggregation MLPs (the SplitMLPs mechanism,
reference: neural_lam/gnn_layers.py:275-325). Here the concatenation is
done over the already padded per-set blocks, so chunk boundaries stay
tile-aligned and static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interaction import (
    EdgeSet,
    broadcast_to_batch,
    fused_edge_phase,
    fused_edge_phase_supported,
)
from ..ops.mlp import apply_mlp_split_first
from .hierarchical import BaseHiGraphModel


@dataclasses.dataclass(frozen=True)
class _CombinedEdges:
    """Padded-edge-bundle shim for the combined multi-level edge set
    (it has no single feature array; ``gnn_apply`` only needs
    ``.edges``)."""

    edges: EdgeSet
    features: None = None


def _combine_edge_sets(
    sections: list, section_offsets: list[tuple[int, int]], num_total: int
) -> EdgeSet:
    """Concatenate padded per-set edges into one global-index edge set.

    ``section_offsets`` holds ``(sender_offset, receiver_offset)`` node
    offsets per section; padding rows are re-routed to the global dead
    segment ``num_total``.
    """
    senders_l, receivers_l = [], []
    counts = np.zeros(num_total, dtype=np.int64)
    num_valid = 0
    for pe, (s_off, r_off) in zip(sections, section_offsets):
        s = np.asarray(pe.edges.senders, dtype=np.int64)
        r = np.asarray(pe.edges.receivers, dtype=np.int64)
        # Dead padding slots carry receiver == num_rec and may be
        # interspersed (blocked layout), so detect them by value.
        valid = r < pe.edges.num_rec
        senders_l.append(s + s_off)
        receivers_l.append(np.where(valid, r + r_off, num_total))
        counts += np.bincount(
            r[valid] + r_off, minlength=num_total
        )
        num_valid += pe.edges.num_valid
    senders = np.concatenate(senders_l).astype(np.int32)
    receivers = np.concatenate(receivers_l).astype(np.int32)
    return EdgeSet(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        recv_gather=jnp.asarray(
            np.minimum(receivers, num_total - 1).astype(np.int32)
        ),
        recv_counts=jnp.asarray(counts.astype(np.int32)),
        num_rec=num_total,
        num_valid=num_valid,
        sorted_by_receiver=False,
    )


class HiLAMParallel(BaseHiGraphModel):
    """Parallel hierarchical message passing via one chunked edge set."""

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        g = self.graph
        L = self.num_levels
        first_index_level = np.concatenate(
            [[0], np.cumsum(self.level_mesh_sizes[:-1])]
        ).astype(int)

        # Section order: all same-level, then up, then down
        # (reference: hi_lam_parallel.py:122-124).
        self._sections = list(g.m2m) + list(g.up) + list(g.down)
        offsets = (
            [(first_index_level[l], first_index_level[l]) for l in range(L)]
            + [
                (first_index_level[l], first_index_level[l + 1])
                for l in range(L - 1)
            ]
            + [
                (first_index_level[l + 1], first_index_level[l])
                for l in range(L - 1)
            ]
        )
        self.total_mesh_nodes = int(sum(self.level_mesh_sizes))
        self._total_pe = _CombinedEdges(
            _combine_edge_sets(
                self._sections, offsets, self.total_mesh_nodes
            )
        )
        self.edge_split_sections = [
            pe.edges.num_padded for pe in self._sections
        ]
        # Per-section (sender level, receiver level), same order
        self._section_send_levels = (
            list(range(L)) + list(range(L - 1)) + [l + 1 for l in range(L - 1)]
        )
        self._section_recv_levels = (
            list(range(L)) + [l + 1 for l in range(L - 1)] + list(range(L - 1))
        )

    def _init_subclass_params(self, rng: jax.Array) -> dict:
        k_hier, k_proc = jax.random.split(rng)
        params = self._init_hier_params(k_hier)
        params["processor"] = self.init_processor_nets(
            k_proc,
            self.processor_layers,
            num_edge_chunks=len(self._sections),
            num_aggr_chunks=self.num_levels,
        )
        return params

    def _fused_sections_step(
        self, net_params, mesh_rep_levels, edge_reps
    ):
        """One processor layer as per-section fused Pallas edge phases.

        Mathematically identical to the combined chunked step: every
        section has its own edge MLP (SplitMLPs), the per-level
        aggregate is the sum of its incoming sections' segment sums,
        and one per-level node MLP applies after — but each section's
        gather+MLP+LN+aggregate runs as ONE kernel over its own
        per-level edge set (which carries a blocked layout, unlike the
        synthesized combined set), instead of XLA scatter/gather over
        the concatenated node space."""
        L = self.num_levels
        agg = [None] * L
        new_edges = []
        for k, pe in enumerate(self._sections):
            a, ne = fused_edge_phase(
                net_params["edge"][k],
                pe.edges,
                mesh_rep_levels[self._section_send_levels[k]],
                mesh_rep_levels[self._section_recv_levels[k]],
                edge_reps[k],
                update_edges=True,
            )
            rl = self._section_recv_levels[k]
            agg[rl] = a if agg[rl] is None else agg[rl] + a
            new_edges.append(ne)
        new_levels = []
        for lev in range(L):
            rep_b, agg_b = broadcast_to_batch(
                [mesh_rep_levels[lev], agg[lev]]
            )
            diff = apply_mlp_split_first(
                net_params["aggr"][lev], (rep_b, agg_b)
            )
            new_levels.append(rep_b + diff)
        return new_levels, new_edges

    def hi_processor_step(
        self, params, mesh_rep_levels, mesh_same_rep, mesh_up_rep,
        mesh_down_rep,
    ):
        """Fused processing of all levels and edge sets at once
        (reference: hi_lam_parallel.py:147-209)."""
        L = self.num_levels
        # Per-section fused kernels on the replicated path (the sharded
        # local view routes through its own gnn_apply/_sharded_combined
        # instead, hence the _sharded_view guard).
        # Every processor layer has identically shaped MLPs, so checking
        # the first layer's sections decides for all of them.
        first = params["processor"][0]
        use_fused = not getattr(self, "_sharded_view", False) and all(
            fused_edge_phase_supported(
                first["edge"][k],
                pe.edges,
                mesh_rep_levels[self._section_send_levels[k]],
                mesh_rep_levels[self._section_recv_levels[k]],
                (mesh_same_rep + mesh_up_rep + mesh_down_rep)[k],
            )
            for k, pe in enumerate(self._sections)
        )
        if use_fused:
            for net_params in params["processor"]:
                edge_reps = mesh_same_rep + mesh_up_rep + mesh_down_rep
                mesh_rep_levels, new_edges = self._fused_sections_step(
                    net_params, mesh_rep_levels, edge_reps
                )
                mesh_same_rep = new_edges[:L]
                mesh_up_rep = new_edges[L : L + (L - 1)]
                mesh_down_rep = new_edges[L + (L - 1) :]
            return (
                list(mesh_rep_levels),
                list(mesh_same_rep),
                list(mesh_up_rep),
                list(mesh_down_rep),
            )

        # Broadcast unbatched (static-embedded) lists to the common
        # layout before concatenation along the node/edge (leading) axis
        all_reps = mesh_rep_levels + mesh_same_rep + mesh_up_rep + (
            mesh_down_rep
        )
        if any(r.ndim == 3 for r in all_reps):
            mesh_rep_levels = broadcast_to_batch(
                mesh_rep_levels, ref=all_reps
            )
            mesh_same_rep = broadcast_to_batch(mesh_same_rep, ref=all_reps)
            mesh_up_rep = broadcast_to_batch(mesh_up_rep, ref=all_reps)
            mesh_down_rep = broadcast_to_batch(
                mesh_down_rep, ref=all_reps
            )
        mesh_rep = jnp.concatenate(mesh_rep_levels, axis=0)
        mesh_edge_rep = jnp.concatenate(
            mesh_same_rep + mesh_up_rep + mesh_down_rep, axis=0
        )

        for net_params in params["processor"]:
            mesh_rep, mesh_edge_rep = self.gnn_apply(
                net_params,
                self._total_pe,
                send_rep=mesh_rep,
                rec_rep=mesh_rep,
                edge_rep=mesh_edge_rep,
                update_edges=True,
                edge_chunk_sizes=self.edge_split_sections,
                aggr_chunk_sizes=self.level_mesh_sizes,
            )

        # Split back into per-level / per-section lists
        node_splits = np.cumsum(self.level_mesh_sizes[:-1]).tolist()
        mesh_rep_levels = list(
            jnp.split(mesh_rep, node_splits, axis=0)
        )
        edge_splits = np.cumsum(self.edge_split_sections[:-1]).tolist()
        sections = jnp.split(mesh_edge_rep, edge_splits, axis=0)
        mesh_same_rep = list(sections[:L])
        mesh_up_rep = list(sections[L : L + (L - 1)])
        mesh_down_rep = list(sections[L + (L - 1) :])

        return mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
