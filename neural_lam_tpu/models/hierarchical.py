"""Base for hierarchical (multi-level mesh) graph models.

TPU-native counterpart of the reference ``BaseHiGraphModel``
(reference: neural_lam/models/step_predictors/graph/hierarchical.py:15-318):
per-level node/edge embedders, an upward MESH INIT sweep, a
subclass-defined processor, and a downward MESH READ OUT sweep. Level
lists are static Python lists over padded edge sets, so the level loops
unroll at trace time with static shapes.
"""

from __future__ import annotations

import abc
from typing import Optional

import jax

from ..datastore.base import BaseDatastore
from ..ops.interaction import init_interaction_net
from ..ops.mlp import apply_mlp, init_mlp
from .graph_base import BaseGraphModel, is_propagation


class BaseHiGraphModel(BaseGraphModel):
    """Hierarchical encode-process-decode model."""

    def __init__(
        self,
        datastore: BaseDatastore,
        graph_name: str = "hierarchical",
        hidden_dim: int = 64,
        hidden_layers: int = 1,
        processor_layers: int = 4,
        mesh_aggr: str = "sum",
        num_past_forcing_steps: int = 1,
        num_future_forcing_steps: int = 1,
        output_std: bool = False,
        output_clamping_lower: Optional[dict[str, float]] = None,
        output_clamping_upper: Optional[dict[str, float]] = None,
        g2m_gnn_type: str = "InteractionNet",
        m2g_gnn_type: str = "InteractionNet",
        mesh_up_gnn_type: str = "InteractionNet",
        mesh_down_gnn_type: str = "InteractionNet",
        **base_kwargs,
    ) -> None:
        super().__init__(
            datastore=datastore,
            graph_name=graph_name,
            hidden_dim=hidden_dim,
            hidden_layers=hidden_layers,
            processor_layers=processor_layers,
            mesh_aggr=mesh_aggr,
            num_past_forcing_steps=num_past_forcing_steps,
            num_future_forcing_steps=num_future_forcing_steps,
            output_std=output_std,
            output_clamping_lower=output_clamping_lower,
            output_clamping_upper=output_clamping_upper,
            g2m_gnn_type=g2m_gnn_type,
            m2g_gnn_type=m2g_gnn_type,
            **base_kwargs,
        )
        assert self.hierarchical, (
            f"{type(self).__name__} requires a hierarchical mesh graph "
            f"(got a flat graph for {graph_name!r})"
        )
        self.up_propagation = is_propagation(mesh_up_gnn_type)
        self.down_propagation = is_propagation(mesh_down_gnn_type)
        self.num_levels = self.graph.num_levels
        self.level_mesh_sizes = list(self.graph.level_mesh_sizes)

    # -- params -----------------------------------------------------------
    def _init_hier_params(self, rng: jax.Array) -> dict:
        """Embedders per level + init/readout GNNs per inter-level gap
        (reference: hierarchical.py:89-141)."""
        L = self.num_levels
        end = self.mlp_blueprint_end
        mesh_dim = int(self.graph.mesh_static_features[0].shape[1])
        same_dim = self.graph.m2m[0].feature_dim
        up_dim = self.graph.up[0].feature_dim
        down_dim = self.graph.down[0].feature_dim

        n_keys = 4 * L - 2 + 2 * (L - 1)
        keys = list(jax.random.split(rng, n_keys))

        def take(n: int) -> list[jax.Array]:
            out, keys[:] = keys[:n], keys[n:]
            return out

        return {
            "mesh_embedders": [
                init_mlp(k, [mesh_dim] + end) for k in take(L)
            ],
            "mesh_same_embedders": [
                init_mlp(k, [same_dim] + end) for k in take(L)
            ],
            "mesh_up_embedders": [
                init_mlp(k, [up_dim] + end) for k in take(L - 1)
            ],
            "mesh_down_embedders": [
                init_mlp(k, [down_dim] + end) for k in take(L - 1)
            ],
            "mesh_init_gnns": [
                init_interaction_net(
                    k, self.hidden_dim, hidden_layers=self.hidden_layers
                )
                for k in take(L - 1)
            ],
            "mesh_read_gnns": [
                init_interaction_net(
                    k, self.hidden_dim, hidden_layers=self.hidden_layers
                )
                for k in take(L - 1)
            ],
        }

    # -- forward ----------------------------------------------------------
    def embed_mesh_nodes(self, params: dict) -> jax.Array:
        """Bottom level only; higher levels are embedded in process_step
        (reference: hierarchical.py:161-174)."""
        return apply_mlp(
            params["mesh_embedders"][0], self.graph.mesh_static_features[0]
        )

    def process_step(self, params: dict, mesh_rep: jax.Array) -> jax.Array:
        """Full init -> processor -> readout cycle
        (reference: hierarchical.py:176-282)."""
        g = self.graph

        # Embed remaining (level >= 1) mesh nodes and all edge sets
        mesh_rep_levels = [mesh_rep] + [
            apply_mlp(emb, static)
            for emb, static in zip(
                params["mesh_embedders"][1:], g.mesh_static_features[1:]
            )
        ]
        mesh_same_rep = [
            apply_mlp(emb, pe.features)
            for emb, pe in zip(params["mesh_same_embedders"], g.m2m)
        ]
        mesh_up_rep = [
            apply_mlp(emb, pe.features)
            for emb, pe in zip(params["mesh_up_embedders"], g.up)
        ]
        mesh_down_rep = [
            apply_mlp(emb, pe.features)
            for emb, pe in zip(params["mesh_down_embedders"], g.down)
        ]

        # MESH INIT: upward sweep over levels 1..L-1
        for level_l, gnn_params in enumerate(params["mesh_init_gnns"], 1):
            new_node_rep, new_edge_rep = self.gnn_apply(
                gnn_params,
                g.up[level_l - 1],
                send_rep=mesh_rep_levels[level_l - 1],
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_up_rep[level_l - 1],
                update_edges=True,
                propagation=self.up_propagation,
            )
            mesh_rep_levels[level_l] = new_node_rep
            mesh_up_rep[level_l - 1] = new_edge_rep

        # PROCESSOR (subclass)
        mesh_rep_levels, _, _, mesh_down_rep = self.hi_processor_step(
            params, mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
        )

        # MESH READ OUT: downward sweep over levels L-2..0
        for level_l in range(self.num_levels - 2, -1, -1):
            mesh_rep_levels[level_l] = self.gnn_apply(
                params["mesh_read_gnns"][level_l],
                g.down[level_l],
                send_rep=mesh_rep_levels[level_l + 1],
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_down_rep[level_l],
                update_edges=False,
                propagation=self.down_propagation,
            )

        return mesh_rep_levels[0]

    @abc.abstractmethod
    def hi_processor_step(
        self,
        params: dict,
        mesh_rep_levels: list[jax.Array],
        mesh_same_rep: list[jax.Array],
        mesh_up_rep: list[jax.Array],
        mesh_down_rep: list[jax.Array],
    ) -> tuple[list, list, list, list]:
        """Processor between mesh init and readout; returns updated lists."""
