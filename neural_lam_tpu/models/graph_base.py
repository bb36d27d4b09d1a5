"""Encode-process-decode base for graph step predictors.

TPU-native re-design of the reference ``BaseGraphModel``
(reference: neural_lam/models/step_predictors/graph/base.py:15-344):
parameters are a pytree, the graph is a set of static padded EdgeSets,
and the forward pass is a pure function over unbatched ``(N, d)`` node
arrays (batch via ``jax.vmap``; shared mesh/edge embeddings then stay
unbatched and XLA broadcasts them for free, replacing the reference's
``expand_to_batch``).
"""

from __future__ import annotations

import abc
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datastore.base import BaseDatastore
from ..graphs.load import load_graph
from ..ops.interaction import (
    apply_interaction_net,
    init_interaction_net,
)
from ..ops.mlp import apply_mlp, init_mlp
from .base import StepPredictor
from .graph_buffers import GraphBuffers, build_graph_buffers

GNN_TYPES = ("InteractionNet", "PropagationNet")


def is_propagation(gnn_type: str) -> bool:
    """Map a reference GNN-type name to the ``propagation`` flag.

    The two GNN flavours share parameter shapes and differ only in
    aggregation/residual wiring (reference: neural_lam/gnn_layers.py:193-250),
    so the type becomes a static flag on ``apply_interaction_net``.
    """
    if gnn_type not in GNN_TYPES:
        raise ValueError(
            f"Unknown GNN type: {gnn_type} (must be one of {GNN_TYPES})"
        )
    return gnn_type == "PropagationNet"


class BaseGraphModel(StepPredictor):
    """Abstract encode-process-decode graph model."""

    def __init__(
        self,
        datastore: BaseDatastore,
        graph_name: str = "multiscale",
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
        compute_dtype: Any = jnp.float32,
    ) -> None:
        super().__init__(
            datastore=datastore,
            output_std=output_std,
            output_clamping_lower=output_clamping_lower,
            output_clamping_upper=output_clamping_upper,
        )
        # Mixed precision: all static node/edge features and the hidden
        # activations run in this dtype (bf16 halves the HBM traffic of
        # the bandwidth-bound message-passing path); parameters stay in
        # float32 outside the step and are cast by the caller. The
        # reference trains fp32 by default (train_model.py:125-129), so
        # float32 remains the default here too.
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.grid_static_features = self.grid_static_features.astype(
            self.compute_dtype
        )
        self.hidden_dim = hidden_dim
        self.hidden_layers = hidden_layers
        self.processor_layers = processor_layers
        if mesh_aggr not in ("sum", "mean"):
            # Fail at construction like the reference's InteractionNet
            # (reference: neural_lam/gnn_layers.py:70-76), not at the
            # first jitted apply.
            raise ValueError(f"Unknown aggregation method: {mesh_aggr}")
        self.mesh_aggr = mesh_aggr
        self.g2m_propagation = is_propagation(g2m_gnn_type)
        self.m2g_propagation = is_propagation(m2g_gnn_type)

        # One-step difference statistics for output rescaling
        # (reference: graph/base.py:76-92).
        stats = datastore.get_standardization_dataarray(category="state")
        self.diff_mean = jnp.asarray(
            np.asarray(stats["state_diff_mean_standardized"], np.float32)
        )
        self.diff_std = jnp.asarray(
            np.asarray(stats["state_diff_std_standardized"], np.float32)
        )

        # Load graph and build padded device buffers
        # (reference: graph/base.py:100-119).
        graph_dir_path = datastore.root_path / "graph" / graph_name
        extent = datastore.get_xy_extent(category="state")
        grid_xy_max_span = max(extent[1] - extent[0], extent[3] - extent[2])
        hierarchical, graph_dict = load_graph(
            graph_dir_path=graph_dir_path,
            mesh_node_features_scaling=grid_xy_max_span,
        )
        self.hierarchical = hierarchical
        self.graph: GraphBuffers = build_graph_buffers(
            hierarchical,
            graph_dict,
            self.num_grid_nodes,
            dtype=self.compute_dtype,
        )
        self.num_mesh_nodes = self.graph.num_mesh_nodes

        # Total per-grid-node input dim (reference: graph/base.py:128-137).
        num_forcing_vars = datastore.get_num_data_vars(category="forcing")
        grid_static_dim = self.grid_static_features.shape[1]
        self.grid_input_dim = (
            2 * self.num_state_vars
            + grid_static_dim
            + num_forcing_vars
            * (num_past_forcing_steps + num_future_forcing_steps + 1)
        )

        # MLP widths shared by all embedders
        # (reference: graph/base.py:144).
        self.mlp_blueprint_end = [hidden_dim] * (hidden_layers + 1)

    # -- parameter init ---------------------------------------------------
    def _init_base_params(self, rng: jax.Array) -> dict:
        """Parameters shared by all graph models.

        Mirrors the submodules created in the reference constructor
        (reference: graph/base.py:142-175).
        """
        keys = jax.random.split(rng, 7)
        end = self.mlp_blueprint_end
        return {
            "grid_embedder": init_mlp(
                keys[0], [self.grid_input_dim] + end
            ),
            "g2m_embedder": init_mlp(
                keys[1], [self.graph.g2m.feature_dim] + end
            ),
            "m2g_embedder": init_mlp(
                keys[2], [self.graph.m2g.feature_dim] + end
            ),
            "g2m_gnn": init_interaction_net(
                keys[3], self.hidden_dim, hidden_layers=self.hidden_layers
            ),
            "encoding_grid_mlp": init_mlp(keys[4], [self.hidden_dim] + end),
            "m2g_gnn": init_interaction_net(
                keys[5], self.hidden_dim, hidden_layers=self.hidden_layers
            ),
            "output_map": init_mlp(
                keys[6],
                [self.hidden_dim] * (self.hidden_layers + 1)
                + [self.grid_output_dim],
                layer_norm=False,  # no LayerNorm on the output head
            ),
        }

    @abc.abstractmethod
    def _init_subclass_params(self, rng: jax.Array) -> dict:
        """Parameters specific to the concrete model (processor etc.)."""

    def init_params(self, rng: jax.Array) -> dict:
        base_rng, sub_rng = jax.random.split(rng)
        params = self._init_base_params(base_rng)
        params.update(self._init_subclass_params(sub_rng))
        return params

    # -- forward ----------------------------------------------------------
    def gnn_apply(
        self,
        net_params: dict,
        pe,
        send_rep: jax.Array,
        rec_rep: jax.Array,
        edge_rep: Optional[jax.Array],
        edge_embedder: Optional[dict] = None,
        **kwargs: Any,
    ):
        """Apply one GNN over the padded-edge bundle ``pe``.

        The single indirection every model routes message passing
        through: the replicated path applies the (Pallas-fused)
        interaction net on ``pe.edges``; the spatially sharded executor
        (parallel/spatial.py) swaps this method on its local model view
        for a halo-exchange + local-segment version, which is what lets
        every model family run sharded without per-model sharded code.

        Passing ``edge_embedder`` (with ``edge_rep=None``) delegates the
        static edge-feature embedding to the op, which fuses it into the
        Pallas kernel when possible.
        """
        return apply_interaction_net(
            net_params,
            pe.edges,
            send_rep=send_rep,
            rec_rep=rec_rep,
            edge_rep=edge_rep,
            edge_embedder=edge_embedder,
            edge_features=(
                pe.features if edge_embedder is not None else None
            ),
            **kwargs,
        )

    # Keep grid/mesh node arrays at the kernel-layout block-padded row
    # counts through the whole encode-process-decode pipeline, so no
    # per-GNN-call pad/slice copies are materialised (grid-sized pads
    # are ~65 MB each at MEPS/batch-4). Opt-in per model family: flat
    # meshes thread padding transparently; hierarchical models (level
    # concatenation offsets) and spatially sharded local views opt out.
    padded_residency = False

    def _residency_rows(self):
        """(grid_rows, mesh_rows) block-padded targets, or (None, None)
        when disabled or the edge sets' layouts disagree."""
        if not self.padded_residency:
            return None, None
        g = self.graph

        def rows(layout):
            return (
                None
                if layout is None
                else layout.num_blocks * layout.block_rows
            )

        def send_rows(es):
            # The banded sender path (es.banded) replaces the
            # sender-sorted layout; its window padding is the sender
            # row target.
            if es.banded is not None:
                return es.banded.padded_send_rows
            return rows(es.send_layout)

        # Only the grid node set and the BOTTOM mesh level stay padded —
        # those are the arrays step() threads through g2m / processor /
        # m2g. Hierarchies handle levels >= 1 unpadded (the op layer
        # carries row counts per array, so mixing is fine).
        mesh = {rows(g.g2m.edges.layout), send_rows(g.m2g.edges)}
        grid = {rows(g.m2g.edges.layout), send_rows(g.g2m.edges)}
        if g.m2m:
            mesh.add(rows(g.m2m[0].edges.layout))
            mesh.add(send_rows(g.m2m[0].edges))
        if getattr(g, "up", None):
            mesh.add(send_rows(g.up[0].edges))
        if getattr(g, "down", None):
            mesh.add(rows(g.down[0].edges.layout))
        if (
            None in mesh
            or None in grid
            or len(mesh) != 1
            or len(grid) != 1
        ):
            return None, None
        return grid.pop(), mesh.pop()

    @staticmethod
    def _pad_nodes(x: jax.Array, rows) -> jax.Array:
        if rows is None or x.shape[0] == rows:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)],
            axis=0,
        )

    @abc.abstractmethod
    def embed_mesh_nodes(self, params: dict) -> jax.Array:
        """Embed static mesh node features (bottom level for hierarchies)."""

    @abc.abstractmethod
    def process_step(self, params: dict, mesh_rep: jax.Array) -> jax.Array:
        """Run the processor on the (bottom-level) mesh representation."""

    def step(
        self,
        params: dict,
        prev_state: jax.Array,
        prev_prev_state: jax.Array,
        forcing: jax.Array,
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        """One-step prediction on ``(N, d)`` or node-major batched
        ``(N, B, d)`` arrays.

        Same pipeline as the reference forward
        (reference: graph/base.py:228-344): embed, g2m, process, m2g,
        output-map, diff-stat rescale, clamped residual add.
        """
        # Hidden compute runs in compute_dtype (bf16 under mixed
        # precision); the state update below stays float32.
        dtype = self.compute_dtype
        static = self.grid_static_features
        if prev_state.ndim == 3:  # node-major batched layout
            static = jnp.broadcast_to(
                static[:, None, :],
                (static.shape[0], prev_state.shape[1], static.shape[1]),
            )
        grid_features = jnp.concatenate(
            (
                prev_state.astype(dtype),
                prev_prev_state.astype(dtype),
                forcing.astype(dtype),
                static,
            ),
            axis=-1,
        )

        grid_rows, mesh_rows = self._residency_rows()
        grid_emb = self._pad_nodes(
            apply_mlp(params["grid_embedder"], grid_features), grid_rows
        )
        mesh_emb = self._pad_nodes(
            self.embed_mesh_nodes(params), mesh_rows
        )

        # The g2m/m2g edge embedders are delegated to gnn_apply, which
        # fuses them into the Pallas edge kernel where possible.
        mesh_rep = self.gnn_apply(
            params["g2m_gnn"],
            self.graph.g2m,
            send_rep=grid_emb,
            rec_rep=mesh_emb,
            edge_rep=None,
            edge_embedder=params["g2m_embedder"],
            update_edges=False,
            propagation=self.g2m_propagation,
        )
        grid_rep = grid_emb + apply_mlp(
            params["encoding_grid_mlp"], grid_emb
        )

        mesh_rep = self.process_step(params, mesh_rep)

        grid_rep = self.gnn_apply(
            params["m2g_gnn"],
            self.graph.m2g,
            send_rep=mesh_rep,
            rec_rep=grid_rep,
            edge_rep=None,
            edge_embedder=params["m2g_embedder"],
            update_edges=False,
            propagation=self.m2g_propagation,
        )
        net_output = apply_mlp(params["output_map"], grid_rep)

        net_output = net_output.astype(jnp.float32)
        if net_output.shape[0] != prev_state.shape[0]:
            net_output = net_output[: prev_state.shape[0]]
        if self.output_std:
            pred_delta_mean, pred_std_raw = jnp.split(net_output, 2, axis=-1)
            pred_std = jax.nn.softplus(pred_std_raw)
        else:
            pred_delta_mean = net_output
            pred_std = None

        rescaled_delta_mean = (
            pred_delta_mean * self.diff_std + self.diff_mean
        )
        new_state = self.get_clamped_new_state(
            rescaled_delta_mean, prev_state.astype(jnp.float32)
        )
        return new_state, pred_std

    def init_processor_nets(
        self, rng: jax.Array, n: int, **kwargs: Any
    ) -> list[dict]:
        """Initialise ``n`` InteractionNet parameter pytrees."""
        keys = jax.random.split(rng, max(n, 1))
        return [
            init_interaction_net(
                keys[i], self.hidden_dim, hidden_layers=self.hidden_layers,
                **kwargs,
            )
            for i in range(n)
        ]
