"""Flat-mesh graph LAM model (GraphCast/Keisler style).

TPU-native counterpart of the reference ``GraphLAM``
(reference: neural_lam/models/step_predictors/graph/graph_lam.py:16-183):
the processor is a chain of InteractionNets on the single-level m2m edge
set, threading both node and edge representations through the layers.
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.mlp import apply_mlp, init_mlp
from .graph_base import BaseGraphModel


class GraphLAM(BaseGraphModel):
    """Graph model on a flat (possibly multiscale-merged) mesh."""

    # flat mesh: padding threads transparently through every GNN call
    padded_residency = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        assert (
            not self.hierarchical
        ), "GraphLAM does not use a hierarchical mesh graph"

    def _init_subclass_params(self, rng: jax.Array) -> dict:
        k_mesh, k_m2m, k_proc = jax.random.split(rng, 3)
        end = self.mlp_blueprint_end
        mesh_dim = int(self.graph.mesh_static_features[0].shape[1])
        m2m_dim = self.graph.m2m[0].feature_dim
        return {
            "mesh_embedder": init_mlp(k_mesh, [mesh_dim] + end),
            "m2m_embedder": init_mlp(k_m2m, [m2m_dim] + end),
            "processor": self.init_processor_nets(
                k_proc, self.processor_layers
            ),
        }

    def embed_mesh_nodes(self, params: dict) -> jax.Array:
        return apply_mlp(
            params["mesh_embedder"], self.graph.mesh_static_features[0]
        )

    def _m2m_stencil(self):
        """Stencil decomposition of the m2m set, or ``None``.

        Detected once from the edge arrays themselves (ops/stencil.py);
        ``None`` whenever the mesh is not an exact offset-class lattice
        (irregular graphs keep the edge-list path), the env knob is
        off, or this is a sharded local view (nodes are partitioned —
        the halo executor owns message passing there).
        """
        from ..ops.stencil import detect_stencil, stencil_enabled

        if not stencil_enabled() or getattr(self, "_sharded_view", False):
            return None
        if "_m2m_stencil_cache" not in self.__dict__:
            pe = self.graph.m2m[0]
            valid = (
                np.asarray(pe.edges.receivers) != pe.edges.num_rec
            )
            self._m2m_stencil_cache = detect_stencil(
                np.asarray(pe.edges.senders)[valid],
                np.asarray(pe.edges.receivers)[valid],
                np.asarray(pe.features)[valid],
                np.asarray(self.graph.mesh_static_features[0]),
            )
        return self._m2m_stencil_cache

    def process_step(self, params: dict, mesh_rep: jax.Array) -> jax.Array:
        """Chained InteractionNets with edge-representation threading
        (reference: graph/graph_lam.py:102-121, 152-183).

        The first layer consumes the static m2m features through the
        delegated embedder (fused into the Pallas kernel when
        possible); subsequent layers thread the updated edge reps.

        On an exactly-regular multiscale mesh the whole chain runs in
        stencil form instead (ops/stencil.py): per-offset-class shifted
        dense MLPs, no edge lists — measured 2.9x faster fwd+bwd per
        application on v5e than the fused edge-list kernels.
        """
        st = self._m2m_stencil()
        if st is not None:
            from ..ops.stencil import apply_stencil_processor

            return apply_stencil_processor(
                params["processor"],
                params["m2m_embedder"],
                st,
                mesh_rep,
                aggr=self.mesh_aggr,
            )
        edge_rep = None
        for i, net_params in enumerate(params["processor"]):
            mesh_rep, edge_rep = self.gnn_apply(
                net_params,
                self.graph.m2m[0],
                send_rep=mesh_rep,
                rec_rep=mesh_rep,
                edge_rep=edge_rep,
                edge_embedder=(
                    params["m2m_embedder"] if i == 0 else None
                ),
                aggr=self.mesh_aggr,
                update_edges=True,
            )
        return mesh_rep
