"""Hi-LAM: sequential hierarchical processor (Oskarsson et al. 2023).

TPU-native counterpart of the reference ``HiLAM``
(reference: neural_lam/models/step_predictors/graph/hi_lam.py:16-360):
each processor layer runs a Down sweep (top -> bottom, alternating
down-edge GNN and same-level GNN) followed by an Up sweep
(bottom -> top). Separate GNN parameter stacks per (layer, level).
"""

from __future__ import annotations

import jax

from .hierarchical import BaseHiGraphModel


class HiLAM(BaseHiGraphModel):
    """Sequential hierarchical message passing."""

    # grid + bottom-mesh arrays ride block-padded; levels >= 1 are
    # unpadded (mixing is fine — the op layer carries row counts).
    # HiLAMParallel keeps this off: its combined edge set concatenates
    # levels by exact node offsets.
    padded_residency = True

    def _init_subclass_params(self, rng: jax.Array) -> dict:
        L = self.num_levels
        P = self.processor_layers
        k_hier, k_down, k_dsame, k_up, k_usame = jax.random.split(rng, 5)
        params = self._init_hier_params(k_hier)
        # Nested stacks (processor_layers x levels-or-gaps)
        # (reference: hi_lam.py:87-101).
        params.update(
            {
                "mesh_down_gnns": [
                    self.init_processor_nets(k, L - 1)
                    for k in jax.random.split(k_down, max(P, 1))[:P]
                ],
                "mesh_down_same_gnns": [
                    self.init_processor_nets(k, L)
                    for k in jax.random.split(k_dsame, max(P, 1))[:P]
                ],
                "mesh_up_gnns": [
                    self.init_processor_nets(k, L - 1)
                    for k in jax.random.split(k_up, max(P, 1))[:P]
                ],
                "mesh_up_same_gnns": [
                    self.init_processor_nets(k, L)
                    for k in jax.random.split(k_usame, max(P, 1))[:P]
                ],
            }
        )
        return params

    def _mesh_down_step(
        self, mesh_rep_levels, mesh_same_rep, mesh_down_rep,
        down_gnns, same_gnns,
    ):
        """Down sweep (reference: hi_lam.py:165-234)."""
        g = self.graph
        # Same-level processing on the top level first
        mesh_rep_levels[-1], mesh_same_rep[-1] = self.gnn_apply(
            same_gnns[-1],
            g.m2m[-1],
            send_rep=mesh_rep_levels[-1],
            rec_rep=mesh_rep_levels[-1],
            edge_rep=mesh_same_rep[-1],
            update_edges=True,
        )
        for level_l in range(self.num_levels - 2, -1, -1):
            new_node_rep, mesh_down_rep[level_l] = self.gnn_apply(
                down_gnns[level_l],
                g.down[level_l],
                send_rep=mesh_rep_levels[level_l + 1],
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_down_rep[level_l],
                update_edges=True,
                propagation=self.down_propagation,
            )
            mesh_rep_levels[level_l], mesh_same_rep[level_l] = (
                self.gnn_apply(
                    same_gnns[level_l],
                    g.m2m[level_l],
                    send_rep=new_node_rep,
                    rec_rep=new_node_rep,
                    edge_rep=mesh_same_rep[level_l],
                    update_edges=True,
                )
            )
        return mesh_rep_levels, mesh_same_rep, mesh_down_rep

    def _mesh_up_step(
        self, mesh_rep_levels, mesh_same_rep, mesh_up_rep, up_gnns, same_gnns
    ):
        """Up sweep (reference: hi_lam.py:236-300)."""
        g = self.graph
        mesh_rep_levels[0], mesh_same_rep[0] = self.gnn_apply(
            same_gnns[0],
            g.m2m[0],
            send_rep=mesh_rep_levels[0],
            rec_rep=mesh_rep_levels[0],
            edge_rep=mesh_same_rep[0],
            update_edges=True,
        )
        for level_l in range(1, self.num_levels):
            new_node_rep, mesh_up_rep[level_l - 1] = self.gnn_apply(
                up_gnns[level_l - 1],
                g.up[level_l - 1],
                send_rep=mesh_rep_levels[level_l - 1],
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_up_rep[level_l - 1],
                update_edges=True,
                propagation=self.up_propagation,
            )
            mesh_rep_levels[level_l], mesh_same_rep[level_l] = (
                self.gnn_apply(
                    same_gnns[level_l],
                    g.m2m[level_l],
                    send_rep=new_node_rep,
                    rec_rep=new_node_rep,
                    edge_rep=mesh_same_rep[level_l],
                    update_edges=True,
                )
            )
        return mesh_rep_levels, mesh_same_rep, mesh_up_rep

    def hi_processor_step(
        self, params, mesh_rep_levels, mesh_same_rep, mesh_up_rep,
        mesh_down_rep,
    ):
        """Down then Up sweep per processor layer
        (reference: hi_lam.py:302-360)."""
        for layer in range(self.processor_layers):
            mesh_rep_levels, mesh_same_rep, mesh_down_rep = (
                self._mesh_down_step(
                    mesh_rep_levels,
                    mesh_same_rep,
                    mesh_down_rep,
                    params["mesh_down_gnns"][layer],
                    params["mesh_down_same_gnns"][layer],
                )
            )
            mesh_rep_levels, mesh_same_rep, mesh_up_rep = self._mesh_up_step(
                mesh_rep_levels,
                mesh_same_rep,
                mesh_up_rep,
                params["mesh_up_gnns"][layer],
                params["mesh_up_same_gnns"][layer],
            )
        return mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
