"""Regular-structure (stencil) m2m processor for uniform quad meshes.

On the multiscale mesh the reference builds (factor-3 coarsened quad
grids with diagonals merged into one level-0 node lattice, reference:
create_graph.py:279-332, 645-681), every m2m edge belongs to one of 8
offset classes per stride (N/S/E/W + diagonals at strides 1, 3, 9, 27
at MEPS size), and its static feature vector is CONSTANT within the
class. Message passing therefore needs no edge lists at all: per
class, the sender field is a shifted copy of the node lattice (with a
receiver-side validity mask at the borders), the evolving edge state is
a dense (n_offsets, nsx, nsy, B, d) tensor per stride group, and one
InteractionNet application is a handful of masked dense MLPs + adds —
no gathers, no one-hot matmuls, no Pallas launches, no per-chunk
overheads. Measured on v5e (scripts/stencil_ab.py, level-0 set,
batched node+edge state threaded): fwd+bwd 5.14 ms -> 1.76 ms (2.9x)
per application vs the fused edge-list kernels.

:func:`detect_stencil` recovers the structure from the edge arrays
themselves (lattice coordinates from the mesh node positions, per-class
stride/offset/mask/feature checks) and returns ``None`` whenever the
graph is not exactly stencil-decomposable — callers then stay on the
edge-list path, so arbitrary graphs keep working. Numerics match the
edge-list path exactly up to f32 summation order (CPU equivalence
tests); on TPU the stencil is *more* accurate than the fused kernels,
whose one-hot gather/aggregate matmuls round operands to bf16 under the
hardware-default matmul precision (docs/performance.md).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import apply_mlp, apply_mlp_split_first


@dataclasses.dataclass(frozen=True)
class StencilGroup:
    """All offset classes sharing one (stride, subgrid origin)."""

    stride: int
    origin: tuple[int, int]  # lattice coords of subgrid position (0, 0)
    dims: tuple[int, int]  # (nsx, nsy) subgrid shape
    offsets: tuple[tuple[int, int], ...]  # per class, in SUBGRID units
    feats: np.ndarray  # (n_offsets, d_feat) class-constant edge features
    masks: np.ndarray  # (n_offsets, nsx, nsy) float32 receiver validity


@dataclasses.dataclass(frozen=True)
class StencilLayout:
    dims: tuple[int, int]  # (nx, ny) full lattice
    # x_lat = x[perm] maps node-index order -> row-major lattice order;
    # None when the graph already stores nodes row-major.
    perm: Optional[np.ndarray]
    inv_perm: Optional[np.ndarray]
    groups: tuple[StencilGroup, ...]
    counts: np.ndarray  # (nx, ny) float32 in-degree (for mean aggr)
    n_nodes: int

    @property
    def num_edges(self) -> int:
        return int(sum(g.masks.sum() for g in self.groups))


def detect_stencil(
    senders: np.ndarray,
    receivers: np.ndarray,
    features: np.ndarray,
    xy: np.ndarray,
    feat_tol: float = 1e-6,
) -> Optional[StencilLayout]:
    """Recover the stencil decomposition of an edge set, or ``None``.

    ``xy`` are the (possibly normalized) mesh node positions; the
    lattice is recovered from the outer product of their unique
    coordinate values, so any affine scaling of a regular grid works.
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    features = np.asarray(features, np.float64)
    xy = np.asarray(xy, np.float64)
    n = xy.shape[0]
    if n == 0 or senders.size == 0:
        return None

    ux, uy = np.unique(xy[:, 0]), np.unique(xy[:, 1])
    nx, ny = len(ux), len(uy)
    if nx * ny != n:
        return None
    ix = np.searchsorted(ux, xy[:, 0])
    iy = np.searchsorted(uy, xy[:, 1])
    lat = ix * ny + iy
    if len(np.unique(lat)) != n:
        return None
    # perm[l] = node whose lattice index is l
    perm = np.empty(n, np.int64)
    perm[lat] = np.arange(n)
    identity = bool(np.array_equal(perm, np.arange(n)))
    inv = None if identity else np.argsort(perm)

    di = ix[senders] - ix[receivers]
    dj = iy[senders] - iy[receivers]
    class_key = di * (2 * max(nx, ny) + 1) + dj
    counts = np.zeros((nx, ny), np.float64)
    groups: dict[tuple[int, tuple[int, int]], dict] = {}
    for key in np.unique(class_key):
        sel = class_key == key
        cdi, cdj = int(di[sel][0]), int(dj[sel][0])
        stride = max(abs(cdi), abs(cdj))
        if stride == 0:
            return None  # self loops are not stencil edges
        if abs(cdi) not in (0, stride) or abs(cdj) not in (0, stride):
            return None
        rix, riy = ix[receivers[sel]], iy[receivers[sel]]
        ox = np.unique(rix % stride)
        oy = np.unique(riy % stride)
        if len(ox) != 1 or len(oy) != 1:
            return None
        origin = (int(ox[0]), int(oy[0]))
        dims = (
            (nx - origin[0] + stride - 1) // stride,
            (ny - origin[1] + stride - 1) // stride,
        )
        feats_sel = features[sel]
        if np.ptp(feats_sel, axis=0).max() > feat_tol:
            return None  # features not class-constant
        mask = np.zeros(dims, np.float64)
        px = (rix - origin[0]) // stride
        py = (riy - origin[1]) // stride
        # np.add.at, NOT fancy-index +=: the latter applies duplicate
        # indices only once, which would silently DROP a multi-edge
        # instead of tripping this guard.
        np.add.at(mask, (px, py), 1.0)
        if mask.max() > 1.0:
            return None  # multi-edge within a class
        np.add.at(counts, (rix, riy), 1.0)
        g = groups.setdefault(
            (stride, origin),
            {"dims": dims, "offsets": [], "feats": [], "masks": []},
        )
        if g["dims"] != dims:
            return None
        g["offsets"].append((cdi // stride, cdj // stride))
        g["feats"].append(feats_sel[0])
        g["masks"].append(mask)

    return StencilLayout(
        dims=(nx, ny),
        perm=None if identity else perm,
        inv_perm=inv,
        groups=tuple(
            StencilGroup(
                stride=s,
                origin=o,
                dims=g["dims"],
                offsets=tuple(g["offsets"]),
                feats=np.asarray(g["feats"], np.float32),
                masks=np.asarray(g["masks"], np.float32),
            )
            for (s, o), g in sorted(groups.items())
        ),
        counts=counts.astype(np.float32),
        n_nodes=n,
    )


def stencil_enabled() -> bool:
    """``NEURAL_LAM_TPU_STENCIL``: ``auto`` / ``on`` / ``off``.

    ``auto`` (default) enables the stencil only OFF the TPU, mirroring
    ``NEURAL_LAM_TPU_PALLAS=auto``: measured on v5e at MEPS size the
    full-step stencil is SLOWER than the fused edge-list kernels
    (34.2 vs 26.8 ms busy; the kernels keep per-edge intermediates in
    VMEM while the XLA stencil pays HBM round-trips for every
    per-class intermediate plus the per-step remat recompute), while on
    CPU it is ~8x faster forward and ~1.5x fwd+bwd. ``on`` forces it
    everywhere — useful on TPU as a *numerics* mode: the stencil has no
    one-hot matmuls, so it avoids the hardware-default operand rounding
    entirely (docs/performance.md round-5 stencil section).
    """
    mode = os.environ.get("NEURAL_LAM_TPU_STENCIL", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    return jax.default_backend() != "tpu"


def _shift(xs: jax.Array, du: int, dv: int) -> jax.Array:
    """Sender field for offset (du, dv): position p reads p + (du, dv).
    Wrap-around rows are killed by the class mask."""
    return jnp.roll(xs, (-du, -dv), axis=(0, 1))


def init_edge_states(
    embedder: dict, layout: StencilLayout, like: jax.Array
) -> list[jax.Array]:
    """Initial per-group edge states: the edge embedder applied to each
    class's CONSTANT feature row (n_offsets rows per group instead of
    E), broadcast over the subgrid and any batch dims of ``like``."""
    states = []
    extra = like.shape[2:]  # ([B,] d) of the lattice layout
    for g in layout.groups:
        emb = apply_mlp(
            embedder, jnp.asarray(g.feats, like.dtype)
        )  # (n_off, d)
        bshape = (
            (len(g.offsets),) + g.dims + extra[:-1] + (emb.shape[-1],)
        )
        emb = emb.reshape(
            (len(g.offsets),) + (1, 1) + (1,) * (len(extra) - 1)
            + (emb.shape[-1],)
        )
        states.append(jnp.broadcast_to(emb, bshape).astype(like.dtype))
    return states


def apply_stencil_interaction(
    net_params: dict,
    layout: StencilLayout,
    x_lat: jax.Array,
    e_states: Sequence[jax.Array],
    aggr: str = "sum",
) -> tuple[jax.Array, list[jax.Array]]:
    """One InteractionNet application in stencil form.

    ``x_lat``: (nx, ny, [B,] d) node lattice; ``e_states``: per-group
    (n_offsets, nsx, nsy, [B,] d) evolving edge states. Semantics match
    ``apply_interaction_net`` (messages = edge_mlp(edge, sender,
    receiver); masked sum (or count-clamped mean) aggregation; receiver
    residual + aggr MLP; edge residual), reference:
    neural_lam/gnn_layers.py:111-190.
    """
    edge_mlp = net_params["edge"][0]
    aggr_mlp = net_params["aggr"][0]
    agg = jnp.zeros_like(x_lat)
    new_states = []
    for g, e_state in zip(layout.groups, e_states):
        s = g.stride
        ox, oy = g.origin
        xs = x_lat[ox::s, oy::s]
        shifted = jnp.stack(
            [_shift(xs, du, dv) for du, dv in g.offsets]
        )  # (n_off, nsx, nsy, [B,] d)
        msg = apply_mlp_split_first(
            edge_mlp, (e_state, shifted, xs[None])
        )
        mask = jnp.asarray(g.masks, x_lat.dtype).reshape(
            g.masks.shape + (1,) * (msg.ndim - 3)
        )
        msg = msg * mask
        new_states.append(e_state + msg)
        agg_sub = msg.sum(axis=0)
        agg = agg.at[ox::s, oy::s].add(agg_sub)
    if aggr == "mean":
        c = jnp.maximum(
            jnp.asarray(layout.counts, x_lat.dtype), 1.0
        ).reshape(layout.counts.shape + (1,) * (x_lat.ndim - 2))
        agg = agg / c
    rec_diff = apply_mlp_split_first(aggr_mlp, (x_lat, agg))
    return x_lat + rec_diff, new_states


def apply_stencil_processor(
    processor_params: Sequence[dict],
    embedder: dict,
    layout: StencilLayout,
    mesh_rep: jax.Array,
    aggr: str = "sum",
) -> jax.Array:
    """The full GraphLAM processor chain in stencil form: first layer
    consumes the embedded class-constant features, subsequent layers
    thread the updated edge states
    (reference: graph/graph_lam.py:102-121)."""
    n = layout.n_nodes
    rows = mesh_rep.shape[0]
    x = mesh_rep[:n]
    if layout.perm is not None:
        x = x[jnp.asarray(layout.perm)]
    x_lat = x.reshape(layout.dims + x.shape[1:])
    e_states = init_edge_states(embedder, layout, x_lat)
    for net_params in processor_params:
        x_lat, e_states = apply_stencil_interaction(
            net_params, layout, x_lat, e_states, aggr=aggr
        )
    x = x_lat.reshape((n,) + x_lat.shape[2:])
    if layout.inv_perm is not None:
        x = x[jnp.asarray(layout.inv_perm)]
    if rows != n:
        x = jnp.concatenate(
            [x, jnp.zeros((rows - n,) + x.shape[1:], x.dtype)], axis=0
        )
    return x
