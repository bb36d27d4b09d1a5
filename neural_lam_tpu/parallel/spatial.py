"""Spatial graph partitioning: sharded nodes, halo exchange, any model.

The novel scale-out component (absent in the reference, which replicates
the whole grid+mesh graph on every device,
reference: models/step_predictors/graph/base.py:114-119; plan per
SURVEY.md 2.2). Grid nodes and every mesh level are split into ``P``
contiguous slabs; each edge is owned by the shard of its RECEIVER, and
per-shard edge tables (extended-space sender ids, local receiver ids,
features) are stacked on a leading shard axis and fed to ``shard_map``
over the ``spatial`` mesh axis.

Unlike the v1 design (a hand-written GraphLAM-only interpreter), the
executor here runs the MODELS' OWN forward code: inside the shard it
builds a shallow "local view" of the model — graph buffers swapped for
local tables, static features swapped for local slabs, and
``BaseGraphModel.gnn_apply`` swapped for a halo-exchange + local
segment-sum version — and then calls ``model.step`` / the forecaster
rollout unchanged. GraphLAM, HiLAM and HiLAMParallel all shard through
this one path, including PropagationNet wiring, per-edge-type GNN
selection, chunked (SplitMLPs) processing and the ``output_std`` head.

Halo exchange is neighbor-only where it can be: for each edge set the
builder computes, per (receiver-shard, source-shard-offset), exactly
the sender rows crossing the cut, and exchanges them with one
``ppermute`` per distinct offset; the collective payload therefore
scales with the cut size, not the node count. Small sender sets (coarse
mesh levels) fall back to one ``all_gather`` — cheaper than several
tiny permutes. The per-edge-set choice is recorded on the table and
asserted in tests.
"""

from __future__ import annotations

import copy
import dataclasses
import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..metrics import get_metric_entry
from ..models.graph_base import BaseGraphModel
from ..ops.interaction import (
    _apply_chunked,
    _embedder_fusable,
    _round_up,
    broadcast_to_batch,
    fused_edge_phase_supported,
)
from ..ops.mlp import apply_mlp, apply_mlp_split_first
from ..ops.pallas_fused import (
    fused_v2_routed,
    make_fused_interaction,
    make_fused_interaction_v2,
)
from ..ops.pallas_segment import (
    BandedLayout,
    BlockedLayout,
    banded_expand_nondiff,
    banded_scatter_nondiff,
    blocked_segment_sum_nondiff,
    build_banded_layout,
    build_blocked_layout,
    pad_banded_layout,
    pad_blocked_layout,
)
from ..ops.segment import _gather_io_dtype, _interpret_mode


# ---------------------------------------------------------------------------
# build-time structures
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class EdgeMeta:
    """Static (trace-time) description of one sharded edge set.

    ``layout``/``send_layout`` are REPRESENTATIVE blocked layouts (all
    shards share their static shape/tiling after padding to the max
    chunk count); the per-shard index arrays live in the edge tables
    and are threaded into the kernels dynamically.
    """

    name: str
    n_shards: int
    n_rec_local: int
    n_send_local: int
    strategy: str  # "halo" | "all_gather"
    offsets: tuple[int, ...]  # source-shard offsets, halo strategy only
    halo_sizes: tuple[int, ...]  # padded row count per offset
    e_max: int  # blocked-padded edge slots per shard
    layout: Optional[BlockedLayout] = None  # receiver-sorted blocking
    send_layout: Optional[BlockedLayout] = None  # sender-sorted (grads)
    # Banded sender gather/scatter over the extended (local + halo)
    # sender space — preferred: both directions run as Pallas one-hot
    # matmuls, with no XLA row gather on the edge-wide arrays. Built
    # only when every shard's sender structure is banded enough.
    banded: Optional[BandedLayout] = None

    @property
    def ext_size(self) -> int:
        """Rows of the extended (local + halo) sender array."""
        if self.strategy == "all_gather":
            return self.n_send_local * self.n_shards
        return self.n_send_local + sum(self.halo_sizes)


def _build_edge_table(
    name: str,
    senders: np.ndarray,
    receivers: np.ndarray,
    features: Optional[np.ndarray],
    n_send_global: int,
    n_send_local: int,
    n_rec_local: int,
    n_shards: int,
    all_gather_max_nodes: int,
    max_halo_offsets: int,
) -> tuple[EdgeMeta, dict]:
    """Shard edges by receiver; build halo row tables and per-shard
    blocked-CSR layouts with extended-space sender ids."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    P_ = n_shards
    shard_of_edge = receivers // n_rec_local
    shard_of_sender = senders // n_send_local
    per_shard = [np.nonzero(shard_of_edge == s)[0] for s in range(P_)]

    # Remote-sender needs per (receiver shard, source offset)
    needs: dict[tuple[int, int], np.ndarray] = {}
    offsets_set: set[int] = set()
    for s in range(P_):
        sel = per_shard[s]
        src = shard_of_sender[sel]
        remote = sel[src != s]
        if len(remote) == 0:
            continue
        for t in np.unique(shard_of_sender[remote]):
            d = int(t - s)
            rows = np.unique(
                senders[remote[shard_of_sender[remote] == t]]
                - t * n_send_local
            )
            needs[(s, d)] = rows
            offsets_set.add(d)

    offsets_all = tuple(sorted(offsets_set))
    halo_all = tuple(
        _round_up(
            max(
                (len(needs.get((s, d), ())) for s in range(P_)),
                default=1,
            )
            or 1,
            8,
        )
        for d in offsets_all
    )
    # Strategy by measured payload, not offset count alone: a tiled
    # all_gather moves n_send_local*(P-1) rows per shard; the halo
    # rounds move sum(halo) rows. The merged multiscale mesh's
    # long-range edges produce up to +-3 offsets at P=8, but the far
    # offsets carry only a handful of coarse-scale sender rows, so
    # halos still beat the gather ~20x there (docs/scaling.md). Tiny
    # sender sets and graphs whose cuts touch most shards (where the
    # permute rounds would move all_gather-scale bytes anyway, plus
    # per-permute latency) keep the single all_gather.
    use_all_gather = (
        n_send_global <= all_gather_max_nodes
        or len(offsets_all) > max_halo_offsets
        or sum(halo_all) >= n_send_local * max(P_ - 1, 1)
    )
    offsets = () if use_all_gather else offsets_all
    halo_sizes = () if use_all_gather else halo_all

    strategy = "all_gather" if use_all_gather else "halo"
    ext_size = (
        n_send_local * P_
        if use_all_gather
        else n_send_local + sum(halo_sizes)
    )

    # Extended-space id of each sender + local receiver, receiver-sorted
    # per shard (blocked-CSR order requires sorted receivers).
    base = {
        d: n_send_local + sum(halo_sizes[:i])
        for i, d in enumerate(offsets)
    }
    shard_edges: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for s in range(P_):
        sel = per_shard[s]
        u = senders[sel]
        t = shard_of_sender[sel]
        local_ids = (u - t * n_send_local).astype(np.int64)
        if use_all_gather:
            ext = u  # global padded id == t * n_send_local + local
        else:
            ext = np.where(t == s, local_ids, -1)
            for d in offsets:
                rows = needs.get((s, d))
                if rows is None:
                    continue
                in_d = t == s + d
                pos = np.searchsorted(rows, local_ids[in_d])
                ext_d = base[d] + pos
                ext[in_d] = ext_d
            assert (ext >= 0).all(), f"unmapped sender in {name}"
        local_r = (receivers[sel] - s * n_rec_local).astype(np.int64)
        order = np.argsort(local_r, kind="stable")
        shard_edges.append(
            (
                ext[order],
                local_r[order],
                features[sel][order] if features is not None else None,
            )
        )

    # Per-shard receiver-sorted blocked layouts, padded to one static
    # chunk count so a single traced program serves every shard.
    layouts = [
        build_blocked_layout(locr, n_rec_local)
        for _, locr, _ in shard_edges
    ]
    n_chunks = max(int(l.chunk_block.shape[0]) for l in layouts)
    layouts = [pad_blocked_layout(l, n_chunks) for l in layouts]
    e_blocked = layouts[0].num_blocked

    snd = np.zeros((P_, e_blocked), dtype=np.int32)
    rcv = np.full((P_, e_blocked), n_rec_local, dtype=np.int32)
    local_ids_tbl = np.full((P_, 1, e_blocked), -1, dtype=np.int32)
    chunk_block_tbl = np.zeros((P_, n_chunks), dtype=np.int32)
    fts = None
    if features is not None:
        fts = np.zeros(
            (P_, e_blocked) + features.shape[1:], dtype=np.float32
        )
    counts = np.zeros((P_, n_rec_local), dtype=np.int32)
    for s in range(P_):
        lay = layouts[s]
        ext_s, locr_s, f_s = shard_edges[s]
        dead = lay.perm < 0
        safe = np.where(dead, 0, lay.perm)
        if len(ext_s):
            snd[s] = np.where(dead, 0, ext_s[safe]).astype(np.int32)
            rcv[s] = np.where(dead, n_rec_local, locr_s[safe]).astype(
                np.int32
            )
            if fts is not None:
                fts[s][~dead] = f_s[lay.perm[~dead]]
        local_ids_tbl[s, 0] = np.asarray(lay.local_ids)[0]
        chunk_block_tbl[s] = np.asarray(lay.chunk_block)
        counts[s] = np.bincount(locr_s, minlength=n_rec_local)

    # Sender side, preferred machinery: per-shard BANDED visit tables
    # over the extended (local + halo) sender space — the forward
    # gather and its scatter-add gradient both run as Pallas one-hot
    # matmuls (same kernels as the replicated model), with the visit
    # tables threaded in dynamically. Built only when EVERY shard's
    # sender structure is banded enough (one traced body serves all
    # shards, so the routing must be uniform).
    bandeds = None
    if os.environ.get("NEURAL_LAM_TPU_BANDED", "auto") != "off":
        cands = []
        for s in range(P_):
            dead = layouts[s].perm < 0
            cands.append(
                build_banded_layout(
                    np.where(dead, -1, snd[s].astype(np.int64)),
                    ext_size,
                    layouts[0].chunk_edges,
                )
            )
        if all(c is not None for c in cands):
            n_gv = max(int(c.gvisit_chunk.shape[0]) for c in cands)
            n_sv = max(int(c.svisit_chunk.shape[0]) for c in cands)
            bandeds = [pad_banded_layout(c, n_gv, n_sv) for c in cands]

    tbl = {
        "senders": snd,
        "recv_local": rcv,
        "counts": counts,
        "chunk_block": chunk_block_tbl,
        "local_ids": local_ids_tbl,
    }

    if bandeds is not None:
        send_layout = None
        for key, field in (
            ("bg_group", "gvisit_chunk"),
            ("bg_other", "gvisit_window"),
            ("bg_ids", "gvisit_ids"),
            ("bs_group", "svisit_window"),
            ("bs_other", "svisit_chunk"),
            ("bs_ids", "svisit_ids"),
        ):
            tbl[key] = np.stack(
                [np.asarray(getattr(c, field)) for c in bandeds]
            )
    else:
        # Fallback: sender-sorted layouts over valid slots — the
        # gradient scatter-add runs through the blocked segment-sum
        # kernel (XLA lowers scatter to a serial loop on TPU), but the
        # forward stays an XLA row gather plus a slot permutation.
        send_layouts = []
        valid_sorted = []
        for s in range(P_):
            dead = layouts[s].perm < 0
            valid_slots = np.nonzero(~dead)[0]
            sv = snd[s][valid_slots].astype(np.int64)
            ssort = np.argsort(sv, kind="stable")
            send_layouts.append(build_blocked_layout(sv[ssort], ext_size))
            valid_sorted.append(valid_slots[ssort])
        n_schunks = max(int(l.chunk_block.shape[0]) for l in send_layouts)
        send_layouts = [
            pad_blocked_layout(l, n_schunks) for l in send_layouts
        ]
        e_sblocked = send_layouts[0].num_blocked
        rslot = np.full((P_, e_sblocked), e_blocked, dtype=np.int32)
        s_local_ids = np.full((P_, 1, e_sblocked), -1, dtype=np.int32)
        s_chunk_block = np.zeros((P_, n_schunks), dtype=np.int32)
        for s in range(P_):
            sl = send_layouts[s]
            sdead = sl.perm < 0
            ssafe = np.where(sdead, 0, sl.perm)
            if len(valid_sorted[s]):
                rslot[s] = np.where(
                    sdead, e_blocked, valid_sorted[s][ssafe]
                ).astype(np.int32)
            s_local_ids[s, 0] = np.asarray(sl.local_ids)[0]
            s_chunk_block[s] = np.asarray(sl.chunk_block)
        send_layout = send_layouts[0]
        tbl["rslot"] = rslot
        tbl["s_chunk_block"] = s_chunk_block
        tbl["s_local_ids"] = s_local_ids

    meta = EdgeMeta(
        name=name,
        n_shards=P_,
        n_rec_local=n_rec_local,
        n_send_local=n_send_local,
        strategy=strategy,
        offsets=offsets,
        halo_sizes=halo_sizes,
        e_max=e_blocked,
        layout=layouts[0],
        send_layout=send_layout,
        banded=bandeds[0] if bandeds is not None else None,
    )
    if fts is not None:
        tbl["features"] = fts
    for d, h in zip(offsets, halo_sizes):
        rows_tbl = np.zeros((P_, h), dtype=np.int32)
        for t in range(P_):
            rows = needs.get(((t - d) % P_, d))
            if rows is not None:
                rows_tbl[t, : len(rows)] = rows
        tbl[f"rows_{d}"] = rows_tbl
    return meta, tbl


def _valid_edges(pe):
    """Strip interspersed padding from a PaddedEdges bundle."""
    r = np.asarray(pe.edges.receivers)
    s = np.asarray(pe.edges.senders)
    f = np.asarray(pe.features)
    keep = r < pe.edges.num_rec
    return s[keep].astype(np.int64), r[keep].astype(np.int64), f[keep]


# ---------------------------------------------------------------------------
# device-side local views
# ---------------------------------------------------------------------------
class LocalPE:
    """Shard-local stand-in for a PaddedEdges bundle."""

    def __init__(self, meta: EdgeMeta, tbl: dict):
        self.meta = meta
        self.tbl = tbl
        self.features = tbl.get("features")


class LocalCombinedPE:
    """Shard-local stand-in for HiLAMParallel's combined edge set."""

    def __init__(self, sections, level_sizes_local, sender_levels,
                 recv_levels):
        self.sections = sections  # list[LocalPE]
        self.level_sizes_local = level_sizes_local
        self.sender_levels = sender_levels
        self.recv_levels = recv_levels


class _LocalGraphView:
    """GraphBuffers-shaped object backed by shard-local tables."""

    def __init__(self, hierarchical, g2m, m2g, m2m, up, down,
                 mesh_static_features):
        self.hierarchical = hierarchical
        self.g2m = g2m
        self.m2g = m2g
        self.m2m = m2m
        self.up = up
        self.down = down
        self.mesh_static_features = mesh_static_features


def _exchange(x, pe: LocalPE, axis: str):
    """Deliver the extended (local + halo) sender array for one edge
    set: neighbor-only ``ppermute`` rounds, or one ``all_gather`` for
    small sender sets."""
    meta = pe.meta
    if meta.strategy == "all_gather":
        return jax.lax.all_gather(x, axis, tiled=True)
    parts = [x]
    P_ = meta.n_shards
    for d in meta.offsets:
        payload = x[pe.tbl[f"rows_{d}"]]
        # receiver s consumes rows owned by shard s + d, so every
        # source t routes its payload to t - d
        perm = [(t, (t - d) % P_) for t in range(P_)]
        parts.append(jax.lax.ppermute(payload, axis, perm))
    return jnp.concatenate(parts, axis=0)


def _bcast_batch(arrs, ref=()):
    """Broadcast unbatched (N, d) arrays to the common (N, B, d) layout
    (shared with apply_interaction_net); ``ref`` arrays only contribute
    batch-size detection."""
    return broadcast_to_batch(arrs, ref=ref)


def _seg_sum_local(messages, recv_local, n_rec_local):
    out = jax.ops.segment_sum(
        messages, recv_local, num_segments=n_rec_local + 1
    )
    return out[:n_rec_local]


def _make_sharded_sender_gather(meta: EdgeMeta):
    """Differentiable ``x_ext[senders]`` whose backward runs the blocked
    segment-sum kernel over the (dynamically threaded) per-shard
    sender-sorted layout — XLA would lower the scatter-add of the plain
    gather's VJP to a serial update loop. The per-shard index arrays
    are primal args (float0 cotangents); created fresh per trace, never
    cached across jits."""
    send_layout = meta.send_layout
    interpret = _interpret_mode()

    @jax.custom_vjp
    def gather(x, senders, rslot, s_cb, s_ids):
        return x[senders]

    def fwd(x, senders, rslot, s_cb, s_ids):
        return x[senders], (x.shape[0], senders, rslot, s_cb, s_ids)

    def bwd(res, g):
        rows, senders, rslot, s_cb, s_ids = res
        g2d = g.reshape(g.shape[0], -1)
        # Dead sender-sorted slots map one past the end; clamp — their
        # one-hot (s_ids == -1) drops them in the kernel anyway.
        safe = jnp.minimum(rslot, g2d.shape[0] - 1)
        grad_sorted = g2d[safe]
        d_nodes = blocked_segment_sum_nondiff(
            grad_sorted,
            send_layout,
            interpret,
            out_dtype=jnp.float32,
            dyn=(s_cb, s_ids),
        )[:rows]
        d_nodes = d_nodes.reshape((rows,) + g.shape[1:]).astype(g.dtype)
        f0 = lambda a: np.zeros(  # noqa: E731
            a.shape, dtype=jax.dtypes.float0
        )
        return d_nodes, f0(senders), f0(rslot), f0(s_cb), f0(s_ids)

    gather.defvjp(fwd, bwd)
    return gather


def _make_sharded_banded_gather(meta: EdgeMeta, io_dtype=jnp.float32):
    """Differentiable extended-space sender gather riding the banded
    Pallas kernels in BOTH directions: forward = banded expand (per-
    (chunk, window) one-hot matmuls), backward = banded scatter — no
    XLA row gather on edge-wide arrays, no sender-sorted gradient
    materialisation. Per-shard visit tables arrive as data (float0
    cotangents); created fresh per trace, never cached across jits.

    Accepts the common node-major batched ``(N, B, d)`` layout by
    folding the batch into lanes (free reshape), casting through
    ``io_dtype`` like the replicated ``gather_senders`` path.
    """
    banded = meta.banded
    interpret = _interpret_mode()

    @jax.custom_vjp
    def gather(x2, bg_group, bg_other, bg_ids, bs_group, bs_other, bs_ids):
        return banded_expand_nondiff(
            x2, banded, interpret, dyn=(bg_group, bg_other, bg_ids)
        )

    def fwd(x2, bg_group, bg_other, bg_ids, bs_group, bs_other, bs_ids):
        y = gather(
            x2, bg_group, bg_other, bg_ids, bs_group, bs_other, bs_ids
        )
        g_shapes = (bg_group.shape, bg_other.shape, bg_ids.shape)
        return y, (x2.shape[0], g_shapes, bs_group, bs_other, bs_ids)

    def bwd(res, g):
        rows, g_shapes, bs_group, bs_other, bs_ids = res
        d_nodes = banded_scatter_nondiff(
            g,
            banded,
            interpret,
            out_dtype=jnp.float32,
            dyn=(bs_group, bs_other, bs_ids),
        )
        if d_nodes.shape[0] != rows:
            # ValueError (not assert): vanishes under python -O and the
            # grad would silently misalign with the sender rows.
            raise ValueError(
                f"banded scatter rows {d_nodes.shape[0]} != sender rows "
                f"{rows}"
            )
        f0 = lambda shape: np.zeros(  # noqa: E731
            shape, dtype=jax.dtypes.float0
        )
        return (
            d_nodes.astype(g.dtype),
            f0(g_shapes[0]), f0(g_shapes[1]), f0(g_shapes[2]),
            f0(bs_group.shape), f0(bs_other.shape), f0(bs_ids.shape),
        )

    gather.defvjp(fwd, bwd)

    def wrapped(x, tables):
        dtype = x.dtype
        xc = x.astype(io_dtype) if dtype != io_dtype else x
        if xc.ndim == 3:
            r, b, d = xc.shape
            out = gather(xc.reshape(r, b * d), *tables)
            out = out.reshape(out.shape[0], b, d)
        else:
            out = gather(xc, *tables)
        return out.astype(dtype) if out.dtype != dtype else out

    return wrapped


def _sharded_sender_gather(meta: EdgeMeta, tbl: dict, x_ext):
    """Per-edge sender rows for the fused kernel path: banded Pallas
    gather when the edge set built banded tables, else the XLA gather
    whose backward rides the blocked segment-sum kernel."""
    if meta.banded is not None:
        gather = _make_sharded_banded_gather(
            meta, _gather_io_dtype(x_ext.dtype)
        )
        return gather(
            x_ext,
            (
                tbl["bg_group"], tbl["bg_other"], tbl["bg_ids"],
                tbl["bs_group"], tbl["bs_other"], tbl["bs_ids"],
            ),
        )
    gather = _make_sharded_sender_gather(meta)
    return gather(
        x_ext,
        tbl["senders"],
        tbl["rslot"],
        tbl["s_chunk_block"],
        tbl["s_local_ids"],
    )


def _use_fused_sharded(net_params, meta, send_rep, rec_rep, edge_rep):
    """Route a whole sharded interaction step through the fused kernel
    when the configuration matches what it implements. Eligibility is
    the ops layer's own predicate (EdgeMeta carries ``.layout`` like an
    EdgeSet, the only attribute it reads)."""
    if len(net_params["edge"]) != 1 or len(net_params["aggr"]) != 1:
        return False
    return fused_edge_phase_supported(
        net_params["edge"][0], meta, send_rep, rec_rep, edge_rep
    )


def _sharded_interaction(
    pe: LocalPE,
    net_params: dict,
    send_rep,
    rec_rep,
    edge_rep,
    axis: str,
    aggr: str = "sum",
    update_edges: bool = True,
    propagation: bool = False,
    edge_chunk_sizes=None,
    aggr_chunk_sizes=None,
    edge_embedder=None,
):
    """One message-passing step on shard-local slabs; semantics identical
    to ``apply_interaction_net`` (reference: neural_lam/gnn_layers.py:
    15-250), with a halo exchange delivering cross-shard senders.

    When the configuration matches the fused Pallas kernel (single
    2-layer edge MLP at uniform hidden width), the edge phase runs
    through the SAME ``make_fused_interaction`` kernel as the replicated
    model, with the per-shard blocked-layout index arrays threaded in
    dynamically — so sharded grid-points/s rides the fused step, not the
    segment-sum fallback. ``edge_embedder`` (with ``edge_rep=None``)
    runs the static edge-feature embedder inside the kernel on the
    shard-local features when fusable, exactly like the replicated
    default path; otherwise it is applied up-front — identical math."""
    if propagation:
        aggr = "mean"
    meta = pe.meta
    tbl = pe.tbl
    x_ext = _exchange(send_rep, pe, axis)

    use_fused = _use_fused_sharded(
        net_params, meta, send_rep, rec_rep, edge_rep
    )
    embed_in_kernel = False
    if edge_embedder is not None:
        assert edge_rep is None
        hidden = send_rep.shape[-1]
        embed_in_kernel = (
            use_fused
            and os.environ.get("NEURAL_LAM_TPU_FUSED_EMBED", "on")
            != "off"
            and _embedder_fusable(edge_embedder, hidden)
        )
        if not embed_in_kernel:
            edge_rep = apply_mlp(edge_embedder, pe.features)

    if use_fused:
        # broadcast at node level (local + halo rows), not edge level
        ref = [edge_rep] if edge_rep is not None else []
        x_ext, rec_rep = _bcast_batch([x_ext, rec_rep], ref=ref)
        if (
            not propagation
            and meta.banded is not None
            and fused_v2_routed(
                meta.e_max,
                meta.ext_size
                + meta.layout.num_blocks * meta.layout.block_rows,
            )
        ):
            # v2: the banded gather runs INSIDE the kernel (visit-major
            # prologue) on the extended local+halo sender array; the
            # per-shard visit tables thread in as data alongside the
            # blocked-layout index arrays.
            fused = make_fused_interaction_v2(
                meta.layout,
                meta.banded,
                update_edges=update_edges,
                interpret=_interpret_mode(),
            )
            aggregated, new_edge = fused(
                net_params["edge"][0],
                edge_rep,
                x_ext,
                rec_rep,
                emb_params=(edge_embedder if embed_in_kernel else None),
                edge_feats=(pe.features if embed_in_kernel else None),
                dyn_layout=(tbl["chunk_block"], tbl["local_ids"]),
                dyn_banded=(
                    tbl["bg_group"], tbl["bg_other"], tbl["bg_ids"],
                    tbl["bs_group"], tbl["bs_other"], tbl["bs_ids"],
                ),
            )
        else:
            x_send = _sharded_sender_gather(meta, tbl, x_ext)
            fused = make_fused_interaction(
                meta.layout,
                update_edges=update_edges,
                propagation=propagation,
                interpret=_interpret_mode(),
            )
            aggregated, new_edge = fused(
                net_params["edge"][0],
                edge_rep,
                x_send,
                rec_rep,
                emb_params=(edge_embedder if embed_in_kernel else None),
                edge_feats=(pe.features if embed_in_kernel else None),
                dyn_layout=(tbl["chunk_block"], tbl["local_ids"]),
            )
        if aggr == "mean":
            counts = jnp.maximum(tbl["counts"], 1).astype(
                aggregated.dtype
            )
            aggregated = aggregated / counts.reshape(
                (-1,) + (1,) * (aggregated.ndim - 1)
            )
        rec_rep_b, _ = _bcast_batch([rec_rep, aggregated])
        rec_diff = apply_mlp_split_first(
            net_params["aggr"][0], (rec_rep_b, aggregated)
        )
        residual_base = aggregated if propagation else rec_rep_b
        new_rec = residual_base + rec_diff
        if update_edges:
            return new_rec, new_edge
        return new_rec

    x_send = x_ext[pe.tbl["senders"]]
    x_rec = rec_rep[jnp.minimum(pe.tbl["recv_local"], meta.n_rec_local - 1)]
    x_send, x_rec, edge_rep_b = _bcast_batch([x_send, x_rec, edge_rep])
    if len(net_params["edge"]) == 1:
        messages = apply_mlp_split_first(
            net_params["edge"][0], (edge_rep_b, x_send, x_rec)
        )
    else:
        messages = _apply_chunked(
            net_params["edge"],
            jnp.concatenate([edge_rep_b, x_send, x_rec], axis=-1),
            edge_chunk_sizes,
        )
    if propagation:
        messages = x_send + messages

    aggregated = _seg_sum_local(
        messages, pe.tbl["recv_local"], meta.n_rec_local
    )
    if aggr == "mean":
        counts = jnp.maximum(pe.tbl["counts"], 1).astype(aggregated.dtype)
        aggregated = aggregated / counts.reshape(
            (-1,) + (1,) * (aggregated.ndim - 1)
        )
    rec_rep_b, _ = _bcast_batch([rec_rep, aggregated])
    rec_diff = _apply_chunked(
        net_params["aggr"],
        jnp.concatenate([rec_rep_b, aggregated], axis=-1),
        aggr_chunk_sizes,
    )
    residual_base = aggregated if propagation else rec_rep_b
    new_rec = residual_base + rec_diff
    if update_edges:
        return new_rec, edge_rep_b + messages
    return new_rec


def _sharded_combined(
    pe: LocalCombinedPE,
    net_params: dict,
    mesh_rep,
    edge_rep,
    axis: str,
    aggr: str,
    update_edges: bool,
    edge_chunk_sizes,
):
    """HiLAMParallel's fused multi-level step on local slabs: one
    chunked edge MLP per section, aggregation summed into the local
    flattened node space, chunked per-level node MLPs
    (reference: hi_lam_parallel.py:147-209 + gnn_layers.py:275-325).

    Every section owns exactly one edge MLP, so each section's edge
    phase rides the fused Pallas kernel independently when eligible
    (same routing as ``_sharded_interaction``)."""
    assert aggr == "sum", "combined mesh processing uses sum aggregation"
    level_sizes = pe.level_sizes_local
    level_offsets = np.concatenate([[0], np.cumsum(level_sizes)])
    sec_offsets = np.concatenate([[0], np.cumsum(edge_chunk_sizes)])

    def level_slice(arr, lev):
        return arr[level_offsets[lev] : level_offsets[lev + 1]]

    agg_levels = [None] * len(level_sizes)
    new_edge_secs = []
    for k, sec in enumerate(pe.sections):
        e_rep = edge_rep[sec_offsets[k] : sec_offsets[k + 1]]
        send = level_slice(mesh_rep, pe.sender_levels[k])
        rec = level_slice(mesh_rep, pe.recv_levels[k])
        x_ext = _exchange(send, sec, axis)
        if fused_edge_phase_supported(
            net_params["edge"][k], sec.meta, send, rec, e_rep
        ):
            tbl = sec.tbl
            x_ext, rec_b = _bcast_batch([x_ext, rec], ref=[e_rep])
            if sec.meta.banded is not None and fused_v2_routed(
                sec.meta.e_max,
                sec.meta.ext_size
                + sec.meta.layout.num_blocks
                * sec.meta.layout.block_rows,
            ):
                fused = make_fused_interaction_v2(
                    sec.meta.layout,
                    sec.meta.banded,
                    update_edges=update_edges,
                    interpret=_interpret_mode(),
                )
                agg, new_e = fused(
                    net_params["edge"][k],
                    e_rep,
                    x_ext,
                    rec_b,
                    dyn_layout=(tbl["chunk_block"], tbl["local_ids"]),
                    dyn_banded=(
                        tbl["bg_group"], tbl["bg_other"], tbl["bg_ids"],
                        tbl["bs_group"], tbl["bs_other"], tbl["bs_ids"],
                    ),
                )
            else:
                x_send = _sharded_sender_gather(sec.meta, tbl, x_ext)
                fused = make_fused_interaction(
                    sec.meta.layout,
                    update_edges=update_edges,
                    propagation=False,
                    interpret=_interpret_mode(),
                )
                agg, new_e = fused(
                    net_params["edge"][k],
                    e_rep,
                    x_send,
                    rec_b,
                    dyn_layout=(tbl["chunk_block"], tbl["local_ids"]),
                )
            if update_edges:
                new_edge_secs.append(new_e)
        else:
            x_send = x_ext[sec.tbl["senders"]]
            x_rec = rec[
                jnp.minimum(
                    sec.tbl["recv_local"], sec.meta.n_rec_local - 1
                )
            ]
            x_send, x_rec, e_rep = _bcast_batch([x_send, x_rec, e_rep])
            messages = apply_mlp_split_first(
                net_params["edge"][k], (e_rep, x_send, x_rec)
            )
            agg = _seg_sum_local(
                messages, sec.tbl["recv_local"], sec.meta.n_rec_local
            )
            if update_edges:
                new_edge_secs.append(e_rep + messages)
        lev = pe.recv_levels[k]
        agg_levels[lev] = (
            agg if agg_levels[lev] is None else agg_levels[lev] + agg
        )
    aggregated = jnp.concatenate(agg_levels, axis=0)
    rec_diff = _apply_chunked(
        net_params["aggr"],
        jnp.concatenate([mesh_rep, aggregated], axis=-1),
        list(level_sizes),
    )
    new_rep = mesh_rep + rec_diff
    if update_edges:
        return new_rep, jnp.concatenate(new_edge_secs, axis=0)
    return new_rep


# ---------------------------------------------------------------------------
# the executor
# ---------------------------------------------------------------------------
class ShardedModel:
    """Spatially sharded execution of any :class:`BaseGraphModel`.

    Parameters stay replicated; node arrays shard over the ``spatial``
    mesh axis and the batch over ``data``. Inside ``shard_map`` the
    executor builds a local view of the model and runs the model's own
    ``step``/rollout code, so single-chip and sharded runs share one
    implementation of the math (sharded == replicated is asserted by
    tests for every model family).
    """

    def __init__(
        self,
        model: BaseGraphModel,
        datastore,
        mesh: Mesh,
        all_gather_max_nodes: int = 2048,
        max_halo_offsets: int = 8,
    ) -> None:
        assert "spatial" in mesh.axis_names, "mesh needs a 'spatial' axis"
        self.model = model
        self.mesh = mesh
        self.axis = "spatial"
        P_ = self.n_shards = mesh.shape["spatial"]
        g = model.graph

        n_grid = g.num_grid_nodes
        level_sizes = list(g.level_mesh_sizes)
        self.n_grid = n_grid
        # Exact ceil slabs (no tile rounding): all node sets are x-major
        # ordered, so equal-fraction slabs keep the sets spatially
        # aligned across shards and the halo offsets small; padding an
        # individual slab would drift the sets apart and blow up halos.
        self.n_grid_local = -(-n_grid // P_)
        self.n_grid_pad = self.n_grid_local * P_
        self.level_local = [-(-n // P_) for n in level_sizes]
        self.level_pad = [n * P_ for n in self.level_local]

        def build(name, pe, n_send_global, n_send_local, n_rec_local):
            s, r, f = _valid_edges(pe)
            return _build_edge_table(
                name, s, r, f, n_send_global, n_send_local, n_rec_local,
                P_, all_gather_max_nodes, max_halo_offsets,
            )

        self.metas: dict[str, EdgeMeta] = {}
        tables: dict[str, dict] = {}

        def add(name, meta_tbl):
            meta, tbl = meta_tbl
            self.metas[name] = meta
            tables[name] = tbl

        add("g2m", build("g2m", g.g2m, n_grid, self.n_grid_local,
                         self.level_local[0]))
        add("m2g", build("m2g", g.m2g, level_sizes[0],
                         self.level_local[0], self.n_grid_local))
        for lev, pe in enumerate(g.m2m):
            add(f"m2m{lev}", build(
                f"m2m{lev}", pe, level_sizes[lev], self.level_local[lev],
                self.level_local[lev],
            ))
        for lev, pe in enumerate(g.up):
            add(f"up{lev}", build(
                f"up{lev}", pe, level_sizes[lev], self.level_local[lev],
                self.level_local[lev + 1],
            ))
        for lev, pe in enumerate(g.down):
            add(f"down{lev}", build(
                f"down{lev}", pe, level_sizes[lev + 1],
                self.level_local[lev + 1], self.level_local[lev],
            ))

        # node tables: (P, n_local, d) slabs. Keep the model's compute
        # dtype (bf16 mixed precision would otherwise be silently promoted
        # back to f32 through the concat with these slabs).
        slab_dtype = np.dtype(model.compute_dtype)

        def slab(arr, n_local, n_global):
            arr = np.asarray(arr).astype(slab_dtype)
            out = np.zeros(
                (n_local * P_,) + arr.shape[1:], slab_dtype
            )
            out[:n_global] = arr
            return out.reshape((P_, n_local) + arr.shape[1:])

        tables["grid_static"] = slab(
            model.grid_static_features, self.n_grid_local, n_grid
        )
        for lev, m in enumerate(g.mesh_static_features):
            tables[f"mesh_static{lev}"] = slab(
                m, self.level_local[lev], level_sizes[lev]
            )
        boundary = np.ones((self.n_grid_pad, 1), np.float32)
        boundary[:n_grid, 0] = np.asarray(
            datastore.boundary_mask.data
        ).reshape(-1)
        interior = np.zeros((self.n_grid_pad, 1), np.float32)
        interior[:n_grid, 0] = 1.0 - boundary[:n_grid, 0]
        tables["boundary_mask"] = boundary.reshape(P_, self.n_grid_local, 1)
        tables["interior_mask"] = interior.reshape(P_, self.n_grid_local, 1)
        self.n_interior = int(interior.sum())
        self._host_tables = tables
        self._tables_cache = None

        # standardization stats (reference: module.py:289-337)
        stats = datastore.get_standardization_dataarray(category="state")
        eps = np.finfo(np.float32).eps
        self.state_mean = jnp.asarray(
            np.asarray(stats["state_mean"], np.float32)
        )
        self.state_std = jnp.asarray(
            np.maximum(np.asarray(stats["state_std"], np.float32), eps)
        )
        # Guard like the trainer: stores without a forcing category raise
        # on the stats lookup (reference: module.py:183).
        if datastore.get_num_data_vars("forcing") > 0:
            f_stats = datastore.get_standardization_dataarray(
                category="forcing"
            )
        else:
            f_stats = {}
        self._forcing_mean_raw = np.asarray(
            f_stats.get("forcing_mean", np.zeros(0)), np.float32
        )
        self._forcing_std_raw = np.maximum(
            np.asarray(f_stats.get("forcing_std", np.ones(0)), np.float32),
            eps,
        )

    # -- sharding helpers --------------------------------------------------
    def node_sharding(self) -> NamedSharding:
        """(B, T?, N_pad, d) arrays: batch over data, nodes over
        spatial."""
        return NamedSharding(self.mesh, P("data", None, "spatial", None))

    def pad_grid(self, arr: np.ndarray) -> np.ndarray:
        """Zero-pad the grid-node axis (-2) to ``n_grid_pad``."""
        pad = self.n_grid_pad - arr.shape[-2]
        if pad == 0:
            return arr
        widths = [(0, 0)] * (arr.ndim - 2) + [(0, pad), (0, 0)]
        return np.pad(np.asarray(arr), widths)

    def tables(self):
        """Device-put the stacked tables, shard-axis partitioned."""
        if self._tables_cache is None:
            shard0 = NamedSharding(self.mesh, P("spatial"))
            self._tables_cache = jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), shard0),
                self._host_tables,
            )
        return self._tables_cache

    def table_specs(self):
        return jax.tree_util.tree_map(
            lambda _: P("spatial"), self._host_tables
        )

    # -- local model view --------------------------------------------------
    def _local_model(self, tbl: dict) -> BaseGraphModel:
        """Shallow model copy whose graph/buffers/gnn_apply act on the
        shard-local slab (called inside shard_map on localized
        tables)."""
        axis = self.axis

        def local_pe(name):
            return LocalPE(self.metas[name], tbl[name])

        g = self.model.graph
        view = _LocalGraphView(
            hierarchical=g.hierarchical,
            g2m=local_pe("g2m"),
            m2g=local_pe("m2g"),
            m2m=tuple(local_pe(f"m2m{i}") for i in range(len(g.m2m))),
            up=tuple(local_pe(f"up{i}") for i in range(len(g.up))),
            down=tuple(local_pe(f"down{i}") for i in range(len(g.down))),
            mesh_static_features=tuple(
                tbl[f"mesh_static{i}"]
                for i in range(len(g.mesh_static_features))
            ),
        )

        local = copy.copy(self.model)
        local.graph = view
        local.grid_static_features = tbl["grid_static"]
        # the sharded executors index local node arrays by exact local
        # row counts — block-padded residency must stay off here
        local.padded_residency = False
        # model-level fused fast paths (HiLAMParallel per-section step)
        # must defer to the sharded gnn_apply below
        local._sharded_view = True

        def gnn_apply(net_params, pe, send_rep, rec_rep, edge_rep,
                      aggr="sum", update_edges=True, propagation=False,
                      edge_chunk_sizes=None, aggr_chunk_sizes=None,
                      edge_embedder=None):
            if isinstance(pe, LocalCombinedPE):
                if edge_embedder is not None:
                    # Combined sets carry no single feature array
                    # (HiLAMParallel embeds per-section features up
                    # front, models/hi_lam_parallel.py) — mirror the
                    # replicated _CombinedEdges contract explicitly
                    # instead of AttributeError-ing on pe.features.
                    raise ValueError(
                        "edge_embedder is not supported for combined "
                        "edge sets; embed per-section features before "
                        "the combined gnn_apply"
                    )
                return _sharded_combined(
                    pe, net_params, send_rep, edge_rep, axis,
                    aggr, update_edges, edge_chunk_sizes,
                )
            # edge_embedder defers to _sharded_interaction, which runs
            # it inside the fused kernel when possible (identical math
            # to embedding up-front)
            return _sharded_interaction(
                pe, net_params, send_rep, rec_rep, edge_rep, axis,
                aggr=aggr, update_edges=update_edges,
                propagation=propagation,
                edge_chunk_sizes=edge_chunk_sizes,
                aggr_chunk_sizes=aggr_chunk_sizes,
                edge_embedder=edge_embedder,
            )

        local.gnn_apply = gnn_apply

        if hasattr(local, "_total_pe"):  # HiLAMParallel
            L = len(g.m2m)
            sec_names = (
                [f"m2m{i}" for i in range(L)]
                + [f"up{i}" for i in range(L - 1)]
                + [f"down{i}" for i in range(L - 1)]
            )
            # section -> level wiring comes from the model itself (one
            # source of truth with the replicated per-section step)
            local._total_pe = LocalCombinedPE(
                [local_pe(n) for n in sec_names],
                list(self.level_local),
                list(self.model._section_send_levels),
                list(self.model._section_recv_levels),
            )
            local.edge_split_sections = [
                self.metas[n].e_max for n in sec_names
            ]
        if hasattr(local, "level_mesh_sizes"):
            local.level_mesh_sizes = list(self.level_local)
        return local

    def _local_forecaster(self, forecaster, tbl: dict):
        local = copy.copy(forecaster)
        local.predictor = self._local_model(tbl)
        local.boundary_mask = tbl["boundary_mask"]
        local.interior_mask = 1.0 - tbl["boundary_mask"]
        return local

    # -- standardization ---------------------------------------------------
    def _standardize(self, init, target, forcing):
        # KEEP IN SYNC with Trainer.standardize_batch +
        # Trainer._tiled_forcing_stats (trainer.py): same eps-clamped
        # stats (loaded identically in __init__) and the same
        # feature-major window repeat — a change on one side only would
        # silently make sharded training standardize differently from
        # replicated training.
        init = (init - self.state_mean) / self.state_std
        target = (target - self.state_mean) / self.state_std
        n_f = self._forcing_mean_raw.shape[-1]
        if forcing.shape[-1] > 0 and n_f > 0:
            window = forcing.shape[-1] // n_f
            f_mean = jnp.asarray(np.repeat(self._forcing_mean_raw, window))
            f_std = jnp.asarray(np.repeat(self._forcing_std_raw, window))
            forcing = (forcing - f_mean) / f_std
        return init, target, forcing

    def _masked_metric(
        self, entry_fn, pred, target, pred_std, tbl, sum_vars=True
    ):
        """Interior-masked grid mean (+ optional var sum) per
        (sample, step), with a psum over spatial shards: the sharded
        equivalent of ``loss_fn(..., mask=interior, average_grid,
        sum_vars)`` (reference: models/module.py:379-386)."""
        m = tbl["interior_mask"][:, 0][None, None, :, None]
        # double-where like metrics._sanitize_masked_inputs: NaN-filled
        # exterior targets would otherwise produce entry = NaN and
        # NaN * 0 = NaN in both the value and the gradients
        target = jnp.where(m > 0, target, 0.0)
        pred = jnp.where(m > 0, pred, 0.0)
        if jnp.ndim(pred_std) == jnp.ndim(pred):
            pred_std = jnp.where(m > 0, pred_std, 1.0)
        entry = entry_fn(pred, target, pred_std)  # (B, T, N_loc, d)
        masked = entry * m
        sums = jnp.sum(masked, axis=-2)  # (B, T, d)
        sums = jax.lax.psum(sums, self.axis) / self.n_interior
        if sum_vars:
            return jnp.sum(sums, axis=-1)  # (B, T)
        return sums

    def _pred_std_or(self, pred_std, per_var_std):
        return pred_std if pred_std is not None else per_var_std

    # -- steps -------------------------------------------------------------
    def make_train_step(
        self,
        forecaster,
        optimizer,
        per_var_std: Optional[jax.Array],
        loss_name: str = "wmse",
        scan_steps: Optional[int] = None,
        precision: str = "32",
        out_shardings=None,
    ):
        """Jitted sharded train step ``(params, opt_state, init, target,
        forcing) -> (params, opt_state, loss)``; batch arrays arrive
        grid-padded and sharded via :meth:`node_sharding`.
        ``out_shardings`` (params, opt_state, loss) pins ZeRO-1 moment
        placements across steps.

        ``scan_steps=k`` consumes a k-stack of batches and runs k
        sequential optimizer steps inside one executable (same contract
        as ``Trainer.make_train_step``). ``precision="bf16"`` mirrors
        the replicated step: f32 master params, bf16 compute copies
        inside the step (build the model with ``compute_dtype=bf16``)."""
        tables = self.tables()
        entry_fn = get_metric_entry(loss_name)

        def loss_local(params, tbl, init, target, forcing):
            init, target_s, forcing = self._standardize(
                init, target, forcing
            )
            if precision == "bf16":
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), params
                )
            local_fc = self._local_forecaster(forecaster, tbl)
            prediction, pred_std = local_fc.forward(
                params, init, forcing, target_s
            )
            prediction = prediction.astype(jnp.float32)
            std = self._pred_std_or(pred_std, per_var_std)
            loss = jnp.mean(
                self._masked_metric(
                    entry_fn, prediction, target_s, std, tbl
                )
            )
            return jax.lax.pmean(loss, "data")

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(),
                self.table_specs(),
                P("data", None, "spatial", None),
                P("data", None, "spatial", None),
                P("data", None, "spatial", None),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def loss_and_grad(params, tbl, init, target, forcing):
            tbl = jax.tree_util.tree_map(lambda a: a[0], tbl)
            loss, grads = jax.value_and_grad(loss_local)(
                params, tbl, init, target, forcing
            )
            # replicated params: full grad = sum over both axes (the
            # 1/D of the data pmean is already inside loss_local)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, ("spatial", "data")), grads
            )
            return loss, grads

        def train_step(params, opt_state, init, target, forcing):
            loss, grads = loss_and_grad(
                params, tables, init, target, forcing
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if scan_steps:

            def train_steps(params, opt_state, init_k, target_k,
                            forcing_k):
                def body(carry, batch):
                    p, o = carry
                    p, o, loss = train_step(p, o, *batch)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    body,
                    (params, opt_state),
                    (init_k, target_k, forcing_k),
                )
                return params, opt_state, losses

            return jax.jit(
                train_steps,
                donate_argnums=(0, 1),
                out_shardings=out_shardings,
            )

        return jax.jit(
            train_step, donate_argnums=(0, 1), out_shardings=out_shardings
        )

    def make_eval_step(
        self,
        forecaster,
        per_var_std: Optional[jax.Array],
        loss_name: str,
        val_steps_to_log: Sequence[int],
        pred_steps: int,
        watch_tables: Sequence[str] = (),
    ):
        """Jitted sharded eval step returning per-sample metrics
        (so padded eval-tail rows can be dropped by the caller),
        mirroring the replicated ``Trainer.make_eval_step``."""
        tables = self.tables()
        entry_fn = get_metric_entry(loss_name)
        steps_to_log = [s for s in val_steps_to_log if s <= pred_steps]

        def eval_local(params, tbl, init, target, forcing):
            init, target_s, forcing = self._standardize(
                init, target, forcing
            )
            local_fc = self._local_forecaster(forecaster, tbl)
            prediction, pred_std = local_fc.forward(
                params, init, forcing, target_s
            )
            std = self._pred_std_or(pred_std, per_var_std)
            time_step_loss = self._masked_metric(
                entry_fn, prediction, target_s, std, tbl
            )  # (B, T)
            out = {"loss": jnp.mean(time_step_loss, axis=-1)}
            for s in steps_to_log:
                out[f"loss_unroll{s}"] = time_step_loss[:, s - 1]
            for key in watch_tables:
                tstd = (
                    std if key == "wmae" else jnp.float32(1.0)
                )
                out[f"{key}_table"] = self._masked_metric(
                    get_metric_entry(key),
                    prediction,
                    target_s,
                    tstd,
                    tbl,
                    sum_vars=False,
                )  # (B, T, d)
            return out

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(),
                self.table_specs(),
                P("data", None, "spatial", None),
                P("data", None, "spatial", None),
                P("data", None, "spatial", None),
            ),
            out_specs=P("data"),
            check_vma=False,
        )
        def eval_step(params, tbl, init, target, forcing):
            tbl = jax.tree_util.tree_map(lambda a: a[0], tbl)
            return eval_local(params, tbl, init, target, forcing)

        return jax.jit(
            lambda params, init, target, forcing: eval_step(
                params, tables, init, target, forcing
            )
        )

    def forward(self, params, forecaster, init_states, forcing, boundary):
        """Sharded batched rollout returning the global, unpadded
        ``(prediction, pred_std | None)`` — parity tests and artifact
        evaluation."""
        tables = self.tables()
        predicts_std = forecaster.predicts_std
        out_spec = (
            (P("data", None, "spatial", None),) * 2
            if predicts_std
            else (P("data", None, "spatial", None), P())
        )

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(),
                self.table_specs(),
                P("data", None, "spatial", None),
                P("data", None, "spatial", None),
                P("data", None, "spatial", None),
            ),
            out_specs=out_spec,
            check_vma=False,
        )
        def run(params, tbl, init, forcing, boundary):
            tbl = jax.tree_util.tree_map(lambda a: a[0], tbl)
            local_fc = self._local_forecaster(forecaster, tbl)
            pred, stds = local_fc.forward(params, init, forcing, boundary)
            if stds is None:
                stds = jnp.zeros((), jnp.float32)
            return pred, stds

        pred, stds = run(params, tables, init_states, forcing, boundary)
        pred = pred[..., : self.n_grid, :]
        if predicts_std:
            return pred, stds[..., : self.n_grid, :]
        return pred, None
