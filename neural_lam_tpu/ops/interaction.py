"""Interaction/Propagation network message passing, TPU style.

Behavioural spec comes from the reference ``InteractionNet`` /
``PropagationNet`` (reference: neural_lam/gnn_layers.py:15-250):

- message  = edge_mlp(concat(edge_attr, x_sender, x_receiver))
             (+ x_sender residual for the propagation variant)
- aggregate to the receiver node set only (``num_rec = max(recv)+1``),
  sum or mean
- node update = aggr_mlp(concat(rec_rep, aggregated))
- receiver residual: rec_rep (interaction) or aggregated (propagation)
- optional edge residual update: edge_rep + message

The implementation is a pure function over parameter pytrees and a static
:class:`EdgeSet`. Edges are padded to fixed sizes and sorted by receiver at
graph-load time; padding edges aggregate into a dead segment (see
``segment.py``), so every shape is static and XLA can fuse the
gather -> MLP -> segment-sum chain.
"""

from __future__ import annotations

import dataclasses
import math
import os
import warnings
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import MLPParams, apply_mlp, apply_mlp_split_first, init_mlp
from .pallas_fused import (
    aggr_fusable,
    fusable,
    fused_aggr_enabled,
    fused_v2_routed,
    make_fused_interaction,
    make_fused_interaction_v2,
    stripe_fits,
)
from .pallas_segment import (
    BandedLayout,
    BlockedLayout,
    build_aligned_layout,
    build_banded_layout,
    build_blocked_layout,
)
from .segment import (
    _interpret_mode,
    _pallas_enabled,
    aggregate_mean,
    aggregate_sum,
    gather_receivers,
    gather_senders,
    pallas_for,
)

_PAD_MULTIPLE = 128  # lane width; keeps padded edge blocks tile-aligned


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def broadcast_to_batch(arrs, ref=()):
    """Broadcast unbatched ``(N, d)`` arrays in ``arrs`` to the common
    node-major batched layout ``(N, B, d)``, with ``B`` detected from
    any already-batched array in ``arrs`` or ``ref``. Returns ``arrs``
    unchanged when nothing is batched."""
    batched = [a for a in (*arrs, *ref) if a.ndim == 3]
    if not batched:
        return list(arrs)
    b = batched[0].shape[1]
    return [
        (
            jnp.broadcast_to(a[:, None, :], (a.shape[0], b, a.shape[-1]))
            if a.ndim == 2
            else a
        )
        for a in arrs
    ]


@dataclasses.dataclass(frozen=True, eq=False)
class EdgeSet:
    """Static, padded edge connectivity in blocked-CSR order.

    Not a pytree: models close over EdgeSets so the index arrays become
    jit-time constants. When ``layout`` is set, edges are receiver-sorted
    with dead padding slots interspersed at receiver-block boundaries
    (see ``pallas_segment.BlockedLayout``), enabling the fused Pallas
    aggregation kernel on TPU. Note interspersed padding means the raw
    ``receivers`` array is NOT globally sorted; padding rows are
    identified by ``receivers == num_rec``, never by position.
    """

    senders: jax.Array  # (E_pad,) int32; padding rows -> 0
    receivers: jax.Array  # (E_pad,) int32; padding rows -> num_rec
    recv_gather: jax.Array  # (E_pad,) int32; receivers clamped to num_rec-1
    recv_counts: jax.Array  # (num_rec,) int32 in-degree over valid edges
    num_rec: int
    num_valid: int
    sorted_by_receiver: bool
    layout: Optional[BlockedLayout] = None
    # Sender-side blocked layout, used by the Pallas custom-VJP of the
    # sender-feature gather (the gradient of a gather is a scatter-add,
    # which needs sender-sorted blocking). ``rslot_of_sslot`` maps each
    # sender-layout slot to its receiver-layout slot (num_padded = dead).
    send_layout: Optional[BlockedLayout] = None
    rslot_of_sslot: Optional[jax.Array] = None
    num_send: Optional[int] = None
    # Banded sender gather/scatter tables (preferred over send_layout:
    # no slot permutation, no sender-sorted gradient materialisation).
    banded: Optional["BandedLayout"] = None
    # Per-instance cache of compiled gather/aggregate closures built by
    # ops.segment. Living on the instance (not a module-level id()-keyed
    # dict) ties each closure's lifetime to its edge set, so a recycled
    # id() can never serve a stale closure built for a different graph.
    fn_cache: dict = dataclasses.field(
        default_factory=dict, repr=False, compare=False
    )

    @property
    def num_padded(self) -> int:
        return int(self.senders.shape[0])


def _pick_tiling(sorted_ids: np.ndarray, num_rows: int) -> dict:
    """Per-edge-set kernel tiling (measured on v5e, MEPS-size sets).

    ``block_rows=128`` halves the one-hot gather/aggregate matmul FLOPs
    vs 256 and won every sweep point; ``chunk_edges`` then trades grid
    length against padding waste from blocks whose edge count is not a
    chunk multiple (m2m-like ~9-edge receivers waste 27% at 512 but 12%
    at 256, while m2g/g2m-like degrees divide 512 nearly exactly).
    Tiny edge sets keep the defaults — their kernel time is noise.

    Opt-in (NEURAL_LAM_TPU_TILING=sweep): the sweep was measured on the
    plain fused kernel, but the production default is the in-kernel
    edge-embedder variant, whose per-chunk embedder overhead grows with
    chunk count — the full embed-fused step measured ~2 ms SLOWER with
    these tilings (8.25M vs 8.8M grid-points/s). Default keeps the
    (256, 512) tiling.
    """
    if os.environ.get("NEURAL_LAM_TPU_TILING", "default") != "sweep":
        return {}
    if num_rows <= 0 or sorted_ids.shape[0] < 4096:
        return {}
    block_rows = 128

    def padded_slots(chunk: int) -> int:
        blocks = np.bincount(
            sorted_ids // block_rows,
            minlength=-(-num_rows // block_rows),
        )
        return int(np.sum(-(-np.maximum(blocks, 1) // chunk) * chunk))

    w512, w256 = padded_slots(512), padded_slots(256)
    # 512-edge chunks halve the grid; prefer unless the waste gap is real
    chunk_edges = 512 if w512 <= 1.1 * w256 else 256
    return {"block_rows": block_rows, "chunk_edges": chunk_edges}


def make_edge_set(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_rec: Optional[int] = None,
    pad_multiple: int = _PAD_MULTIPLE,
    sort: bool = True,
    num_send: Optional[int] = None,
) -> tuple[EdgeSet, np.ndarray]:
    """Build an :class:`EdgeSet` from raw (unsorted, unpadded) indices.

    Returns the edge set and ``perm``: an ``(E_pad,)`` int64 map from
    padded slot -> original edge position, with ``-1`` marking dead
    padding slots. Apply it to per-edge feature arrays with
    :func:`pad_edge_features`.

    ``num_rec`` defaults to ``receivers.max() + 1``, matching the reference's
    convention of deriving the receiver-set size from the edge index
    (reference: neural_lam/gnn_layers.py:74).
    """
    senders = np.asarray(senders, dtype=np.int32)
    receivers = np.asarray(receivers, dtype=np.int32)
    assert senders.shape == receivers.shape and senders.ndim == 1
    num_valid = int(senders.shape[0])
    if num_rec is None:
        num_rec = int(receivers.max()) + 1 if num_valid > 0 else 0

    if sort and num_valid > 0 and num_rec > 0:
        sort_perm = np.argsort(receivers, kind="stable").astype(np.int64)
        senders_sorted = senders[sort_perm]
        receivers_sorted = receivers[sort_perm]

        # OPT-IN (NEURAL_LAM_TPU_ALIGNED=auto): uniform-degree edge
        # sets (m2g's exact 4-NN, hierarchical 1-NN down edges) get the
        # ALIGNED layout: slot positions encode the receiver row, so
        # the fused kernel drops both per-chunk one-hot matmuls
        # (receiver gather + aggregation). Measured on v5e at MEPS size
        # this is NEUTRAL at step level (m2g fused kernel alone −6%
        # fwd / −2% fwd+bwd; interleaved warm step A/B 8.44-8.66M both
        # ways — the kernels are stream-bound, not one-hot-FLOP-bound),
        # with slightly better numerics: under the TPU's
        # hardware-default matmul precision the one-hot matmuls round
        # every gathered/aggregated value to bf16, while the aligned
        # stacks/slice-sums are exact f32 (see
        # docs/performance.md "Matmul precision on TPU"). Default off
        # to keep the production step's compiled HLO (and its warm
        # persistent cache) stable for a neutral trade. The slot-ratio
        # gate (NEURAL_LAM_TPU_ALIGNED_RATIO, default 1.05) admits only
        # zero-padding sets; raising it admits padded near-uniform sets
        # (g2m at +12% slots measured ~3% SLOWER at step level —
        # dead-slot edge-MLP work outweighs the one-hot saving). The
        # aligned layout is a valid BlockedLayout for every generic
        # consumer; equivalence tests A/B the two.
        tiling = _pick_tiling(receivers_sorted, num_rec)
        layout = None
        if (
            not tiling
            and os.environ.get("NEURAL_LAM_TPU_ALIGNED", "off") != "off"
        ):
            layout = build_aligned_layout(
                receivers_sorted,
                num_rec,
                max_slot_ratio=float(
                    os.environ.get("NEURAL_LAM_TPU_ALIGNED_RATIO", "1.05")
                ),
            )
        if layout is None:
            layout = build_blocked_layout(
                receivers_sorted, num_rec, **tiling
            )
        dead = layout.perm < 0
        safe = np.where(dead, 0, layout.perm)
        perm = np.where(dead, -1, sort_perm[safe])
        senders_p = np.where(dead, 0, senders_sorted[safe]).astype(np.int32)
        receivers_p = np.where(
            dead, num_rec, receivers_sorted[safe]
        ).astype(np.int32)
        recv_counts = np.bincount(
            receivers_sorted, minlength=num_rec
        ).astype(np.int32)

        send_layout = None
        rslot_of_sslot = None
        banded = None
        if num_send is not None and num_send > 0:
            # Preferred sender-side machinery: banded gather/scatter
            # straight from receiver-sorted slots (regular meshes have
            # spatially banded senders per chunk). Falls back to the
            # sender-sorted layout + slot permutation when the sender
            # structure is not banded (build returns None) or when
            # NEURAL_LAM_TPU_BANDED=off.
            if os.environ.get("NEURAL_LAM_TPU_BANDED", "auto") != "off":
                banded = build_banded_layout(
                    np.where(dead, -1, senders_p.astype(np.int64)),
                    num_send,
                    layout.chunk_edges,
                )
        if banded is None and num_send is not None and num_send > 0:
            # Receiver-blocked slot index of every valid edge
            valid_slots = np.nonzero(~dead)[0]
            senders_valid = senders_p[valid_slots].astype(np.int64)
            ssort = np.argsort(senders_valid, kind="stable")
            send_layout = build_blocked_layout(
                senders_valid[ssort],
                num_send,
                **_pick_tiling(senders_valid[ssort], num_send),
            )
            sdead = send_layout.perm < 0
            ssafe = np.where(sdead, 0, send_layout.perm)
            rslot_of_sslot = jnp.asarray(
                np.where(
                    sdead,
                    senders_p.shape[0],  # dead -> appended zero row
                    valid_slots[ssort[ssafe]],
                ).astype(np.int32)
            )

        es = EdgeSet(
            senders=jnp.asarray(senders_p),
            receivers=jnp.asarray(receivers_p),
            recv_gather=jnp.asarray(
                np.minimum(receivers_p, max(num_rec - 1, 0)).astype(
                    np.int32
                )
            ),
            recv_counts=jnp.asarray(recv_counts),
            num_rec=num_rec,
            num_valid=num_valid,
            sorted_by_receiver=False,  # dead slots interspersed
            layout=layout,
            send_layout=send_layout,
            rslot_of_sslot=rslot_of_sslot,
            num_send=num_send,
            banded=banded,
        )
        return es, perm

    perm_base = np.arange(num_valid, dtype=np.int64)
    e_pad = max(_round_up(num_valid, pad_multiple), pad_multiple)
    pad = e_pad - num_valid
    perm = np.concatenate([perm_base, np.full(pad, -1, dtype=np.int64)])
    senders_p = np.concatenate([senders, np.zeros(pad, dtype=np.int32)])
    receivers_p = np.concatenate(
        [receivers, np.full(pad, num_rec, dtype=np.int32)]
    )
    recv_counts = np.bincount(receivers, minlength=num_rec).astype(np.int32)

    es = EdgeSet(
        senders=jnp.asarray(senders_p),
        receivers=jnp.asarray(receivers_p),
        recv_gather=jnp.asarray(
            np.minimum(receivers_p, max(num_rec - 1, 0)).astype(np.int32)
        ),
        recv_counts=jnp.asarray(recv_counts),
        num_rec=num_rec,
        num_valid=num_valid,
        sorted_by_receiver=False,
        layout=None,
    )
    return es, perm


def place_edge_features(
    features: np.ndarray, perm: np.ndarray, edge_set: EdgeSet
) -> np.ndarray:
    """Scatter original-order per-edge features into padded slot order."""
    out = np.zeros(
        (edge_set.num_padded,) + features.shape[1:], dtype=features.dtype
    )
    valid = perm >= 0
    out[valid] = features[perm[valid]]
    return out


# Parameter pytree: {"edge": [MLPParams, ...], "aggr": [MLPParams, ...]}
# Single-element lists unless chunked (SplitMLPs equivalent,
# reference: neural_lam/gnn_layers.py:275-325).
InteractionNetParams = dict


def init_interaction_net(
    rng: jax.Array,
    input_dim: int,
    hidden_layers: int = 1,
    hidden_dim: Optional[int] = None,
    num_edge_chunks: int = 1,
    num_aggr_chunks: int = 1,
    dtype: Any = jnp.float32,
) -> InteractionNetParams:
    """Initialise parameters.

    Edge MLP input is ``3 * input_dim`` (edge, sender, receiver) and the
    aggregation MLP input ``2 * input_dim`` (receiver, aggregated), as in
    the reference (neural_lam/gnn_layers.py:90-91).
    """
    if hidden_dim is None:
        hidden_dim = input_dim
    edge_bp = [3 * input_dim] + [hidden_dim] * (hidden_layers + 1)
    aggr_bp = [2 * input_dim] + [hidden_dim] * (hidden_layers + 1)
    keys = jax.random.split(rng, num_edge_chunks + num_aggr_chunks)
    edge_mlps = [
        init_mlp(keys[i], edge_bp, dtype=dtype) for i in range(num_edge_chunks)
    ]
    aggr_mlps = [
        init_mlp(keys[num_edge_chunks + i], aggr_bp, dtype=dtype)
        for i in range(num_aggr_chunks)
    ]
    return {"edge": edge_mlps, "aggr": aggr_mlps}


def _apply_chunked(
    mlps: Sequence[MLPParams],
    x: jax.Array,
    chunk_sizes: Optional[Sequence[int]],
) -> jax.Array:
    """Apply one MLP, or per-chunk MLPs along the leading (edge/node)
    axis. Chunking by leading axis covers both the unbatched ``(E, D)``
    and node-major batched ``(E, B, D)`` layouts."""
    if len(mlps) == 1:
        return apply_mlp(mlps[0], x)
    assert chunk_sizes is not None and len(chunk_sizes) == len(mlps)
    outs = []
    start = 0
    for mlp, size in zip(mlps, chunk_sizes):
        outs.append(apply_mlp(mlp, x[start : start + size]))
        start += size
    return jnp.concatenate(outs, axis=0)


def _embedder_fusable(emb_params, hidden: int) -> bool:
    """The in-kernel edge embedder supports the Linear-SiLU-Linear-LN
    shape produced by the default ``hidden_layers=1`` MLP factory."""
    layers = emb_params["layers"]
    return (
        len(layers) == 2
        and emb_params["ln"] is not None
        and layers[0]["w"].shape[1] == hidden
        and layers[1]["w"].shape == (hidden, hidden)
    )


def fused_edge_phase_supported(
    mlp, edge_set, send_rep, rec_rep, edge_rep
) -> bool:
    """Can ONE edge MLP over this edge set ride the fused Pallas kernel?
    (blocked layout, 2-layer edge MLP, uniform feature width, bounded
    stripe). ``NEURAL_LAM_TPU_FUSED=off`` forces the separate-kernel
    path (used by equivalence tests)."""
    if os.environ.get("NEURAL_LAM_TPU_FUSED", "auto") == "off":
        return False
    if edge_set.layout is None or not pallas_for(edge_set):
        return False
    if not fusable(mlp):
        return False
    h = mlp["layers"][1]["w"].shape[1]
    if not (
        send_rep.shape[-1] == h
        and rec_rep.shape[-1] == h
        and (edge_rep is None or edge_rep.shape[-1] == h)
    ):
        return False
    groups = send_rep.shape[1] if send_rep.ndim == 3 else 1
    if not stripe_fits(groups, h):
        # the predicate runs several times per trace (embed check +
        # routing, per section/layer); warn once per (groups, hidden)
        if (groups, h) not in _stripe_warned:
            _stripe_warned.add((groups, h))
            warnings.warn(
                f"fused interaction kernel disabled for batch {groups} "
                f"at hidden {h}: no 128-aligned stripe divisor and the "
                f"full-width stripe ({groups * h} lanes) exceeds the "
                f"VMEM cap; using the unfused path (pad the batch to a "
                f"multiple of {128 // math.gcd(h, 128)} to re-enable)",
                stacklevel=3,
            )
        return False
    return True


_stripe_warned: set = set()


def _use_fused(params, edge_set, send_rep, rec_rep, edge_rep) -> bool:
    """Route a whole interaction step through the fused kernel when the
    configuration matches what it implements."""
    if len(params["edge"]) != 1 or len(params["aggr"]) != 1:
        return False
    return fused_edge_phase_supported(
        params["edge"][0], edge_set, send_rep, rec_rep, edge_rep
    )


def fused_edge_phase(
    mlp,
    edge_set: EdgeSet,
    send_rep: jax.Array,
    rec_rep: jax.Array,
    edge_rep: jax.Array,
    update_edges: bool = True,
    propagation: bool = False,
):
    """The fused gather -> edge-MLP -> sum-aggregate phase for ONE edge
    MLP, exposed for callers that compose multi-section steps from
    per-section phases (HiLAMParallel's combined processing,
    reference: hi_lam_parallel.py:147-209): per-level aggregates are
    summed across sections BEFORE one chunked node update, so the node
    MLP/residual stays with the caller. Returns
    ``(aggregated_sum, new_edge | None)``; mean division (propagation)
    is also the caller's.

    Node reps broadcast to the common batched layout; an unbatched
    ``edge_rep`` stays 2-D (the kernel's shared-edge fast path).
    """
    batched = any(
        a is not None and a.ndim == 3 for a in (send_rep, rec_rep, edge_rep)
    )
    if batched:
        ref = (edge_rep,) if edge_rep is not None else ()
        send_rep, rec_rep = broadcast_to_batch(
            [send_rep, rec_rep], ref=ref
        )
    if (
        not propagation
        and edge_set.banded is not None
        and fused_v2_routed(
            edge_set.layout.num_blocked,
            send_rep.shape[0]
            + edge_set.layout.num_blocks * edge_set.layout.block_rows,
        )
    ):
        key = ("fused_v2", update_edges, _interpret_mode(), False)
        if key not in edge_set.fn_cache:
            edge_set.fn_cache[key] = make_fused_interaction_v2(
                edge_set.layout,
                edge_set.banded,
                update_edges=update_edges,
                interpret=_interpret_mode(),
            )
        return edge_set.fn_cache[key](mlp, edge_rep, send_rep, rec_rep)
    x_send = gather_senders(edge_set, send_rep)
    key = ("fused", update_edges, propagation, _interpret_mode(), False)
    if key not in edge_set.fn_cache:
        edge_set.fn_cache[key] = make_fused_interaction(
            edge_set.layout,
            update_edges=update_edges,
            propagation=propagation,
            interpret=_interpret_mode(),
        )
    return edge_set.fn_cache[key](mlp, edge_rep, x_send, rec_rep)


def apply_interaction_net(
    params: InteractionNetParams,
    edge_set: EdgeSet,
    send_rep: jax.Array,
    rec_rep: jax.Array,
    edge_rep: jax.Array,
    aggr: str = "sum",
    update_edges: bool = True,
    propagation: bool = False,
    edge_chunk_sizes: Optional[Sequence[int]] = None,
    aggr_chunk_sizes: Optional[Sequence[int]] = None,
    edge_embedder: Optional[dict] = None,
    edge_features: Optional[jax.Array] = None,
):
    """One message-passing step on node-major representations.

    ``edge_embedder`` + ``edge_features`` (instead of ``edge_rep``)
    delegate the static edge-feature embedding to this op: the fused
    kernel runs the embedder MLP in-kernel on the raw features (the
    embedding never exists in HBM), while the fallback computes it
    up-front — identical math either way.

    Two layouts are supported, selected by ndim:
    - unbatched ``(N, d)`` node / ``(E, d)`` edge arrays (batch via
      ``jax.vmap``), or
    - node-major batched ``(N, B, d)`` / ``(E, B, d)`` arrays (batch
      folded between the row and feature axes). The batched layout is
      the TPU-fast path: every gather/segment operation moves B-times
      wider rows, so the row-bound ops run ~B times fewer iterations.
      Unbatched inputs mixed into a batched call (static embeddings)
      broadcast along the batch axis.

    Returns ``(new_rec_rep, new_edge_rep)`` if ``update_edges`` else
    ``new_rec_rep``.
    """
    if aggr not in ("sum", "mean"):
        raise ValueError(f"Unknown aggregation method: {aggr}")
    if propagation:
        aggr = "mean"  # reference: neural_lam/gnn_layers.py:221-230

    embed_in_kernel = False
    if edge_embedder is not None:
        assert edge_rep is None and edge_features is not None
        hidden = send_rep.shape[-1]
        # In-kernel embedding is the fastest path (8.46M vs 7.56M
        # grid-points/s at MEPS size) but compiles slowly through the
        # TPU remote-compile helper (tens of minutes for a new step
        # shape — amortised by the persistent compilation cache that
        # bench.py and the CLI enable). NEURAL_LAM_TPU_FUSED_EMBED=off
        # selects the fast-compiling variant that embeds up-front.
        embed_in_kernel = (
            os.environ.get("NEURAL_LAM_TPU_FUSED_EMBED", "on") != "off"
            and _use_fused(params, edge_set, send_rep, rec_rep, None)
            and _embedder_fusable(edge_embedder, hidden)
        )
        if not embed_in_kernel:
            edge_rep = apply_mlp(edge_embedder, edge_features)

    batched = any(
        a is not None and a.ndim == 3
        for a in (send_rep, rec_rep, edge_rep)
    )
    if batched:
        b = next(
            a.shape[1] for a in (send_rep, rec_rep, edge_rep)
            if a.ndim == 3
        )

        def bcast(a, rows):
            if a.ndim == 2:
                a = jnp.broadcast_to(a[:, None, :], (rows, b, a.shape[-1]))
            return a

        send_rep = bcast(send_rep, send_rep.shape[0])
        rec_rep = bcast(rec_rep, rec_rep.shape[0])
        # edge_rep is NOT broadcast here: the fused kernel consumes a
        # shared (unbatched) edge embedding directly via a column-tiled
        # weight, avoiding an (E, B, d) materialisation in HBM.

    use_fused = embed_in_kernel or _use_fused(
        params, edge_set, send_rep, rec_rep, edge_rep
    )
    # v2: banded gather prologue merged into the kernel, first-layer
    # node projections hoisted outside (see pallas_fused v2 section).
    # Interaction wiring only; needs banded tables + the saved-pre
    # backward (fused_v2_routed checks the CACHE_PRE gate and
    # the per-set edge/hoisted-row byte trade).
    use_v2 = (
        use_fused
        and not propagation
        and edge_set.banded is not None
        and fused_v2_routed(
            edge_set.layout.num_blocked,
            send_rep.shape[0]
            + edge_set.layout.num_blocks * edge_set.layout.block_rows,
        )
    )
    if not use_v2:
        x_send = gather_senders(edge_set, send_rep)  # (E_pad, [B,] d)

    if use_fused:
        # Single-kernel edge phase: receiver gather + edge MLP +
        # aggregation (+ edge residual) with no per-edge HBM
        # intermediates; optionally including the static edge-feature
        # embedder. See ops/pallas_fused.py.
        if use_v2:
            key = (
                "fused_v2", update_edges, _interpret_mode(),
                embed_in_kernel,
            )
            if key not in edge_set.fn_cache:
                edge_set.fn_cache[key] = make_fused_interaction_v2(
                    edge_set.layout,
                    edge_set.banded,
                    update_edges=update_edges,
                    interpret=_interpret_mode(),
                )
            aggregated, new_edge = edge_set.fn_cache[key](
                params["edge"][0],
                edge_rep,
                send_rep,
                rec_rep,
                emb_params=(edge_embedder if embed_in_kernel else None),
                edge_feats=(edge_features if embed_in_kernel else None),
            )
        else:
            key = (
                "fused", update_edges, propagation, _interpret_mode(),
                embed_in_kernel,
            )
            if key not in edge_set.fn_cache:
                edge_set.fn_cache[key] = make_fused_interaction(
                    edge_set.layout,
                    update_edges=update_edges,
                    propagation=propagation,
                    interpret=_interpret_mode(),
                )
            # Node-MLP epilogue: where the aggregation-side MLP has the
            # fusable shape (and nothing between kernel output and node
            # update — sum aggregation, single unchunked MLP, receiver
            # residual), the kernel applies it per output block and
            # returns the UPDATED receiver rep; ``aggregated`` never
            # round-trips HBM into an XLA node-MLP chain.
            node_ep = (
                not propagation
                and aggr == "sum"
                and len(params["aggr"]) == 1
                and aggr_fusable(params["aggr"][0])
                and fused_aggr_enabled()
            )
            head, new_edge = edge_set.fn_cache[key](
                params["edge"][0],
                edge_rep,
                x_send,
                rec_rep,
                emb_params=(edge_embedder if embed_in_kernel else None),
                edge_feats=(edge_features if embed_in_kernel else None),
                aggr_params=(params["aggr"][0] if node_ep else None),
            )
            if node_ep:
                if update_edges:
                    return head, new_edge
                return head
            aggregated = head
        if aggr == "mean":
            counts = jnp.maximum(edge_set.recv_counts, 1).astype(
                aggregated.dtype
            )
            if counts.shape[0] != aggregated.shape[0]:
                # block-padded residency: pad rows divide by 1
                counts = jnp.concatenate(
                    [
                        counts,
                        jnp.ones(
                            aggregated.shape[0] - counts.shape[0],
                            counts.dtype,
                        ),
                    ]
                )
            aggregated = aggregated / counts.reshape(
                (-1,) + (1,) * (aggregated.ndim - 1)
            )
        if len(params["aggr"]) == 1:
            # split-weight first layer: skip materialising the 2x-wide
            # node concat
            rec_diff = apply_mlp_split_first(
                params["aggr"][0], (rec_rep, aggregated)
            )
        else:
            rec_diff = _apply_chunked(
                params["aggr"],
                jnp.concatenate([rec_rep, aggregated], axis=-1),
                aggr_chunk_sizes,
            )
        residual_base = aggregated if propagation else rec_rep
        new_rec = residual_base + rec_diff
        if update_edges:
            return new_rec, new_edge
        return new_rec

    if batched:
        edge_rep = bcast(edge_rep, edge_rep.shape[0])
    x_rec = gather_receivers(edge_set, rec_rep)  # (E_pad, [B,] d)
    if len(params["edge"]) == 1:
        # Split-weight first layer: avoids materialising the 3x-wide
        # concat on the hot path.
        messages = apply_mlp_split_first(
            params["edge"][0], (edge_rep, x_send, x_rec)
        )
    else:
        edge_in = jnp.concatenate([edge_rep, x_send, x_rec], axis=-1)
        messages = _apply_chunked(params["edge"], edge_in, edge_chunk_sizes)
    if propagation:
        messages = x_send + messages

    if aggr == "sum":
        aggregated = aggregate_sum(edge_set, messages)
    else:
        aggregated = aggregate_mean(edge_set, messages)
    if aggregated.shape[0] != rec_rep.shape[0]:
        # caller keeps node arrays block-padded resident (fused-path
        # residency contract); mirror it on the fallback path
        aggregated = jnp.concatenate(
            [
                aggregated,
                jnp.zeros(
                    (rec_rep.shape[0] - aggregated.shape[0],)
                    + aggregated.shape[1:],
                    aggregated.dtype,
                ),
            ],
            axis=0,
        )

    rec_diff = _apply_chunked(
        params["aggr"],
        jnp.concatenate([rec_rep, aggregated], axis=-1),
        aggr_chunk_sizes,
    )
    residual_base = aggregated if propagation else rec_rep
    new_rec = residual_base + rec_diff

    if update_edges:
        return new_rec, edge_rep + messages
    return new_rec
