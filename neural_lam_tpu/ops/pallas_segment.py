"""Pallas TPU kernel: sorted blocked-CSR segment sum.

Replaces ``jax.ops.segment_sum`` on the message-aggregation hot path
(the op the reference delegates to PyG's native scatter kernels,
reference: neural_lam/gnn_layers.py:176-190). XLA lowers scatter-add to
a serial update loop on TPU (~23 ms for the MEPS m2g edge set at batch
4); this kernel instead streams the receiver-sorted messages
contiguously and reduces them on the MXU via per-chunk one-hot matmuls,
which is memory-bandwidth-bound.

Layout contract (built once at graph-load time, ``BlockedLayout``):
- edges sorted by receiver, with dead padding slots (local id -1)
  inserted so that every receiver block of ``block_rows`` rows owns a
  whole number of ``chunk_edges``-sized chunks,
- ``chunk_block[c]`` = output block index of chunk ``c`` (non-decreasing,
  so consecutive grid steps revisiting a block keep it resident in VMEM
  and accumulate),
- ``local_ids[e]`` = receiver row within its block, or -1 for padding.

The backward pass is the standard gather ``grad_out[receivers]`` (XLA
handles that well), attached via ``jax.custom_vjp``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256
DEFAULT_CHUNK_EDGES = 512


@dataclasses.dataclass(frozen=True)
class BlockedLayout:
    """Static blocked-CSR layout for one edge set."""

    perm: np.ndarray  # (E_blocked,) int64 into original edges; -1 = dead
    local_ids: jax.Array  # (1, E_blocked) int32; -1 = dead. Lane-major
    # layout: an (E, 1) column would be tile-padded 128x on TPU.
    gather_ids: jax.Array  # (E_blocked,) int32; receiver or num_rec (dead)
    chunk_block: jax.Array  # (n_chunks,) int32, non-decreasing
    num_rec: int
    block_rows: int
    chunk_edges: int
    # Degree alignment (see :func:`build_aligned_layout`): when > 0,
    # every chunk is ``aligned_groups`` stacked groups of ``block_rows``
    # slots whose local receiver id EQUALS the row position within the
    # group (or -1 for a dead slot at that position). The fused kernel
    # then replaces both per-chunk one-hot matmuls (receiver gather +
    # aggregation) with static slices/sums, masking dead slots via
    # ``live_col``; every generic one-hot consumer remains correct
    # because ``local_ids``/``gather_ids`` are still valid.
    aligned_groups: int = 0
    # (E_blocked, 1) f32, 1.0 for live slots — the aligned kernels'
    # row-major dead-slot mask (the lane-major ``local_ids`` cannot mask
    # rows without a transpose).
    live_col: Optional[jax.Array] = None

    @property
    def num_blocked(self) -> int:
        return int(self.perm.shape[0])

    @property
    def num_blocks(self) -> int:
        return -(-self.num_rec // self.block_rows)


def build_blocked_layout(
    receivers_sorted: np.ndarray,
    num_rec: int,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    chunk_edges: int = DEFAULT_CHUNK_EDGES,
) -> BlockedLayout:
    """Build the blocked layout for receiver-sorted valid edges."""
    receivers_sorted = np.asarray(receivers_sorted, dtype=np.int64)
    assert (np.diff(receivers_sorted) >= 0).all(), "receivers must be sorted"
    num_blocks = -(-num_rec // block_rows)

    block_of_edge = receivers_sorted // block_rows
    perm_parts: list[np.ndarray] = []
    chunk_block_parts: list[np.ndarray] = []
    edge_pos = np.arange(receivers_sorted.shape[0], dtype=np.int64)
    for b in range(num_blocks):
        sel = edge_pos[block_of_edge == b]
        n_chunks = max(1, -(-len(sel) // chunk_edges))
        padded = np.full(n_chunks * chunk_edges, -1, dtype=np.int64)
        padded[: len(sel)] = sel
        perm_parts.append(padded)
        chunk_block_parts.append(np.full(n_chunks, b, dtype=np.int32))

    perm = np.concatenate(perm_parts)
    chunk_block = np.concatenate(chunk_block_parts)

    dead = perm < 0
    if receivers_sorted.shape[0] == 0:
        # all-dead layout (a spatial shard can own zero edges of a set)
        recv_of_slot = np.full(perm.shape, num_rec, dtype=np.int64)
    else:
        recv_of_slot = np.where(
            dead, num_rec, receivers_sorted[np.where(dead, 0, perm)]
        )
    block_of_slot = np.repeat(chunk_block, chunk_edges).astype(np.int64)
    local = np.where(dead, -1, recv_of_slot - block_of_slot * block_rows)

    return BlockedLayout(
        perm=perm,
        local_ids=jnp.asarray(local.astype(np.int32)[None, :]),
        gather_ids=jnp.asarray(recv_of_slot.astype(np.int32)),
        chunk_block=jnp.asarray(chunk_block),
        num_rec=num_rec,
        block_rows=block_rows,
        chunk_edges=chunk_edges,
    )


def blocked_slot_count(
    receivers_sorted: np.ndarray,
    num_rec: int,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    chunk_edges: int = DEFAULT_CHUNK_EDGES,
) -> int:
    """Slot count :func:`build_blocked_layout` would produce (cheap
    host-side estimate for layout routing)."""
    receivers_sorted = np.asarray(receivers_sorted, dtype=np.int64)
    num_blocks = -(-num_rec // block_rows)
    per_block = np.bincount(
        receivers_sorted // block_rows, minlength=num_blocks
    )
    return int(
        np.sum(-(-np.maximum(per_block, 1) // chunk_edges) * chunk_edges)
    )


def build_aligned_layout(
    receivers_sorted: np.ndarray,
    num_rec: int,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    max_groups: int = DEFAULT_CHUNK_EDGES // DEFAULT_BLOCK_ROWS,
    max_slot_ratio: float = 1.05,
) -> "Optional[BlockedLayout]":
    """Degree-aligned layout: every receiver's edge list is padded to
    the max in-degree ``d_max`` (rounded up to a group multiple) so slot
    positions encode the receiver row.

    Slot order within each receiver block is GROUP-major: slot
    ``((b*cpb + j)*g + k)*R + r`` holds the ``(j*g + k)``-th edge of
    receiver ``b*R + r`` when it exists, else a dead slot
    (``R = block_rows``, ``g = aligned_groups``,
    ``cpb = ceil(d_max/g)`` chunks per block). Each chunk is ``g``
    stacked groups of ``R`` rows whose receiver row equals the row
    position — the fused kernel aggregates by summing static group
    slices (dead slots zeroed via ``live_col``) and gathers the
    receiver rep by stacking the resident projected block, with NO
    one-hot matmul on either side (the one-hot costs ~2*R*lanes FLOPs
    per edge per direction, several times the useful edge-MLP FLOPs at
    hidden 64).

    Measured on v5e at MEPS size (fp32, batch 4): the m2g fused kernel
    runs −6% fwd / −2% fwd+bwd — a small win because the kernels are
    stream-bound, not one-hot-FLOP-bound — but the numerics IMPROVE:
    under the TPU's hardware-default matmul precision the one-hot
    matmuls round every gathered/aggregated value to bf16, while the
    aligned stacks/slice-sums are exact f32.

    Exactly-uniform sets pad nothing (the 4-NN m2g, reference:
    neural_lam/create_graph.py:779-792; hierarchical 1-NN down / 9-up)
    and are admitted by the default ``max_slot_ratio=1.05`` (the .05 covers last-block
    chunk rounding). Padded
    near-uniform sets (the 0.67-radius g2m, ~+12% slots at MEPS size)
    measured ~3% SLOWER at step level — the dead-slot edge-MLP work
    outweighs the one-hot saving — so padding is opt-in via a higher
    ratio. Returns None when the padded slot count exceeds
    ``max_slot_ratio`` times the generic blocked layout's (e.g. the
    merged multiscale m2m, whose coarse nodes reach degree 32 vs mean
    8.8, is always rejected).

    The result is also a valid generic :class:`BlockedLayout`
    (``local_ids``/``gather_ids``/``chunk_block`` follow the same
    contract), so one-hot consumers — the unfused path, the v2 kernel,
    the banded builders — work on it unchanged.
    """
    receivers_sorted = np.asarray(receivers_sorted, dtype=np.int64)
    e = receivers_sorted.shape[0]
    if num_rec <= 0 or e == 0:
        return None
    counts = np.bincount(receivers_sorted, minlength=num_rec)
    if counts.shape[0] != num_rec:
        return None  # receiver ids beyond num_rec
    d_max = int(counts.max())
    if d_max == 0:
        return None
    g = min(max_groups, d_max)
    chunk_edges = g * block_rows
    r_ = block_rows
    num_blocks = -(-num_rec // r_)
    chunks_per_block = -(-d_max // g)
    d_pad = chunks_per_block * g
    total = num_blocks * d_pad * r_
    if total > max_slot_ratio * blocked_slot_count(
        receivers_sorted, num_rec, block_rows, chunk_edges
    ):
        return None

    s = np.arange(total, dtype=np.int64)
    row = s % r_
    k = (s // r_) % g
    j = (s // (r_ * g)) % chunks_per_block
    blk = s // (r_ * g * chunks_per_block)
    recv = np.minimum(blk * r_ + row, num_rec - 1)
    ordinal = j * g + k
    live = (blk * r_ + row < num_rec) & (ordinal < counts[recv])
    # stable receiver sort puts receiver v's q-th edge at start[v] + q
    start = np.concatenate(([0], np.cumsum(counts[:-1])))
    perm = np.where(live, start[recv] + ordinal, -1)
    local = np.where(live, row, -1).astype(np.int32)
    gather = np.where(live, blk * r_ + row, num_rec).astype(np.int32)
    chunk_block = np.repeat(
        np.arange(num_blocks, dtype=np.int32), chunks_per_block
    )
    return BlockedLayout(
        perm=perm,
        local_ids=jnp.asarray(local[None, :]),
        gather_ids=jnp.asarray(gather),
        chunk_block=jnp.asarray(chunk_block),
        num_rec=num_rec,
        block_rows=r_,
        chunk_edges=chunk_edges,
        aligned_groups=g,
        live_col=jnp.asarray(live.astype(np.float32)[:, None]),
    )


def pad_blocked_layout(layout: BlockedLayout, n_chunks: int) -> BlockedLayout:
    """Append all-dead chunks so per-shard layouts share one static
    chunk count (the spatially sharded executor pads every shard's
    layout to the max, then threads the index arrays dynamically).

    Pad chunks target the final output block: ``chunk_block`` stays
    non-decreasing (the last real chunk already points there) and their
    all-dead ids contribute exact zeros.
    """
    cur = int(layout.chunk_block.shape[0])
    assert n_chunks >= cur, (n_chunks, cur)
    if n_chunks == cur:
        return layout
    extra = n_chunks - cur
    ce = layout.chunk_edges
    cb = np.concatenate(
        [
            np.asarray(layout.chunk_block),
            np.full(extra, layout.num_blocks - 1, np.int32),
        ]
    )
    ids = np.concatenate(
        [np.asarray(layout.local_ids)[0], np.full(extra * ce, -1, np.int32)]
    )
    return BlockedLayout(
        perm=np.concatenate(
            [layout.perm, np.full(extra * ce, -1, np.int64)]
        ),
        local_ids=jnp.asarray(ids[None, :]),
        gather_ids=jnp.asarray(
            np.concatenate(
                [
                    np.asarray(layout.gather_ids),
                    np.full(extra * ce, layout.num_rec, np.int32),
                ]
            )
        ),
        chunk_block=jnp.asarray(cb),
        num_rec=layout.num_rec,
        block_rows=layout.block_rows,
        chunk_edges=ce,
    )


def _segsum_kernel(
    chunk_block_ref, ids_ref, msg_ref, out_ref, *, block_rows, chunk_edges
):
    c = pl.program_id(0)
    prev = chunk_block_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, chunk_block_ref[c] != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (1, C) int32, -1 = dead
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, chunk_edges), dimension=0
    )
    one_hot_t = (ids == rows).astype(msg_ref.dtype)  # (N_b, C)
    out_ref[:] += jnp.dot(
        one_hot_t, msg_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _dyn_or_static(layout: BlockedLayout, dyn):
    """Layout index arrays for a kernel call: the layout's own constants
    or per-call (possibly traced) overrides with the same static shapes.

    Dynamic overrides let one traced program (e.g. a ``shard_map`` body)
    run the kernel over per-shard layouts: the shapes/tiling are common
    and static, while ``chunk_block``/``local_ids`` arrive as data.
    """
    if dyn is None:
        return layout.chunk_block, layout.local_ids
    cb, ids = dyn
    # ValueError (not assert): a mis-shaped dynamic table would silently
    # misindex the kernel grid under ``python -O``.
    if cb.shape != layout.chunk_block.shape:
        raise ValueError(
            f"dynamic chunk_block shape {cb.shape} != layout "
            f"{layout.chunk_block.shape}"
        )
    if ids.shape != layout.local_ids.shape:
        raise ValueError(
            f"dynamic local_ids shape {ids.shape} != layout "
            f"{layout.local_ids.shape}"
        )
    return cb, ids


def _blocked_segment_sum_fwd_impl(
    messages: jax.Array,
    layout: BlockedLayout,
    interpret: bool,
    out_dtype=None,
    keep_padded: bool = False,
    dyn=None,
) -> jax.Array:
    """(E_blocked, D) messages (blocked order) -> (num_rec, D) sums.

    ``out_dtype`` decouples the accumulator/output dtype from the
    message dtype: bf16 messages with an f32 output accumulate without
    per-chunk rounding (the mixed-precision gradient path).
    ``keep_padded`` skips the final slice, returning the full
    block-padded row count (pad rows are exact zeros) for callers that
    keep node arrays block-padded resident.
    """
    out_dtype = out_dtype or messages.dtype
    cb, ids = _dyn_or_static(layout, dyn)
    d = messages.shape[-1]
    n_chunks = int(layout.chunk_block.shape[0])
    out_rows = layout.num_blocks * layout.block_rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, layout.chunk_edges),
                lambda c, cb: (0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (layout.chunk_edges, d),
                lambda c, cb: (c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (layout.block_rows, d),
            lambda c, cb: (cb[c], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _segsum_kernel,
        block_rows=layout.block_rows,
        chunk_edges=layout.chunk_edges,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, d), out_dtype),
        interpret=interpret,
    )(cb, ids, messages)
    return out if keep_padded else out[: layout.num_rec]


def _expand_kernel(
    chunk_block_ref, ids_ref, grad_ref, out_ref, *, block_rows, chunk_edges
):
    """Backward: grad_msg[e] = grad_out[receiver[e]] as a per-chunk
    one-hot matmul; dead slots (-1) produce zeros."""
    ids = ids_ref[:]  # (1, C)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, chunk_edges), dimension=0
    )
    one_hot_t = (ids == rows).astype(grad_ref.dtype)  # (N_b, C)
    out_ref[:] = jax.lax.dot_general(
        one_hot_t,
        grad_ref[:],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _blocked_segment_sum_bwd_impl(
    grad_out: jax.Array, layout: BlockedLayout, interpret: bool, dyn=None
) -> jax.Array:
    cb, ids = _dyn_or_static(layout, dyn)
    d = grad_out.shape[-1]
    n_chunks = int(layout.chunk_block.shape[0])
    out_rows = layout.num_blocks * layout.block_rows
    pad = out_rows - grad_out.shape[0]
    if pad:
        grad_out = jnp.concatenate(
            [grad_out, jnp.zeros((pad, d), grad_out.dtype)], axis=0
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, layout.chunk_edges),
                lambda c, cb: (0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (layout.block_rows, d),
                lambda c, cb: (cb[c], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (layout.chunk_edges, d),
            lambda c, cb: (c, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _expand_kernel,
        block_rows=layout.block_rows,
        chunk_edges=layout.chunk_edges,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (layout.num_blocked, d), grad_out.dtype
        ),
        interpret=interpret,
    )(cb, ids, grad_out)


def blocked_segment_sum_nondiff(
    messages: jax.Array,
    layout: BlockedLayout,
    interpret: bool = False,
    out_dtype=None,
    keep_padded: bool = False,
    dyn=None,
) -> jax.Array:
    """Raw (non-differentiable) kernel entry for custom VJPs elsewhere."""
    return _blocked_segment_sum_fwd_impl(
        messages, layout, interpret, out_dtype, keep_padded, dyn
    )


def blocked_expand_nondiff(
    node_rep: jax.Array,
    layout: BlockedLayout,
    interpret: bool = False,
    dyn=None,
) -> jax.Array:
    """Raw expansion ``node_rep[receiver[e]]`` in blocked edge order.

    Dead slots produce zero rows. This is the forward dual of the
    segment sum and streams each receiver block once instead of doing a
    per-row XLA gather.
    """
    return _blocked_segment_sum_bwd_impl(node_rep, layout, interpret, dyn)


def make_blocked_segment_sum(layout: BlockedLayout, interpret: bool = False):
    """Build a differentiable ``messages (E_blocked, D) -> (num_rec, D)``
    segment sum closed over a static layout."""

    @jax.custom_vjp
    def seg(messages):
        return _blocked_segment_sum_fwd_impl(messages, layout, interpret)

    def fwd(messages):
        return seg(messages), None

    def bwd(_, grad_out):
        return (_blocked_segment_sum_bwd_impl(grad_out, layout, interpret),)

    seg.defvjp(fwd, bwd)
    return seg


# ---------------------------------------------------------------------------
# Banded sender gather/scatter
# ---------------------------------------------------------------------------
# The sender side of a message-passing step is the awkward one: edges are
# receiver-sorted, so per-edge sender rows are scattered. Round 1 solved
# it with a SECOND sender-sorted blocked layout plus a full edge-wide
# slot permutation between the two orders — the largest XLA-side HBM
# mover at MEPS size (~270 MB per direction for m2g).
#
# On the regular meshes this framework targets, receiver-sorted chunks
# have spatially BANDED senders: a chunk of edges whose receivers are
# consecutive row-major grid/mesh nodes draws its senders from a narrow
# row-major id band of the sender set. Partitioning the sender space
# into aligned windows of ``win_rows`` rows, each chunk touches only a
# few windows, and both directions become per-(chunk, window) one-hot
# matmuls against a VMEM-resident sender window — no second layout, no
# slot permutation, no sorted-gradient materialisation:
#
# - gather (forward expand): visits grouped by chunk; the output chunk
#   block accumulates contributions from each window it straddles.
# - scatter (gradient): visits grouped by window; the output window
#   block accumulates one-hot sums from each chunk that touches it.
#
# ``build_banded_layout`` returns None for graphs whose chunks touch too
# many windows (non-local sender structure) — callers fall back to the
# permutation path, which stays fully supported.


@dataclasses.dataclass(frozen=True)
class BandedLayout:
    """Per-(chunk, window) visit tables for banded sender gather/scatter."""

    # scatter direction: visits grouped by window (non-decreasing)
    svisit_chunk: jax.Array  # (n_svisits,) int32
    svisit_window: jax.Array  # (n_svisits,) int32
    # Lane-major like BlockedLayout.local_ids: Mosaic wants the blocked
    # axis on lanes (a (1, C) block over an (n_visits, C) array fails
    # the sublane-divisibility rule).
    svisit_ids: jax.Array  # (1, n_svisits*chunk_edges) int32; -1 dead
    # gather direction: visits grouped by chunk (non-decreasing)
    gvisit_chunk: jax.Array  # (n_gvisits,) int32
    gvisit_window: jax.Array  # (n_gvisits,) int32
    gvisit_ids: jax.Array  # (1, n_gvisits*chunk_edges) int32; -1 dead
    num_send: int
    win_rows: int
    chunk_edges: int
    n_chunks: int

    @property
    def num_windows(self) -> int:
        return -(-self.num_send // self.win_rows)

    @property
    def padded_send_rows(self) -> int:
        return self.num_windows * self.win_rows


def build_banded_layout(
    sender_of_slot: np.ndarray,
    num_send: int,
    chunk_edges: int,
    win_rows: int = DEFAULT_BLOCK_ROWS,
    max_visit_ratio: float = 8.0,
) -> "Optional[BandedLayout]":
    """Build visit tables from per-slot sender ids (receiver-layout slot
    order, ``-1`` marking dead slots). Returns None when the sender
    structure is not banded enough (visit blowup)."""
    sender_of_slot = np.asarray(sender_of_slot, dtype=np.int64)
    assert sender_of_slot.shape[0] % chunk_edges == 0
    n_chunks = sender_of_slot.shape[0] // chunk_edges
    if n_chunks == 0 or num_send <= 0:
        return None
    n_windows = -(-num_send // win_rows)
    s = sender_of_slot.reshape(n_chunks, chunk_edges)

    per_chunk = []
    total = 0
    for c in range(n_chunks):
        valid = s[c][s[c] >= 0]
        ws = np.unique(valid // win_rows) if valid.size else np.array(
            [0], dtype=np.int64
        )
        per_chunk.append(ws)
        total += len(ws)
    if total > max_visit_ratio * n_chunks:
        return None

    def ids_for(c: int, w: int) -> np.ndarray:
        row = s[c]
        in_win = (row >= 0) & (row // win_rows == w)
        return np.where(in_win, row - w * win_rows, -1).astype(np.int32)

    # gather: chunk-major; every chunk appears (dummy all-dead visit if
    # it has no valid edges) so its output block is zero-initialised
    gv = [(c, int(w)) for c in range(n_chunks) for w in per_chunk[c]]
    # scatter: window-major; every window appears so its output block is
    # zero-initialised even if untouched
    sv = sorted(
        [(int(w), c) for c in range(n_chunks) for w in per_chunk[c]]
    )
    touched = {w for w, _ in sv}
    for w in range(n_windows):
        if w not in touched:
            sv.append((w, -1))
    sv.sort()

    g_chunk = np.array([c for c, _ in gv], dtype=np.int32)
    g_window = np.array([w for _, w in gv], dtype=np.int32)
    g_ids = np.stack([ids_for(c, w) for c, w in gv])
    s_chunk = np.array([max(c, 0) for _, c in sv], dtype=np.int32)
    s_window = np.array([w for w, _ in sv], dtype=np.int32)
    s_ids = np.stack(
        [
            ids_for(c, w)
            if c >= 0
            else np.full(chunk_edges, -1, np.int32)
            for w, c in sv
        ]
    )
    return BandedLayout(
        svisit_chunk=jnp.asarray(s_chunk),
        svisit_window=jnp.asarray(s_window),
        svisit_ids=jnp.asarray(s_ids.reshape(1, -1)),
        gvisit_chunk=jnp.asarray(g_chunk),
        gvisit_window=jnp.asarray(g_window),
        gvisit_ids=jnp.asarray(g_ids.reshape(1, -1)),
        num_send=int(num_send),
        win_rows=int(win_rows),
        chunk_edges=int(chunk_edges),
        n_chunks=int(n_chunks),
    )


def pad_banded_layout(
    banded: "BandedLayout", n_gvisits: int, n_svisits: int
) -> "BandedLayout":
    """Append dead visits (all ids ``-1``) so per-shard banded layouts
    share one static visit count per direction (the spatially sharded
    executor pads every shard's tables to the max, then threads them
    into the kernels dynamically).

    Pad visits repeat the direction's LAST (group, other) pair: the
    group id must not change (a fresh group would zero-initialise its
    output block mid-stream) and re-reading the last input block is
    harmless since the all-dead one-hot contributes exact zeros.
    """
    ce = banded.chunk_edges

    def pad_dir(group, other, ids, n_target):
        group = np.asarray(group)
        other = np.asarray(other)
        ids = np.asarray(ids)
        cur = int(group.shape[0])
        # build_banded_layout guarantees >=1 visit per direction (every
        # chunk/window gets at least a dummy all-dead visit); repeating
        # group[-1]/other[-1] below relies on that invariant.
        if cur < 1:
            raise ValueError(
                "banded layout has an empty visit direction; "
                "build_banded_layout should emit >=1 visit per direction"
            )
        assert n_target >= cur, (n_target, cur)
        if n_target == cur:
            return jnp.asarray(group), jnp.asarray(other), jnp.asarray(ids)
        extra = n_target - cur
        group = np.concatenate([group, np.full(extra, group[-1], np.int32)])
        other = np.concatenate([other, np.full(extra, other[-1], np.int32)])
        ids = np.concatenate(
            [ids[0], np.full(extra * ce, -1, np.int32)]
        )[None, :]
        return jnp.asarray(group), jnp.asarray(other), jnp.asarray(ids)

    s_win, s_chunk, s_ids = pad_dir(
        banded.svisit_window, banded.svisit_chunk, banded.svisit_ids,
        n_svisits,
    )
    g_chunk, g_win, g_ids = pad_dir(
        banded.gvisit_chunk, banded.gvisit_window, banded.gvisit_ids,
        n_gvisits,
    )
    return BandedLayout(
        svisit_chunk=s_chunk,
        svisit_window=s_win,
        svisit_ids=s_ids,
        gvisit_chunk=g_chunk,
        gvisit_window=g_win,
        gvisit_ids=g_ids,
        num_send=banded.num_send,
        win_rows=banded.win_rows,
        chunk_edges=banded.chunk_edges,
        n_chunks=banded.n_chunks,
    )


def _banded_dyn(banded: "BandedLayout", dyn, scatter: bool):
    """Visit tables for one kernel call, ``(group, other, ids)``: the
    layout's own constants or per-call (possibly traced) overrides with
    the same static shapes (see :func:`_dyn_or_static`)."""
    if scatter:
        static = (
            banded.svisit_window, banded.svisit_chunk, banded.svisit_ids
        )
    else:
        static = (
            banded.gvisit_chunk, banded.gvisit_window, banded.gvisit_ids
        )
    if dyn is None:
        return static
    group, other, ids = dyn
    # ValueError (not assert): a mis-shaped per-shard visit table would
    # silently misindex the kernel grid under ``python -O``.
    for got, want, name in (
        (group.shape, static[0].shape, "group"),
        (other.shape, static[1].shape, "other"),
        (ids.shape, static[2].shape, "ids"),
    ):
        if got != want:
            raise ValueError(
                f"dynamic banded {name} table shape {got} != layout {want}"
            )
    return group, other, ids


def _banded_kernel(
    group_ref,  # scalar prefetch: output-group id per visit
    other_ref,  # scalar prefetch: input-block id per visit (unused here)
    ids_ref,  # (1, C) int32 local ids within the window; -1 dead
    in_ref,  # scatter: (C, D) messages | gather: (W, D) node window
    out_ref,  # scatter: (W, D) window accum | gather: (C, D) chunk accum
    *,
    win_rows,
    chunk_edges,
    transpose,
):
    v = pl.program_id(0)
    prev = group_ref[jnp.maximum(v - 1, 0)]
    is_first = jnp.logical_or(v == 0, group_ref[v] != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (1, C)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (win_rows, chunk_edges), dimension=0
    )
    one_hot_t = (ids == rows).astype(in_ref.dtype)  # (W, C)
    if transpose:
        # gather: (C, W) @ (W, D) -> chunk rows from the window
        acc = jax.lax.dot_general(
            one_hot_t,
            in_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # scatter: (W, C) @ (C, D) -> window sums from the chunk
        acc = jnp.dot(
            one_hot_t, in_ref[:], preferred_element_type=jnp.float32
        )
    out_ref[:] += acc.astype(out_ref.dtype)


def banded_scatter_nondiff(
    messages: jax.Array,
    banded: BandedLayout,
    interpret: bool = False,
    out_dtype=None,
    keep_padded: bool = False,
    dyn=None,
) -> jax.Array:
    """Receiver-layout (E_blocked, D) messages -> (num_send, D) sender
    sums, straight from receiver-sorted slots (no permutation).

    ``dyn=(window, chunk, ids)`` threads per-shard visit tables in as
    data (same static shapes as the layout's own)."""
    out_dtype = out_dtype or messages.dtype
    group, other, ids_arr = _banded_dyn(banded, dyn, scatter=True)
    d = messages.shape[-1]
    n_visits = int(banded.svisit_chunk.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_visits,),
        in_specs=[
            pl.BlockSpec(
                (1, banded.chunk_edges),
                lambda v, gw, gc: (0, v),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (banded.chunk_edges, d),
                lambda v, gw, gc: (gc[v], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (banded.win_rows, d),
            lambda v, gw, gc: (gw[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _banded_kernel,
        win_rows=banded.win_rows,
        chunk_edges=banded.chunk_edges,
        transpose=False,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (banded.padded_send_rows, d), out_dtype
        ),
        interpret=interpret,
    )(group, other, ids_arr, messages)
    return out if keep_padded else out[: banded.num_send]


def banded_expand_nondiff(
    node_rep: jax.Array,
    banded: BandedLayout,
    interpret: bool = False,
    dyn=None,
) -> jax.Array:
    """(num_send[, padded], D) sender features -> (E_blocked, D) per-edge
    rows in receiver-layout slot order. Dead slots read zeros.

    ``dyn=(chunk, window, ids)`` threads per-shard visit tables in as
    data (same static shapes as the layout's own)."""
    group, other, ids_arr = _banded_dyn(banded, dyn, scatter=False)
    d = node_rep.shape[-1]
    rows = banded.padded_send_rows
    if node_rep.shape[0] != rows:
        pad = rows - node_rep.shape[0]
        node_rep = jnp.concatenate(
            [
                node_rep,
                jnp.zeros((pad,) + node_rep.shape[1:], node_rep.dtype),
            ],
            axis=0,
        )
    n_visits = int(banded.gvisit_chunk.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_visits,),
        in_specs=[
            pl.BlockSpec(
                (1, banded.chunk_edges),
                lambda v, gc, gw: (0, v),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (banded.win_rows, d),
                lambda v, gc, gw: (gw[v], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (banded.chunk_edges, d),
            lambda v, gc, gw: (gc[v], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _banded_kernel,
        win_rows=banded.win_rows,
        chunk_edges=banded.chunk_edges,
        transpose=True,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (banded.n_chunks * banded.chunk_edges, d), node_rep.dtype
        ),
        interpret=interpret,
    )(group, other, ids_arr, node_rep)
