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
    recv_of_slot = np.where(dead, num_rec, receivers_sorted[np.where(dead, 0, perm)])
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


def _blocked_segment_sum_fwd_impl(
    messages: jax.Array,
    layout: BlockedLayout,
    interpret: bool,
    out_dtype=None,
    keep_padded: bool = False,
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
    )(layout.chunk_block, layout.local_ids, messages)
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
    grad_out: jax.Array, layout: BlockedLayout, interpret: bool
) -> jax.Array:
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
    )(layout.chunk_block, layout.local_ids, grad_out)


def blocked_segment_sum_nondiff(
    messages: jax.Array,
    layout: BlockedLayout,
    interpret: bool = False,
    out_dtype=None,
    keep_padded: bool = False,
) -> jax.Array:
    """Raw (non-differentiable) kernel entry for custom VJPs elsewhere."""
    return _blocked_segment_sum_fwd_impl(
        messages, layout, interpret, out_dtype, keep_padded
    )


def blocked_expand_nondiff(
    node_rep: jax.Array, layout: BlockedLayout, interpret: bool = False
) -> jax.Array:
    """Raw expansion ``node_rep[receiver[e]]`` in blocked edge order.

    Dead slots produce zero rows. This is the forward dual of the
    segment sum and streams each receiver block once instead of doing a
    per-row XLA gather.
    """
    return _blocked_segment_sum_bwd_impl(node_rep, layout, interpret)


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
