"""Segment aggregation: Pallas blocked-CSR kernel on TPU, XLA fallback.

These replace the native scatter kernels the reference pulls in through
torch-geometric's ``MessagePassing.aggregate``
(reference: neural_lam/gnn_layers.py:176-190). Edge sets carrying a
:class:`~neural_lam_tpu.ops.pallas_segment.BlockedLayout` aggregate
through the fused Pallas kernel when running on TPU (~6x over XLA's
scatter lowering at MEPS sizes); everything else goes through
``jax.ops.segment_sum``. Both paths produce identical sums up to f32
reduction order.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from .pallas_segment import (
    banded_expand_nondiff,
    banded_scatter_nondiff,
    blocked_expand_nondiff,
    blocked_segment_sum_nondiff,
    make_blocked_segment_sum,
)

if TYPE_CHECKING:  # pragma: no cover
    from .interaction import EdgeSet

# Compiled closures are cached on each EdgeSet instance (``fn_cache``),
# keyed by role, so their lifetime is exactly the edge set's.


def _pallas_enabled() -> bool:
    mode = os.environ.get("NEURAL_LAM_TPU_PALLAS", "auto")
    if mode == "off":
        return False
    if mode in ("interpret", "on"):
        return True
    return jax.default_backend() == "tpu"


def _interpret_mode() -> bool:
    return (
        os.environ.get("NEURAL_LAM_TPU_PALLAS") == "interpret"
        or jax.default_backend() != "tpu"
    )


def small_set_threshold() -> int:
    """Edge sets with fewer valid edges than this run the plain XLA
    gather/segment path instead of the Pallas kernels.

    The hierarchical models launch ~46 GNN steps per forward on tiny
    per-level edge sets (<= 6.5k edges at MEPS size, vs 51k-255k for
    the hot sets); each Pallas launch pays fixed dispatch + layout-copy
    overhead that dominates at those sizes — exactly the
    per-kernel-fixed-overhead regime the round-4 step profile
    identified. XLA fuses the small gather/scatter-adds into its
    surrounding fusions instead. 0 disables (every set rides Pallas).
    """
    return int(os.environ.get("NEURAL_LAM_TPU_SMALL_SET_EDGES", "0"))


def pallas_for(edge_set) -> bool:
    """Per-edge-set kernel routing: Pallas unless the set is tiny.

    Sharded-executor table views may not carry ``num_valid``; they are
    never tiny (the executor pads shards to a common chunk count), so
    they always ride Pallas.
    """
    if not _pallas_enabled():
        return False
    num_valid = getattr(edge_set, "num_valid", None)
    return num_valid is None or num_valid >= small_set_threshold()


def apply_matmul_precision() -> None:
    """Honor ``NEURAL_LAM_TPU_MATMUL_PRECISION=highest`` for real.

    On TPU, JAX's hardware-default matmul precision rounds f32 matmul
    OPERANDS to bfloat16 (f32 accumulation) — in XLA matmuls AND inside
    the Pallas kernels' ``jnp.dot`` calls, including the one-hot
    gather/aggregate matmuls (measured: a one-hot "selection" matmul
    carries ~1e-2 absolute rounding on unit-scale values; exact under
    ``Precision.HIGHEST``). That default is the TPU counterpart of the
    reference's CUDA TF32 default
    ``torch.set_float32_matmul_precision("high")``
    (reference: neural_lam/train_model.py:423-427), so the framework's
    default keeps it — it is what the fp32 headline was measured under.

    ``highest`` opts into exact f32 operands EVERYWHERE by setting
    ``jax_default_matmul_precision`` (verified to reach Mosaic kernel
    dots), for parity verification on TPU; expect multi-pass matmuls
    (~6x MXU time on matmul-bound phases). CPU runs (the test suite's
    float64-oracle parity) are exact regardless. Entry points
    (train_model CLI, bench.py, predict.py) call this after flag/env
    resolution, before any tracing.
    """
    if os.environ.get("NEURAL_LAM_TPU_MATMUL_PRECISION") == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")


def matmul_high() -> bool:
    """True when NEURAL_LAM_TPU_MATMUL_PRECISION=high.

    ``high`` EXPLICITLY thins the f32 streams/operands to bfloat16
    (casts in XLA + kernel IO). NOTE the hardware default already
    rounds matmul operands to bf16 implicitly (see
    :func:`apply_matmul_precision`), which is why this mode measured
    SLOWER than the default: the explicit casts add VPU work without
    buying MXU time. Kept for sweep comparability.
    """
    return (
        os.environ.get("NEURAL_LAM_TPU_MATMUL_PRECISION", "default")
        == "high"
    )


def kernel_matmul_high() -> bool:
    """True when the *in-kernel* matmul operands should ride bf16.

    ``high-kernels`` restricts the TF32-equivalent rounding to the
    Pallas kernels' matmul operands (one-hot gathers/aggregations and
    the block-diagonal MLP weights) while every HBM stream — node/edge
    arrays, gather IO — stays exact f32. ``high`` implies it (kernels +
    IO thinning both).
    """
    return os.environ.get(
        "NEURAL_LAM_TPU_MATMUL_PRECISION", "default"
    ) in (
        "high",
        "high-kernels",
    )


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``.

    Padding edges must carry ``segment_ids == num_segments`` (one past the
    end) and are dropped by aggregating into ``num_segments + 1`` buckets and
    slicing. This keeps padded edge blocks fully static with no masking
    multiplies on the hot path.
    """
    out = jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments + 1,
        indices_are_sorted=indices_are_sorted,
    )
    return out[:num_segments]


def _fold_rows(fn, compute_dtype=jnp.float32):
    """Adapt a 2-D ``(R, D) -> (S, D)`` kernel callable to also accept
    node-major batched ``(R, B, D)`` arrays by folding ``B`` into the
    feature axis (a free reshape in row-major layout), casting in/out of
    ``compute_dtype``. The default keeps kernels f32 regardless of
    input dtype (Mosaic's bf16 path compiles ~5x slower and the
    reductions accumulate in f32 anyway); the gather path passes bf16
    under mixed precision / ``matmul_high`` to halve edge-wide HBM
    traffic."""

    def wrapped(x):
        dtype = x.dtype
        xc = x.astype(compute_dtype) if dtype != compute_dtype else x
        if xc.ndim == 3:
            r, b, d = xc.shape
            out = fn(xc.reshape(r, b * d))
            out = out.reshape(out.shape[0], b, d)
        else:
            out = fn(xc)
        return out.astype(dtype) if out.dtype != dtype else out

    return wrapped


def aggregate_sum(edge_set: "EdgeSet", messages: jax.Array) -> jax.Array:
    """Per-receiver sums of ``(E_pad, [B,] D)`` messages."""
    layout = edge_set.layout
    if layout is not None and pallas_for(edge_set):
        key = ("seg", _interpret_mode())
        if key not in edge_set.fn_cache:
            edge_set.fn_cache[key] = _fold_rows(
                make_blocked_segment_sum(
                    layout, interpret=_interpret_mode()
                )
            )
        return edge_set.fn_cache[key](messages)
    return segment_sum(
        messages,
        edge_set.receivers,
        edge_set.num_rec,
        indices_are_sorted=edge_set.sorted_by_receiver,
    )


def _gather_io_dtype(dtype):
    """Dtype the per-edge gather path (forward expand + backward slot
    permutation — the two largest XLA-side HBM movers at MEPS size)
    runs in. bf16 halves that traffic; selected under bf16 inputs or
    ``matmul_high`` (TF32-equivalent) f32 mode."""
    if dtype == jnp.float32 and matmul_high():
        return jnp.bfloat16
    if dtype == jnp.bfloat16 and (
        os.environ.get("NEURAL_LAM_TPU_BF16_KERNELS", "auto") != "off"
    ):
        return jnp.bfloat16
    return jnp.float32


def gather_senders(edge_set: "EdgeSet", send_rep: jax.Array) -> jax.Array:
    """Per-edge sender features ``send_rep[senders]``.

    On TPU the gradient (a scatter-add into the sender node set, the
    slowest op in XLA's AD of the message-passing step) runs through the
    Pallas kernel over a sender-sorted blocked layout. The grad
    aggregation kernel always accumulates/outputs f32; only the edge-wide
    traffic (expand + slot permutation) rides ``_gather_io_dtype``.
    """
    if edge_set.banded is not None and pallas_for(edge_set):
        io_dtype = _gather_io_dtype(send_rep.dtype)
        key = ("send_banded", _interpret_mode(), jnp.dtype(io_dtype).name)
        if key not in edge_set.fn_cache:
            banded = edge_set.banded
            interpret = _interpret_mode()

            @jax.custom_vjp
            def gather(x):
                # banded expand: per-(chunk, window) one-hot matmuls
                # against VMEM-resident sender windows; dead slots zero
                return banded_expand_nondiff(x, banded, interpret)

            def fwd(x):
                return gather(x), x.shape[0]

            def bwd(rows, grad_msgs):
                # scatter straight from receiver-sorted slots — no slot
                # permutation, no sender-sorted grad materialisation
                full = banded.padded_send_rows
                d_nodes = banded_scatter_nondiff(
                    grad_msgs, banded, interpret,
                    out_dtype=jnp.float32,
                    keep_padded=(rows == full),
                )
                if d_nodes.shape[0] != rows:
                    pad = rows - d_nodes.shape[0]
                    d_nodes = jnp.concatenate(
                        [
                            d_nodes,
                            jnp.zeros(
                                (pad,) + d_nodes.shape[1:],
                                d_nodes.dtype,
                            ),
                        ],
                        axis=0,
                    )
                return (d_nodes.astype(grad_msgs.dtype),)

            gather.defvjp(fwd, bwd)
            edge_set.fn_cache[key] = _fold_rows(gather, io_dtype)
        return edge_set.fn_cache[key](send_rep)
    if edge_set.send_layout is not None and pallas_for(edge_set):
        io_dtype = _gather_io_dtype(send_rep.dtype)
        key = ("send", _interpret_mode(), jnp.dtype(io_dtype).name)
        if key not in edge_set.fn_cache:
            layout = edge_set.send_layout
            senders = edge_set.senders
            rslot = edge_set.rslot_of_sslot
            interpret = _interpret_mode()

            @jax.custom_vjp
            def gather(x):
                return x[senders]

            def fwd(x):
                # Residual: the caller's node row count — block-padded
                # resident senders get the grad back unsliced.
                return gather(x), x.shape[0]

            def bwd(rows, grad_msgs):
                # Dead sender-layout slots (rslot == num_padded) may read
                # any row: the segment-sum kernel's one-hot drops them
                # (local_ids == -1), so clamping beats materialising a
                # padded copy of the full (E, B*D) grad array.
                safe = jnp.minimum(rslot, grad_msgs.shape[0] - 1)
                grad_sorted = grad_msgs[safe]
                full = layout.num_blocks * layout.block_rows
                d_nodes = blocked_segment_sum_nondiff(
                    grad_sorted, layout, interpret,
                    out_dtype=jnp.float32,
                    keep_padded=(rows == full),
                )
                if d_nodes.shape[0] != rows:
                    # caller kept a padded node array with a row count
                    # that is not this layout's padding — zero-fill
                    pad = rows - d_nodes.shape[0]
                    d_nodes = jnp.concatenate(
                        [
                            d_nodes,
                            jnp.zeros(
                                (pad,) + d_nodes.shape[1:], d_nodes.dtype
                            ),
                        ],
                        axis=0,
                    )
                return (d_nodes.astype(grad_msgs.dtype),)

            gather.defvjp(fwd, bwd)
            edge_set.fn_cache[key] = _fold_rows(gather, io_dtype)
        return edge_set.fn_cache[key](send_rep)
    return send_rep[edge_set.senders]


def gather_receivers(edge_set: "EdgeSet", rec_rep: jax.Array) -> jax.Array:
    """Per-edge receiver features with a Pallas scatter-free gradient.

    The backward scatter-add is exactly the receiver-sorted blocked
    segment sum, so it reuses the forward aggregation kernel.
    """
    if edge_set.layout is not None and pallas_for(edge_set):
        key = ("recv", _interpret_mode())
        if key not in edge_set.fn_cache:
            layout = edge_set.layout
            interpret = _interpret_mode()

            @jax.custom_vjp
            def gather(x):
                # Streamed Pallas expansion instead of an XLA row gather.
                # Dead slots read zeros rather than a junk row; both are
                # invisible to the loss (dead messages never aggregate).
                return blocked_expand_nondiff(x, layout, interpret)

            def fwd(x):
                return gather(x), x.shape[0]

            def bwd(rows, grad_msgs):
                # Upstream grads at dead slots are exactly zero (their
                # messages never reach the loss); the kernel drops them
                # again via the one-hot, so no masking is needed.
                full = layout.num_blocks * layout.block_rows
                d_nodes = blocked_segment_sum_nondiff(
                    grad_msgs, layout, interpret,
                    keep_padded=(rows == full),
                )
                if d_nodes.shape[0] != rows:
                    pad = rows - d_nodes.shape[0]
                    d_nodes = jnp.concatenate(
                        [
                            d_nodes,
                            jnp.zeros(
                                (pad,) + d_nodes.shape[1:], d_nodes.dtype
                            ),
                        ],
                        axis=0,
                    )
                return (d_nodes,)

            gather.defvjp(fwd, bwd)
            edge_set.fn_cache[key] = _fold_rows(gather)
        return edge_set.fn_cache[key](rec_rep)
    return rec_rep[edge_set.recv_gather]


def aggregate_mean(edge_set: "EdgeSet", messages: jax.Array) -> jax.Array:
    """Mean-aggregate with graph-load-time per-receiver valid-edge counts.

    Counts are clamped to a minimum of 1 so receivers with no incoming
    edges aggregate to zero (same convention as PyG scatter-mean).
    """
    summed = aggregate_sum(edge_set, messages)
    counts = jnp.maximum(edge_set.recv_counts, 1).astype(summed.dtype)
    return summed / counts.reshape((-1,) + (1,) * (summed.ndim - 1))


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    segment_counts: jax.Array,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean-aggregate with precomputed per-segment valid-edge counts."""
    summed = segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    counts = jnp.maximum(segment_counts, 1).astype(summed.dtype)
    return summed / counts[:, None]
