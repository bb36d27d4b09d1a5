"""Fused interaction-net Pallas TPU kernel.

One kernel application = one full GNN edge phase: receiver-feature
gather -> 2-layer edge MLP (with LayerNorm) -> sum aggregation (and the
optional edge-residual update), computed per receiver-sorted edge chunk
with the receiver block resident in VMEM. This replaces the chain
``gather_receivers`` -> ``apply_mlp_split_first`` -> ``aggregate_sum``
of three separate kernels/ops, whose per-edge intermediates
(``x_rec``, ``h1``, ``messages``) each round-tripped through HBM — the
dominant cost at hidden_dim 64, where the op is bandwidth-bound
(docs/performance.md "Roofline position"). The reference delegates this
edge phase to PyG's native scatter engine
(reference: neural_lam/gnn_layers.py:111-190); here it is a single
Mosaic kernel designed around the MXU:

- edges live in the receiver-sorted blocked-CSR order of
  :class:`~neural_lam_tpu.ops.pallas_segment.BlockedLayout`; the
  receiver gather and the aggregation are per-chunk one-hot matmuls
  against the resident receiver/output block (the formulation Mosaic
  supports, unlike dynamic VMEM row gathers),
- the batch is folded into lanes (node-major ``(N, B, D)`` ->
  ``(N, B*D)``) and per-edge matmuls use block-diagonal
  ``kron(I_groups, W)`` weights, so every matmul runs at full lane
  width regardless of the (small) feature dim,
- LayerNorm statistics are computed with a block-diagonal averaging
  matmul (``kron(I_groups, 11^T/D)``) — per-64-lane-group reductions
  are MXU-friendly where cross-lane segmented reductions are not,
- wide lane counts are processed in stripes (outer grid dim), bounding
  VMEM at large batch and keeping the weight blocks <= 256 lanes.

The backward kernel recomputes the forward per chunk (remat: the
recompute is MXU-bound and cheaper than round-tripping activations)
and emits per-edge input grads, the block-accumulated receiver grad,
and grid-accumulated weight/bias/LN grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segment import BlockedLayout

_LN_EPS = 1e-5  # matches ops.mlp._LN_EPS / torch LayerNorm


_MAX_STRIPE_LANES = 512


def stripe_fits(groups: int, feat_dim: int) -> bool:
    """True when the stripe decomposition bounds per-stripe lane width.

    ``_stripe_groups`` falls back to ONE full-width stripe when no
    128-aligned divisor of ``groups`` exists; at large odd batches that
    stripe has no VMEM bound (e.g. batch 25 at hidden 64 = 1600 lanes:
    >3 MB per edge block plus a 1600x1600 block-diagonal weight).
    Callers must route such shapes to the unfused path instead.
    """
    return _stripe_groups(groups, feat_dim) * feat_dim <= _MAX_STRIPE_LANES


def _stripe_groups(total_groups: int, feat_dim: int) -> int:
    """Groups per stripe: the largest divisor of ``total_groups`` whose
    stripe width stays <= 256 lanes (one stripe if feat_dim >= 256).

    A partial stripe (stripe < total lanes) is a mid-array lane block,
    which Mosaic only lowers when its width is a multiple of 128; a
    single full-width stripe has no such constraint. When no aligned
    divisor exists (e.g. batch 5 at hidden 64), fall back to one
    full-width stripe rather than an unlowerable partial one.
    """
    cap = max(1, 256 // feat_dim)
    if total_groups <= cap:
        return total_groups
    for g in range(cap, 0, -1):
        if total_groups % g == 0 and (g * feat_dim) % 128 == 0:
            return g
    return total_groups


def _block_diag(w: jax.Array, groups: int) -> jax.Array:
    """``kron(I_groups, w)``: one weight matmul for all lane groups."""
    if groups == 1:
        return w
    return jnp.kron(jnp.eye(groups, dtype=w.dtype), w)


def _group_mean_matrix(groups: int, feat_dim: int) -> jax.Array:
    """Block-diagonal ``11^T / D``: right-multiplying broadcasts each
    64-lane group's mean back across the group."""
    ones = jnp.full((feat_dim, feat_dim), 1.0 / feat_dim, jnp.float32)
    return _block_diag(ones, groups)


def _tile_vec(v: jax.Array, groups: int) -> jax.Array:
    return jnp.tile(v.astype(jnp.float32), groups)[None, :]


def _embed_forward(f, emb_refs, cdt=jnp.float32):
    """In-kernel edge-embedder MLP: Linear-SiLU-Linear-LN on the raw
    static features (the reference's per-edge-set embedder,
    reference: graph/base.py:142-149). Matmul operands run in ``cdt``
    (bf16 under mixed precision) with f32 accumulation."""
    ew1, eb1, ew2, eb2, eg, ebt, mmat_h = emb_refs
    c = lambda x: x.astype(cdt)  # noqa: E731
    p1 = jnp.dot(c(f), ew1[:], preferred_element_type=jnp.float32) + eb1[:]
    a1 = jax.nn.silu(p1)
    ze = jnp.dot(c(a1), ew2[:], preferred_element_type=jnp.float32) + eb2[:]
    # LN statistics stay f32: ``z - mean(z)`` cancels catastrophically
    # under bf16 operands, and these matmuls are a small FLOP fraction.
    mu = jnp.dot(ze, mmat_h[:], preferred_element_type=jnp.float32)
    ce = ze - mu
    var = jnp.dot(
        ce * ce, mmat_h[:], preferred_element_type=jnp.float32
    )
    return ce * jax.lax.rsqrt(var + _LN_EPS) * eg[:] + ebt[:]


def _embed_backward(f, d_emb, emb_refs, accum_refs, init, cdt=jnp.float32):
    """Backward of the in-kernel embedder: recompute, then weight-grad
    accumulators (no feature grad — features are constants)."""
    ew1, eb1, ew2, eb2, eg, ebt, mmat_h = emb_refs
    dew1, deb1, dew2, deb2, deg, debt = accum_refs
    c = lambda x: x.astype(cdt)  # noqa: E731

    @pl.when(init)
    def _():
        dew1[:] = jnp.zeros_like(dew1)
        deb1[:] = jnp.zeros_like(deb1)
        dew2[:] = jnp.zeros_like(dew2)
        deb2[:] = jnp.zeros_like(deb2)
        deg[:] = jnp.zeros_like(deg)
        debt[:] = jnp.zeros_like(debt)

    p1 = jnp.dot(c(f), ew1[:], preferred_element_type=jnp.float32) + eb1[:]
    a1 = jax.nn.silu(p1)
    ze = jnp.dot(c(a1), ew2[:], preferred_element_type=jnp.float32) + eb2[:]
    mu = jnp.dot(ze, mmat_h[:], preferred_element_type=jnp.float32)
    ce = ze - mu
    var = jnp.dot(
        ce * ce, mmat_h[:], preferred_element_type=jnp.float32
    )
    rinv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = ce * rinv

    d_xhat = d_emb * eg[:]
    m1 = jnp.dot(d_xhat, mmat_h[:], preferred_element_type=jnp.float32)
    m2 = jnp.dot(
        d_xhat * xhat, mmat_h[:], preferred_element_type=jnp.float32
    )
    dz = rinv * (d_xhat - m1 - xhat * m2)
    deg[:] += jnp.sum(d_emb * xhat, axis=0, keepdims=True)
    debt[:] += jnp.sum(d_emb, axis=0, keepdims=True)
    dew2[:] += jax.lax.dot_general(
        c(a1), c(dz), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    deb2[:] += jnp.sum(dz, axis=0, keepdims=True)
    d_a1 = jax.lax.dot_general(
        c(dz), ew2[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sig = jax.nn.sigmoid(p1)
    d_p1 = d_a1 * (sig * (1.0 + p1 * (1.0 - sig)))
    dew1[:] += jax.lax.dot_general(
        c(f), c(d_p1), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    deb1[:] += jnp.sum(d_p1, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
def _fused_fwd_kernel(
    chunk_block_ref,
    ids_ref,
    edge_ref,
    send_ref,
    rec_ref,
    w1e_ref,
    w1s_ref,
    w1r_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    gamma_ref,
    beta_ref,
    mmat_ref,
    *rest,
    block_rows,
    chunk_edges,
    layer_norm,
    update_edges,
    propagation,
    edge_unbatched,
    embed_edges=False,
    save_pre=False,
    node_epilogue=False,
    node_layer_norm=False,
    aligned=0,
    cdt=jnp.float32,
):
    # When the edge rep is a shared (unbatched) embedding, ``edge_ref``
    # is a (C, D) block and ``w1e_ref`` the column-tiled (D, S) weight;
    # its matmul broadcasts the edge contribution across lane groups
    # without the caller materialising an (E, B, D) broadcast in HBM.
    # With ``embed_edges`` the chain starts one stage earlier still:
    # ``edge_ref`` holds the RAW static edge features (C, F) and the
    # edge-embedder MLP (Linear-SiLU-Linear-LN) runs in-kernel, so the
    # per-edge embedding never exists in HBM at all.
    # ``cdt`` is the matmul operand dtype (bf16 under mixed precision —
    # roughly doubles MXU throughput and halves operand VMEM/HBM
    # traffic); accumulation stays f32 via preferred_element_type.
    cv = lambda x: x.astype(cdt)  # noqa: E731
    rest = list(rest)
    # aligned mode: (C, 1) f32 dead-slot row mask (layout.live_col)
    live_ref = rest.pop(0) if aligned else None
    emb_refs = None
    if embed_edges:
        emb_refs = rest[:7]
        rest = rest[7:]
    tile_ref = rest.pop(0) if (edge_unbatched and update_edges) else None
    node_w = None
    if node_epilogue:
        node_w = rest[:7]  # war, wag, ba1, wa2, ba2, gamma_n, beta_n
        rest = rest[7:]
    out_refs = rest
    aggr_ref = out_refs[0]
    # optional per-edge pre-activation output (backward skips its
    # recompute when the caller saves it as a residual)
    pre_ref = out_refs.pop() if save_pre else None
    node_ref = out_refs.pop() if node_epilogue else None
    c = pl.program_id(1)
    prev = chunk_block_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, chunk_block_ref[c] != prev)

    @pl.when(is_first)
    def _():
        aggr_ref[:] = jnp.zeros_like(aggr_ref)

    # NOTE: the one-hot path's equation ORDER (ids/iota/one-hot before
    # rec_proj) is load-bearing for the persistent compile cache — the
    # jaxpr order feeds the HLO hash, and reordering semantically
    # equivalent ops invalidates every previously warmed executable.
    if aligned:
        # uniform-degree aligned layout: slot (k*R + r) IS receiver row
        # r, so the gather is a static stack of the projected block and
        # the aggregation a static sum of group slices — no one-hot
        # matmul on either side (pallas_segment.build_aligned_layout).
        one_hot_t = None
    else:
        ids = ids_ref[:]  # (1, C) int32, -1 = dead slot
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, chunk_edges), dimension=0
        )
        one_hot_t = (ids == rows).astype(cdt)  # (N_b, C)

    # Project the resident receiver block, then select projected rows
    # (projection and selection commute; projecting first keeps the
    # matmul at block size, not chunk size).
    rec_proj = jnp.dot(
        cv(rec_ref[:]), w1r_ref[:], preferred_element_type=jnp.float32
    )
    if aligned:
        gathered = jnp.concatenate([rec_proj] * aligned, axis=0)
    else:
        gathered = jax.lax.dot_general(
            one_hot_t,
            cv(rec_proj),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, S)

    if embed_edges:
        edge_val = _embed_forward(edge_ref[:], emb_refs, cdt)
    else:
        edge_val = edge_ref[:]
    pre = (
        jnp.dot(cv(edge_val), w1e_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(
            cv(send_ref[:]), w1s_ref[:], preferred_element_type=jnp.float32
        )
        + gathered
        + b1_ref[:]
    )
    if pre_ref is not None:
        # bf16 residual mode halves the largest per-edge stream; the
        # in-kernel math stays f32
        pre_ref[:] = pre.astype(pre_ref.dtype)
    h1 = jax.nn.silu(pre)
    z = (
        jnp.dot(cv(h1), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )
    if layer_norm:
        # LN statistics in f32 (cancellation-sensitive; small FLOPs)
        mu = jnp.dot(z, mmat_ref[:], preferred_element_type=jnp.float32)
        cz = z - mu
        var = jnp.dot(
            cz * cz, mmat_ref[:], preferred_element_type=jnp.float32
        )
        msg = cz * jax.lax.rsqrt(var + _LN_EPS) * gamma_ref[:] + beta_ref[:]
    else:
        msg = z
    if propagation:
        # reference: neural_lam/gnn_layers.py:242-250 (sender residual)
        msg = msg + send_ref[:].astype(jnp.float32)
    if update_edges:
        if edge_unbatched:
            # broadcast (C, D) -> (C, S) via the tiled-identity matmul
            edge_b = jnp.dot(
                cv(edge_val), tile_ref[:],
                preferred_element_type=jnp.float32,
            )
        else:
            edge_b = edge_val.astype(jnp.float32)
        out_refs[1][:] = edge_b + msg
    if aligned:
        msg_m = msg * live_ref[:]  # zero dead slots (padded degrees)
        acc = msg_m[0:block_rows]
        for k in range(1, aligned):
            acc = acc + msg_m[k * block_rows : (k + 1) * block_rows]
        aggr_ref[:] += acc
    else:
        aggr_ref[:] += jnp.dot(
            one_hot_t, cv(msg), preferred_element_type=jnp.float32
        )

    if node_epilogue:
        # Aggregation-side node MLP fused as a per-block epilogue
        # (reference aggr_mlp, neural_lam/gnn_layers.py:91,149): on the
        # LAST chunk of each output block the accumulated aggregate and
        # the resident receiver block run
        # ``rec + LN(W2·silu(rec·War + agg·Wag + b1) + b2)`` entirely
        # in VMEM — ``aggregated`` still streams out once (the backward
        # residual) but never round-trips back in for an XLA node-MLP
        # chain, and the concat/hidden intermediates never exist in
        # HBM.
        war_ref, wag_ref, ba1_ref, wa2_ref, ba2_ref, gn_ref, bn_ref = (
            node_w
        )
        n_chunks = pl.num_programs(1)
        nxt = chunk_block_ref[jnp.minimum(c + 1, n_chunks - 1)]
        is_last = jnp.logical_or(
            c == n_chunks - 1, nxt != chunk_block_ref[c]
        )

        @pl.when(is_last)
        def _():
            agg = aggr_ref[:]
            pre_n = (
                jnp.dot(
                    cv(rec_ref[:]), war_ref[:],
                    preferred_element_type=jnp.float32,
                )
                + jnp.dot(
                    cv(agg), wag_ref[:],
                    preferred_element_type=jnp.float32,
                )
                + ba1_ref[:]
            )
            hn = jax.nn.silu(pre_n)
            zn = (
                jnp.dot(
                    cv(hn), wa2_ref[:],
                    preferred_element_type=jnp.float32,
                )
                + ba2_ref[:]
            )
            if node_layer_norm:
                mu_n = jnp.dot(
                    zn, mmat_ref[:], preferred_element_type=jnp.float32
                )
                cz_n = zn - mu_n
                var_n = jnp.dot(
                    cz_n * cz_n, mmat_ref[:],
                    preferred_element_type=jnp.float32,
                )
                outn = (
                    cz_n * jax.lax.rsqrt(var_n + _LN_EPS) * gn_ref[:]
                    + bn_ref[:]
                )
            else:
                outn = zn
            node_ref[:] = rec_ref[:].astype(jnp.float32) + outn


# ---------------------------------------------------------------------------
# backward kernel (recompute + grads)
# ---------------------------------------------------------------------------
def _fused_bwd_kernel(
    chunk_block_ref,
    ids_ref,
    edge_ref,
    send_ref,
    rec_ref,
    d_aggr_ref,
    w1e_ref,
    w1s_ref,
    w1r_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    gamma_ref,
    mmat_ref,
    *rest_refs,
    block_rows,
    chunk_edges,
    layer_norm,
    update_edges,
    propagation,
    edge_unbatched,
    embed_edges=False,
    saved_pre=False,
    node_epilogue=False,
    node_layer_norm=False,
    aligned=0,
    cdt=jnp.float32,
):
    cv = lambda x: x.astype(cdt)  # noqa: E731
    rest_refs = list(rest_refs)
    # aligned mode: (C, 1) f32 dead-slot row mask (layout.live_col)
    live_ref = rest_refs.pop(0) if aligned else None
    emb_refs = None
    if embed_edges:
        emb_refs = rest_refs[:7]
        rest_refs = rest_refs[7:]
    d_new_edge_ref = rest_refs.pop(0) if update_edges else None
    tile_ref = (
        rest_refs.pop(0)
        if (edge_unbatched and update_edges)
        else None
    )
    # forward-saved pre-activations: skip the first-layer recompute
    pre_in_ref = rest_refs.pop(0) if saved_pre else None
    # node-MLP epilogue mode: the ``d_aggr`` input slot carries the
    # forward-SAVED aggregate instead (no external aggregate cotangent
    # exists — the kernel output is the node update), and the true
    # upstream grad arrives as ``d_node``.
    d_node_ref = node_w_bwd = None
    if node_epilogue:
        d_node_ref = rest_refs.pop(0)
        node_w_bwd = [rest_refs.pop(0) for _ in range(6)]
    if embed_edges:
        # no feature grad; embedder weight-grad accumulators instead
        d_edge_ref = None
        emb_accum_refs = rest_refs[:6]
        rest_refs = rest_refs[6:]
    else:
        d_edge_ref = rest_refs.pop(0)
        emb_accum_refs = None
    (
        d_send_ref,
        d_recproj_ref,
        dw1e_ref,
        dw1s_ref,
        dw2_ref,
        db1_ref,
        db2_ref,
        dgamma_ref,
        dbeta_ref,
    ) = rest_refs[:9]
    if node_epilogue:
        (
            d_rec_extra_ref,
            dwar_ref,
            dwag_ref,
            dwa2_ref,
            dba1_ref,
            dba2_ref,
            dgn_ref,
            dbn_ref,
            dagg_scratch,
        ) = rest_refs[9:18]

    s = pl.program_id(0)
    c = pl.program_id(1)
    prev = chunk_block_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, chunk_block_ref[c] != prev)
    very_first = jnp.logical_and(s == 0, c == 0)

    @pl.when(is_first)
    def _():
        d_recproj_ref[:] = jnp.zeros_like(d_recproj_ref)

    @pl.when(very_first)
    def _():
        dw1e_ref[:] = jnp.zeros_like(dw1e_ref)
        dw1s_ref[:] = jnp.zeros_like(dw1s_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        if node_epilogue:
            dwar_ref[:] = jnp.zeros_like(dwar_ref)
            dwag_ref[:] = jnp.zeros_like(dwag_ref)
            dwa2_ref[:] = jnp.zeros_like(dwa2_ref)
            dba1_ref[:] = jnp.zeros_like(dba1_ref)
            dba2_ref[:] = jnp.zeros_like(dba2_ref)
            dgn_ref[:] = jnp.zeros_like(dgn_ref)
            dbn_ref[:] = jnp.zeros_like(dbn_ref)

    if node_epilogue:
        # Node-MLP backward, once per (stripe, block) on its first
        # chunk: recompute the epilogue forward from the saved
        # aggregate + resident receiver block, push d_node through
        # LN/W2/silu/W1, stash d_agg for every chunk of this block, and
        # emit the receiver grad (residual + War path) as a per-block
        # output. Weight grads accumulate across the whole grid like
        # the edge-MLP ones.
        war_ref, wag_ref, ba1_ref, wa2_ref, ba2_ref, gn_ref = node_w_bwd

        @pl.when(is_first)
        def _():
            agg = d_aggr_ref[:]  # forward-saved aggregate (f32)
            recb = rec_ref[:]
            pre_n = (
                jnp.dot(
                    cv(recb), war_ref[:],
                    preferred_element_type=jnp.float32,
                )
                + jnp.dot(
                    cv(agg), wag_ref[:],
                    preferred_element_type=jnp.float32,
                )
                + ba1_ref[:]
            )
            hn = jax.nn.silu(pre_n)
            d_out = d_node_ref[:].astype(jnp.float32)
            if node_layer_norm:
                zn = (
                    jnp.dot(
                        cv(hn), wa2_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    + ba2_ref[:]
                )
                mu_n = jnp.dot(
                    zn, mmat_ref[:], preferred_element_type=jnp.float32
                )
                cz_n = zn - mu_n
                var_n = jnp.dot(
                    cz_n * cz_n, mmat_ref[:],
                    preferred_element_type=jnp.float32,
                )
                rinv_n = jax.lax.rsqrt(var_n + _LN_EPS)
                xhat_n = cz_n * rinv_n
                d_xhat_n = d_out * gn_ref[:]
                m1_n = jnp.dot(
                    d_xhat_n, mmat_ref[:],
                    preferred_element_type=jnp.float32,
                )
                m2_n = jnp.dot(
                    d_xhat_n * xhat_n, mmat_ref[:],
                    preferred_element_type=jnp.float32,
                )
                dz_n = rinv_n * (d_xhat_n - m1_n - xhat_n * m2_n)
                dgn_ref[:] += jnp.sum(
                    d_out * xhat_n, axis=0, keepdims=True
                )
                dbn_ref[:] += jnp.sum(d_out, axis=0, keepdims=True)
            else:
                dz_n = d_out
            dz_nc = cv(dz_n)
            d_hn = jax.lax.dot_general(
                dz_nc, wa2_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwa2_ref[:] += jax.lax.dot_general(
                cv(hn), dz_nc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dba2_ref[:] += jnp.sum(dz_n, axis=0, keepdims=True)
            sig_n = jax.nn.sigmoid(pre_n)
            d_pre_n = d_hn * (sig_n * (1.0 + pre_n * (1.0 - sig_n)))
            d_pre_nc = cv(d_pre_n)
            dwar_ref[:] += jax.lax.dot_general(
                cv(recb), d_pre_nc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwag_ref[:] += jax.lax.dot_general(
                cv(agg), d_pre_nc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dba1_ref[:] += jnp.sum(d_pre_n, axis=0, keepdims=True)
            dagg_scratch[:] = jax.lax.dot_general(
                d_pre_nc, wag_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_rec_extra_ref[:] = d_out + jax.lax.dot_general(
                d_pre_nc, war_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if aligned:
        one_hot_t = None
    else:
        ids = ids_ref[:]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, chunk_edges), dimension=0
        )
        one_hot_t = (ids == rows).astype(cdt)

    # --- recompute forward ------------------------------------------------
    # ``edge_val`` stays needed for the dw1e weight-grad accumulation
    # even when ``pre`` was saved (the embedder recompute is ~0.1% of
    # the skipped first-layer matmuls).
    if embed_edges:
        edge_val = cv(_embed_forward(edge_ref[:], emb_refs, cdt))
    else:
        edge_val = edge_ref[:]
    if pre_in_ref is not None:
        pre = pre_in_ref[:].astype(jnp.float32)
    else:
        rec_proj = jnp.dot(
            cv(rec_ref[:]), w1r_ref[:], preferred_element_type=jnp.float32
        )
        if aligned:
            gathered = jnp.concatenate([rec_proj] * aligned, axis=0)
        else:
            gathered = jax.lax.dot_general(
                one_hot_t,
                cv(rec_proj),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        pre = (
            jnp.dot(
                cv(edge_val), w1e_ref[:],
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                cv(send_ref[:]), w1s_ref[:],
                preferred_element_type=jnp.float32,
            )
            + gathered
            + b1_ref[:]
        )
    h1 = jax.nn.silu(pre)
    z = (
        jnp.dot(cv(h1), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )

    # --- message gradient -------------------------------------------------
    # epilogue mode: the aggregate's grad was derived in-kernel above
    # (d_node through the node MLP) and lives in VMEM scratch
    d_aggr_val = (
        dagg_scratch[:] if node_epilogue else d_aggr_ref[:]
    )
    if aligned:
        # aligned layout: d_msg[k*R + r] = d_aggr[r] (positional stack),
        # dead slots masked to zero
        d_msg = jnp.concatenate(
            [d_aggr_val.astype(jnp.float32)] * aligned, axis=0
        ) * live_ref[:]
    else:
        d_msg = jax.lax.dot_general(
            one_hot_t,
            cv(d_aggr_val),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if update_edges:
        d_msg = d_msg + d_new_edge_ref[:].astype(jnp.float32)

    if layer_norm:
        mu = jnp.dot(z, mmat_ref[:], preferred_element_type=jnp.float32)
        cz = z - mu
        var = jnp.dot(
            cz * cz, mmat_ref[:], preferred_element_type=jnp.float32
        )
        rinv = jax.lax.rsqrt(var + _LN_EPS)
        xhat = cz * rinv
        d_xhat = d_msg * gamma_ref[:]
        m1 = jnp.dot(
            d_xhat, mmat_ref[:], preferred_element_type=jnp.float32
        )
        m2 = jnp.dot(
            d_xhat * xhat, mmat_ref[:],
            preferred_element_type=jnp.float32,
        )
        dz = rinv * (d_xhat - m1 - xhat * m2)
        dgamma_ref[:] += jnp.sum(d_msg * xhat, axis=0, keepdims=True)
        dbeta_ref[:] += jnp.sum(d_msg, axis=0, keepdims=True)
    else:
        dz = d_msg

    dzc = cv(dz)
    d_h1 = jax.lax.dot_general(
        dzc,
        w2_ref[:],
        (((1,), (1,)), ((), ())),  # dz @ W2^T
        preferred_element_type=jnp.float32,
    )
    dw2_ref[:] += jax.lax.dot_general(
        cv(h1), dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[:] += jnp.sum(dz, axis=0, keepdims=True)

    sig = jax.nn.sigmoid(pre)
    d_pre = d_h1 * (sig * (1.0 + pre * (1.0 - sig)))
    d_prec = cv(d_pre)

    d_send = jax.lax.dot_general(
        d_prec, w1s_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if propagation:
        d_send = d_send + d_msg
    d_send_ref[:] = d_send

    # For an unbatched edge rep, w1e is the (D, S) column-tiled weight,
    # so d_pre @ w1e^T directly yields the group-summed (C, D) grad.
    d_edge = jax.lax.dot_general(
        d_prec, w1e_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if update_edges:
        if edge_unbatched:
            # group-sum the batched residual grad: (C, S) @ (D, S)^T
            d_edge = d_edge + jax.lax.dot_general(
                cv(d_new_edge_ref[:]), tile_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            d_edge = d_edge + d_new_edge_ref[:].astype(jnp.float32)
    if embed_edges:
        # chain into the in-kernel embedder; the features themselves
        # are constants, so only weight-grad accumulators come out
        _embed_backward(
            edge_ref[:], d_edge, emb_refs, emb_accum_refs, very_first, cdt
        )
    elif edge_unbatched:
        d_edge_ref[0] = d_edge  # (1, C, D) per-stripe plane
    else:
        d_edge_ref[:] = d_edge

    dw1e_ref[:] += jax.lax.dot_general(
        cv(edge_val), d_prec, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1s_ref[:] += jax.lax.dot_general(
        cv(send_ref[:]), d_prec, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] += jnp.sum(d_pre, axis=0, keepdims=True)
    if aligned:
        # positional scatter: slot (k*R + r) contributes to receiver r
        acc = d_pre[0:block_rows]
        for k in range(1, aligned):
            acc = acc + d_pre[k * block_rows : (k + 1) * block_rows]
        d_recproj_ref[:] += acc
    else:
        d_recproj_ref[:] += jnp.dot(
            one_hot_t, d_prec, preferred_element_type=jnp.float32
        )


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------
def _prep_weights(
    mlp_params: dict,
    groups: int,
    feat_dim: int,
    edge_unbatched: bool,
    cdt=jnp.float32,
):
    """Block-diagonal weight stripes + tiled bias/LN rows.

    Matmul operands (weights, averaging matrix, tiled identity) are cast
    to ``cdt``; bias/LN rows stay f32 — they add into f32 accumulators.
    For an unbatched edge rep, ``w1e`` is column-tiled ``(D, S)`` (one
    matmul broadcasts the shared edge contribution across lane groups)
    and ``tile`` is the matching tiled identity for the residual path.
    """
    layers = mlp_params["layers"]
    w1 = layers[0]["w"].astype(jnp.float32)
    w1e, w1s, w1r = jnp.split(w1, 3, axis=0)
    ln = mlp_params["ln"]
    hidden = w1.shape[1]
    if ln is not None:
        gamma, beta = ln["scale"], ln["bias"]
    else:
        gamma = jnp.ones((hidden,), jnp.float32)
        beta = jnp.zeros((hidden,), jnp.float32)
    if edge_unbatched:
        w1e_k = jnp.tile(w1e, (1, groups))
        tile = jnp.tile(jnp.eye(hidden, dtype=jnp.float32), (1, groups))
        tile = tile.astype(cdt)
    else:
        w1e_k = _block_diag(w1e, groups)
        tile = None
    return dict(
        w1e=w1e_k.astype(cdt),
        w1s=_block_diag(w1s, groups).astype(cdt),
        w1r=_block_diag(w1r, groups).astype(cdt),
        b1=_tile_vec(layers[0]["b"], groups),
        w2=_block_diag(layers[1]["w"].astype(jnp.float32), groups).astype(
            cdt
        ),
        b2=_tile_vec(layers[1]["b"], groups),
        gamma=_tile_vec(gamma, groups),
        beta=_tile_vec(beta, groups),
        mmat=_group_mean_matrix(groups, feat_dim),
        tile=tile,
    )


def _prep_node_weights(
    aggr_params: dict, groups: int, cdt=jnp.float32
) -> dict:
    """Node-MLP (aggr_mlp) weights in kernel layout for the epilogue:
    the ``(2D, D)`` first layer splits into receiver/aggregate halves
    (apply_mlp_split_first part order: (rec_rep, aggregated)), each
    kron-striped like the edge-MLP weights; bias/LN rows tile per
    group and stay f32."""
    layers = aggr_params["layers"]
    w1 = layers[0]["w"].astype(jnp.float32)
    war, wag = jnp.split(w1, 2, axis=0)
    hidden = w1.shape[1]
    ln = aggr_params["ln"]
    if ln is not None:
        gn, bn = ln["scale"], ln["bias"]
    else:
        gn = jnp.ones((hidden,), jnp.float32)
        bn = jnp.zeros((hidden,), jnp.float32)
    return dict(
        war=_block_diag(war, groups).astype(cdt),
        wag=_block_diag(wag, groups).astype(cdt),
        ba1=_tile_vec(layers[0]["b"], groups),
        wa2=_block_diag(layers[1]["w"].astype(jnp.float32), groups).astype(
            cdt
        ),
        ba2=_tile_vec(layers[1]["b"], groups),
        gn=_tile_vec(gn, groups),
        bn=_tile_vec(bn, groups),
    )


def _prep_embedder_weights(emb_params: dict, cdt=jnp.float32) -> list:
    """Edge-embedder MLP weights as plain arrays for the kernel
    (Linear-SiLU-Linear-LN; single 64-lane group, so the LN averaging
    matrix has no kron structure). Matmul operands in ``cdt``, bias/LN
    rows f32."""
    layers = emb_params["layers"]
    hidden = layers[1]["w"].shape[1]
    ln = emb_params["ln"]
    return [
        layers[0]["w"].astype(cdt),
        layers[0]["b"].astype(jnp.float32)[None, :],
        layers[1]["w"].astype(cdt),
        layers[1]["b"].astype(jnp.float32)[None, :],
        ln["scale"].astype(jnp.float32)[None, :],
        ln["bias"].astype(jnp.float32)[None, :],
        jnp.full((hidden, hidden), 1.0 / hidden, jnp.float32),
    ]


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    pad = rows - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    return x


def _fused_fwd_impl(
    layout: BlockedLayout,
    edge2d: jax.Array,
    send2d: jax.Array,
    rec2d: jax.Array,
    wb: dict,
    stripe: int,
    *,
    layer_norm: bool,
    update_edges: bool,
    propagation: bool,
    edge_unbatched: bool,
    interpret: bool,
    emb_weights=None,
    save_pre: bool = False,
    node_weights=None,
    node_layer_norm: bool = False,
    cdt=jnp.float32,
    pre_dt=jnp.float32,
    dyn=None,
):
    from .pallas_segment import _dyn_or_static

    cb, ids = _dyn_or_static(layout, dyn)
    embed_edges = emb_weights is not None
    lanes = send2d.shape[1]
    in_feat = edge2d.shape[1] if edge_unbatched else None
    # with the in-kernel embedder, the GNN-side edge width is the
    # embedding dim, not the raw feature width
    feat = emb_weights[2].shape[1] if embed_edges else in_feat
    n_stripes = lanes // stripe
    n_chunks = int(layout.chunk_block.shape[0])
    out_rows = layout.num_blocks * layout.block_rows
    # Padded residency: a caller that already keeps the receiver array
    # at the block-padded row count skips the pad copy here and gets
    # the aggregation back unsliced (pad rows are exact zeros).
    padded_io = rec2d.shape[0] == out_rows and out_rows != layout.num_rec
    rec_pad = rec2d if padded_io else _pad_rows(rec2d, out_rows)
    ce, br = layout.chunk_edges, layout.block_rows

    def cix(s, c, cb):
        return (c, s)

    def bix(s, c, cb):
        return (cb[c], s)

    const = lambda s, c, cb: (0, 0)  # noqa: E731

    def cs(shape):
        return pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)

    edge_spec = (
        pl.BlockSpec((ce, in_feat), lambda s, c, cb: (c, 0),
                     memory_space=pltpu.VMEM)
        if edge_unbatched
        else pl.BlockSpec((ce, stripe), cix, memory_space=pltpu.VMEM)
    )
    w1e_spec = (
        cs((feat, stripe)) if edge_unbatched else cs((stripe, stripe))
    )
    in_specs = [
        pl.BlockSpec((1, ce), lambda s, c, cb: (0, c),
                     memory_space=pltpu.VMEM),
        edge_spec,
        pl.BlockSpec((ce, stripe), cix, memory_space=pltpu.VMEM),  # send
        pl.BlockSpec((br, stripe), bix, memory_space=pltpu.VMEM),  # rec
        w1e_spec,
        cs((stripe, stripe)),
        cs((stripe, stripe)),
        cs((1, stripe)),
        cs((stripe, stripe)),
        cs((1, stripe)),
        cs((1, stripe)),
        cs((1, stripe)),
        cs((stripe, stripe)),
    ]
    operands = [
        cb,
        ids,
        edge2d,
        send2d,
        rec_pad,
        wb["w1e"],
        wb["w1s"],
        wb["w1r"],
        wb["b1"],
        wb["w2"],
        wb["b2"],
        wb["gamma"],
        wb["beta"],
        wb["mmat"],
    ]
    if layout.aligned_groups:
        in_specs.append(
            pl.BlockSpec((ce, 1), lambda s, c, cb: (c, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(layout.live_col)
    if embed_edges:
        in_specs += [cs(tuple(w.shape)) for w in emb_weights]
        operands += list(emb_weights)
    if edge_unbatched and update_edges:
        in_specs.append(cs((feat, stripe)))
        operands.append(wb["tile"])
    if node_weights is not None:
        for key in ("war", "wag", "ba1", "wa2", "ba2", "gn", "bn"):
            w = node_weights[key]
            in_specs.append(cs(tuple(w.shape)))
            operands.append(w)
    out_specs = [pl.BlockSpec((br, stripe), bix, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32)]
    if update_edges:
        out_specs.append(
            pl.BlockSpec((ce, stripe), cix, memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((layout.num_blocked, lanes), jnp.float32)
        )
    if node_weights is not None:
        out_specs.append(
            pl.BlockSpec((br, stripe), bix, memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32)
        )
    if save_pre:
        out_specs.append(
            pl.BlockSpec((ce, stripe), cix, memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((layout.num_blocked, lanes), pre_dt)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_stripes, n_chunks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    kernel = functools.partial(
        _fused_fwd_kernel,
        block_rows=br,
        chunk_edges=ce,
        layer_norm=layer_norm,
        update_edges=update_edges,
        propagation=propagation,
        edge_unbatched=edge_unbatched,
        embed_edges=embed_edges,
        save_pre=save_pre,
        node_epilogue=node_weights is not None,
        node_layer_norm=node_layer_norm,
        aligned=layout.aligned_groups,
        cdt=cdt,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    aggregated = outs[0] if padded_io else outs[0][: layout.num_rec]
    new_edge = outs[1] if update_edges else None
    pre = outs[-1] if save_pre else None
    node_out = None
    if node_weights is not None:
        raw = outs[2 if update_edges else 1]
        node_out = raw if padded_io else raw[: layout.num_rec]
        # the backward wants the block-padded aggregate regardless of
        # the caller's residency
        aggregated = outs[0]
    return aggregated, new_edge, pre, node_out


def _fused_bwd_impl(
    layout: BlockedLayout,
    edge2d: jax.Array,
    send2d: jax.Array,
    rec2d: jax.Array,
    wb: dict,
    d_aggr: jax.Array,
    d_new_edge,
    stripe: int,
    *,
    layer_norm: bool,
    update_edges: bool,
    propagation: bool,
    edge_unbatched: bool,
    interpret: bool,
    emb_weights=None,
    pre2d=None,
    node_weights=None,
    node_layer_norm: bool = False,
    d_node=None,
    cdt=jnp.float32,
    io_dt=jnp.float32,
    dyn=None,
):
    from .pallas_segment import _dyn_or_static

    cb, ids = _dyn_or_static(layout, dyn)
    embed_edges = emb_weights is not None
    node_epilogue = node_weights is not None
    lanes = send2d.shape[1]
    in_feat = edge2d.shape[1] if edge_unbatched else None
    feat = emb_weights[2].shape[1] if embed_edges else in_feat
    n_stripes = lanes // stripe
    n_chunks = int(layout.chunk_block.shape[0])
    out_rows = layout.num_blocks * layout.block_rows
    if pre2d is not None and not node_epilogue:
        # The kernel never reads the receiver block when the forward
        # saved the pre-activations; a constant-indexed stub avoids
        # streaming the whole block-padded node array once per stripe.
        # (The node epilogue's backward always needs the real block —
        # the node-MLP recompute and dWar read it.)
        rec_pad = jnp.zeros((8, 128), rec2d.dtype)
    elif rec2d.shape[0] == out_rows:
        rec_pad = rec2d
    else:
        rec_pad = _pad_rows(rec2d, out_rows)
    if not node_epilogue:
        # epilogue mode reuses this operand slot for the forward-saved
        # aggregate, which is already block-padded f32
        d_aggr = d_aggr.astype(io_dt)
    d_aggr_pad = d_aggr if d_aggr.shape[0] == out_rows else _pad_rows(
        d_aggr, out_rows
    )
    ce, br = layout.chunk_edges, layout.block_rows

    def cix(s, c, cb):
        return (c, s)

    def bix(s, c, cb):
        return (cb[c], s)

    const = lambda s, c, cb: (0, 0)  # noqa: E731

    def cs(shape):
        return pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)

    cspec = pl.BlockSpec((ce, stripe), cix, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((br, stripe), bix, memory_space=pltpu.VMEM)
    wspec = cs((stripe, stripe))
    vspec = cs((1, stripe))
    if edge_unbatched:
        edge_spec = pl.BlockSpec(
            (ce, in_feat), lambda s, c, cb: (c, 0),
            memory_space=pltpu.VMEM,
        )
        w1e_spec = cs((feat, stripe))
        # Per-stripe planes, summed over stripes by the caller. A
        # leading stripe axis (instead of stripe-wide lanes) keeps the
        # trailing block dims equal to the array dims — Mosaic rejects
        # a (ce, feat) block carved out of (E, n_stripes*feat) lanes.
        d_edge_spec = pl.BlockSpec(
            (1, ce, feat),
            lambda s, c, cb: (s, c, 0),
            memory_space=pltpu.VMEM,
        )
        d_edge_shape = jax.ShapeDtypeStruct(
            (n_stripes, layout.num_blocked, feat), jnp.float32
        )
        dw1e_spec = w1e_spec
        dw1e_shape = jax.ShapeDtypeStruct((feat, stripe), jnp.float32)
    else:
        edge_spec, w1e_spec = cspec, wspec
        d_edge_spec = cspec
        d_edge_shape = jax.ShapeDtypeStruct(
            (layout.num_blocked, lanes), jnp.float32
        )
        dw1e_spec = wspec
        dw1e_shape = jax.ShapeDtypeStruct((stripe, stripe), jnp.float32)

    rec_spec = (
        cs((8, 128))
        if (pre2d is not None and not node_epilogue)
        else bspec
    )
    in_specs = [
        pl.BlockSpec((1, ce), lambda s, c, cb: (0, c),
                     memory_space=pltpu.VMEM),
        edge_spec,
        cspec,  # send
        rec_spec,  # rec (stub when the forward saved pre-activations)
        bspec,  # d_aggr
        w1e_spec,
        wspec,  # w1s
        wspec,  # w1r
        vspec,  # b1
        wspec,  # w2
        vspec,  # b2
        vspec,  # gamma
        wspec,  # mmat
    ]
    operands = [
        cb,
        ids,
        edge2d,
        send2d,
        rec_pad,
        d_aggr_pad,
        wb["w1e"],
        wb["w1s"],
        wb["w1r"],
        wb["b1"],
        wb["w2"],
        wb["b2"],
        wb["gamma"],
        wb["mmat"],
    ]
    if layout.aligned_groups:
        in_specs.append(
            pl.BlockSpec((ce, 1), lambda s, c, cb: (c, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(layout.live_col)
    if embed_edges:
        in_specs += [cs(tuple(w.shape)) for w in emb_weights]
        operands += list(emb_weights)
    if update_edges:
        in_specs.append(cspec)
        operands.append(d_new_edge.astype(io_dt))
        if edge_unbatched:
            in_specs.append(cs((feat, stripe)))
            operands.append(wb["tile"])
    if pre2d is not None:
        in_specs.append(cspec)
        operands.append(pre2d)
    if node_epilogue:
        in_specs.append(bspec)
        operands.append(
            _pad_rows(d_node.astype(io_dt), out_rows)
            if d_node.shape[0] != out_rows
            else d_node.astype(io_dt)
        )
        for key in ("war", "wag", "ba1", "wa2", "ba2", "gn"):
            w = node_weights[key]
            in_specs.append(cs(tuple(w.shape)))
            operands.append(w)

    e_rows = layout.num_blocked
    head_specs = []
    head_shapes = []
    if embed_edges:
        # embedder weight-grad accumulators replace the d_edge output
        for w in emb_weights[:6]:
            head_specs.append(cs(tuple(w.shape)))
            head_shapes.append(
                jax.ShapeDtypeStruct(tuple(w.shape), jnp.float32)
            )
    else:
        head_specs.append(d_edge_spec)
        head_shapes.append(d_edge_shape)
    out_specs = tuple(head_specs) + (
        cspec,  # d_send
        bspec,  # d_recproj
        dw1e_spec,
        wspec,  # dw1s
        wspec,  # dw2
        vspec,  # db1
        vspec,  # db2
        vspec,  # dgamma
        vspec,  # dbeta
    )
    out_shape = tuple(head_shapes) + (
        jax.ShapeDtypeStruct((e_rows, lanes), jnp.float32),
        jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32),
        dw1e_shape,
        jax.ShapeDtypeStruct((stripe, stripe), jnp.float32),
        jax.ShapeDtypeStruct((stripe, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
    )
    scratch_shapes = []
    if node_epilogue:
        out_specs = out_specs + (
            bspec,  # d_rec_extra (residual + War path), per block
            wspec,  # dwar
            wspec,  # dwag
            wspec,  # dwa2
            vspec,  # dba1
            vspec,  # dba2
            vspec,  # dgamma_n
            vspec,  # dbeta_n
        )
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((stripe, stripe), jnp.float32),
            jax.ShapeDtypeStruct((stripe, stripe), jnp.float32),
            jax.ShapeDtypeStruct((stripe, stripe), jnp.float32),
            jax.ShapeDtypeStruct((1, stripe), jnp.float32),
            jax.ShapeDtypeStruct((1, stripe), jnp.float32),
            jax.ShapeDtypeStruct((1, stripe), jnp.float32),
            jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        )
        scratch_shapes = [pltpu.VMEM((br, stripe), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_stripes, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _fused_bwd_kernel,
        block_rows=br,
        chunk_edges=ce,
        layer_norm=layer_norm,
        update_edges=update_edges,
        propagation=propagation,
        edge_unbatched=edge_unbatched,
        embed_edges=embed_edges,
        saved_pre=pre2d is not None,
        node_epilogue=node_epilogue,
        node_layer_norm=node_layer_norm,
        aligned=layout.aligned_groups,
        cdt=cdt,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)


def _sum_diag_blocks(acc: jax.Array, d_in: int, d_out: int) -> jax.Array:
    """Sum the diagonal ``(d_in, d_out)`` blocks of a block-structured
    ``(g*d_in, g*d_out)`` accumulation (the true weight grad under the
    ``kron(I_g, W)`` parameterisation)."""
    g = acc.shape[0] // d_in
    return jnp.einsum("gigo->io", acc.reshape(g, d_in, g, d_out))


def _fold_groups(vec_acc: jax.Array, dim: int) -> jax.Array:
    """(1, g*dim) accumulated row -> (dim,) by summing groups."""
    return vec_acc.reshape(-1, dim).sum(axis=0)


def fusable(mlp_params: dict) -> bool:
    """True if the edge MLP has the 2-linear-layer shape the fused
    kernel implements (the ``hidden_layers=1`` default)."""
    layers = mlp_params["layers"]
    if len(layers) != 2:
        return False
    d3, h = layers[0]["w"].shape
    if d3 != 3 * h:  # edge/send/rec parts must all be hidden-width
        return False
    if layers[1]["w"].shape != (h, h):
        return False
    return True


def aggr_fusable(aggr_params: dict) -> bool:
    """True if the aggregation-side node MLP has the 2-linear-layer
    shape the in-kernel epilogue implements (``hidden_layers=1``: a
    ``(2D, D)`` receiver/aggregate first layer + ``(D, D)`` second)."""
    layers = aggr_params["layers"]
    if len(layers) != 2:
        return False
    d2, h = layers[0]["w"].shape
    if d2 != 2 * h:
        return False
    return layers[1]["w"].shape == (h, h)


def fused_aggr_enabled() -> bool:
    """NEURAL_LAM_TPU_FUSED_AGGR gate (default off): run the node MLP
    as an in-kernel epilogue where supported (interaction wiring, sum
    aggregation, unchunked 2-layer aggr MLP).

    Measured on v5e at MEPS size (same-session A/B,
    docs/performance.md): fp32 train step NEUTRAL (9.41M vs 9.43M
    grid-points/s), 19-step forward-only rollout -7% (10.78M vs
    11.61M), bf16 train ~-5%. The kernels are MXU-bound at the one-hot
    roofline, so moving the node-MLP FLOPs INTO the per-block grid
    (small serialized matmuls) costs more MXU time than the saved
    aggregate HBM round-trip is worth — the XLA tail ran the same
    FLOPs as two full-width grid-sized matmuls at better utilisation.
    Kept as an option (``on``) for memory-constrained configurations:
    it removes the concat/hidden intermediates from HBM.
    """
    import os

    return os.environ.get("NEURAL_LAM_TPU_FUSED_AGGR", "off") == "on"


def make_fused_interaction(
    layout: BlockedLayout,
    *,
    update_edges: bool,
    propagation: bool,
    interpret: bool,
):
    """Build the differentiable fused edge phase for one edge set.

    Returns ``fused(mlp_params, edge_rep, x_send, rec_rep,
    emb_params=None, edge_feats=None) -> (aggregated_sum,
    new_edge | None)`` on node-major arrays (``(E, [B,] D)`` /
    ``(N_rec, [B,] D)``). Aggregation is always the *sum*; mean
    (propagation) is divided outside so its gradient is handled by
    autodiff.

    With per-call ``edge_feats`` (the static per-edge features in
    blocked slot order) and ``emb_params``, the edge-embedder MLP runs
    inside the kernel on the raw features, ``edge_rep`` is ignored and
    the embedding never materialises in HBM. ``edge_feats`` must be
    passed per call (never captured here): the returned closure is
    cached on the EdgeSet, and a trace-time capture would leak tracers
    across jit boundaries.
    """

    def run(
        mlp_params, edge_rep, x_send, rec_rep,
        emb_params=None, edge_feats=None, dyn_layout=None,
        aggr_params=None,
    ):
        # Per-call (possibly traced) layout index arrays: the sharded
        # executor threads per-shard layouts through one traced body
        # (shapes/tiling static from ``layout``, values as data).
        if dyn_layout is not None and layout.aligned_groups:
            # the aligned fast path ignores the id tables (positional
            # math), so per-shard dynamic tables cannot ride it
            raise ValueError(
                "dyn_layout is incompatible with an aligned layout: "
                "build the kernel closure from a non-aligned "
                "BlockedLayout for dynamically threaded tables"
            )
        cb0, ids0 = (
            dyn_layout
            if dyn_layout is not None
            else (layout.chunk_block, layout.local_ids)
        )
        batched = x_send.ndim == 3
        embed = emb_params is not None
        if embed:
            assert edge_feats is not None, "edge_feats required to embed"
        feats2 = (
            jnp.asarray(edge_feats, jnp.float32)
            if edge_feats is not None
            else None
        )
        edge_unbatched = embed or (batched and edge_rep.ndim == 2)
        # The node/receiver stream dtype governs output dtype — under
        # matmul_high the sender gather already rides bf16 while the
        # node stream (and therefore the aggregation output) stays f32.
        in_dtype = rec_rep.dtype
        # Mixed precision reaches INTO the kernel: bf16 inputs select
        # bf16 matmul operands (f32 accumulation and f32 elementwise
        # math throughout). NEURAL_LAM_TPU_BF16_KERNELS=off keeps the
        # kernels f32 with boundary casts instead.
        # NEURAL_LAM_TPU_MATMUL_PRECISION=high (or high-kernels, which
        # leaves the gather IO streams f32) selects bf16 operands for
        # f32 inputs too — the TF32-equivalent of the reference's
        # float32_matmul_precision("high") CUDA default (see
        # segment.kernel_matmul_high); inputs/outputs/accumulation
        # stay f32.
        import os as _os

        from .segment import kernel_matmul_high as _mh
        from .segment import matmul_high as _mh_full

        bf16_streams = (
            in_dtype == jnp.bfloat16
            and _os.environ.get("NEURAL_LAM_TPU_BF16_KERNELS", "auto")
            != "off"
        )
        # cdt: in-kernel matmul operand dtype. io_dt: the dtype the HBM
        # streams are materialised in. Under ``high-kernels`` only cdt
        # goes bf16 (the kernels cast operands in VMEM, IO stays exact
        # f32); full ``high`` (and mixed precision) thins the streams
        # themselves.
        cdt = jnp.bfloat16 if (bf16_streams or _mh()) else jnp.float32
        io_dt = jnp.bfloat16 if (bf16_streams or _mh_full()) else jnp.float32
        feat = x_send.shape[-1]
        if batched:
            b = x_send.shape[1]
            fold = lambda x: x.reshape(x.shape[0], b * feat)  # noqa: E731
        else:
            fold = lambda x: x  # noqa: E731
        groups = (x_send.shape[1] if batched else 1)
        stripe_g = _stripe_groups(groups, feat)
        stripe = stripe_g * feat
        n_stripes = (groups * feat) // stripe

        if embed:
            e2 = feats2.astype(io_dt)
        elif edge_unbatched:
            e2 = edge_rep.astype(io_dt)
        else:
            e2 = fold(edge_rep).astype(io_dt)
        s2 = fold(x_send).astype(io_dt)
        r2 = fold(rec_rep).astype(io_dt)
        ln = mlp_params["ln"] is not None

        # Save the per-edge first-layer pre-activations as a VJP
        # residual so the backward kernel skips their recompute (the
        # rec-projection, receiver-gather and first-layer matmuls).
        # Trades ~(E_blocked, lanes) of HBM per edge set for the
        # recompute FLOPs — measured +3.6% on the MEPS step. Default
        # on (f32 residual); NEURAL_LAM_TPU_CACHE_PRE=bf16 stores the
        # residual in bf16, halving the largest per-edge stream (the
        # backward recompute of silu/LN from a bf16-rounded pre is on
        # par with the implicit bf16 operand rounding the hardware
        # matmul default already applies — see
        # docs/performance.md "Matmul precision on TPU");
        # NEURAL_LAM_TPU_CACHE_PRE=off restores full recompute (lowest
        # memory).
        import os as _os2

        _cache_pre = _os2.environ.get("NEURAL_LAM_TPU_CACHE_PRE", "on")
        save_pre = _cache_pre != "off"
        pre_dt = jnp.bfloat16 if _cache_pre == "bf16" else jnp.float32

        node_ep = aggr_params is not None
        ln_n = node_ep and aggr_params["ln"] is not None

        def _impl(
            wb, ew, e2d, s2d, r2d, cb, ids, with_pre=False, nwb=None
        ):
            return _fused_fwd_impl(
                layout, e2d, s2d, r2d, wb, stripe,
                layer_norm=ln,
                update_edges=update_edges,
                propagation=propagation,
                edge_unbatched=edge_unbatched,
                interpret=interpret,
                emb_weights=ew,
                save_pre=with_pre,
                node_weights=nwb,
                node_layer_norm=ln_n,
                cdt=cdt,
                pre_dt=pre_dt,
                dyn=(cb, ids),
            )

        @jax.custom_vjp
        def fused(params, nparams, eparams, e2d, s2d, r2d, cb, ids):
            wb = _prep_weights(params, stripe_g, feat, edge_unbatched, cdt)
            ew = _prep_embedder_weights(eparams, cdt) if embed else None
            nwb = (
                _prep_node_weights(nparams, stripe_g, cdt)
                if node_ep
                else None
            )
            outs = _impl(wb, ew, e2d, s2d, r2d, cb, ids, nwb=nwb)
            if node_ep:
                return outs[3], outs[1]
            return outs[:2]

        def fwd(params, nparams, eparams, e2d, s2d, r2d, cb, ids):
            # The kernel-layout weights (kron-striped blocks, tiled
            # rows) are saved as residuals so the backward reuses them:
            # rebuilding them per call is a storm of tiny ops (the
            # arrays themselves are small).
            wb = _prep_weights(params, stripe_g, feat, edge_unbatched, cdt)
            ew = _prep_embedder_weights(eparams, cdt) if embed else None
            nwb = (
                _prep_node_weights(nparams, stripe_g, cdt)
                if node_ep
                else None
            )
            aggregated, new_edge, pre2d, node_out = _impl(
                wb, ew, e2d, s2d, r2d, cb, ids, with_pre=save_pre,
                nwb=nwb,
            )
            out = (node_out, new_edge) if node_ep else (
                aggregated, new_edge
            )
            # epilogue: the block-padded aggregate is the extra
            # residual its backward recomputes the node MLP from
            agg_res = aggregated if node_ep else None
            return (
                out,
                (params, nparams, eparams, wb, nwb, ew, e2d, s2d, r2d,
                 pre2d, agg_res, cb, ids),
            )

        def bwd(res, grads):
            (params, nparams, eparams, wb, nwb, ew, e2d, s2d, r2d,
             pre2d, agg_res, cb, ids) = res
            d_head, d_new_edge = grads
            outs = _fused_bwd_impl(
                layout, e2d, s2d, r2d, wb,
                agg_res if node_ep else d_head,
                d_new_edge, stripe,
                layer_norm=ln,
                update_edges=update_edges,
                propagation=propagation,
                edge_unbatched=edge_unbatched,
                interpret=interpret,
                emb_weights=ew,
                pre2d=pre2d,
                node_weights=nwb,
                node_layer_norm=ln_n,
                d_node=d_head if node_ep else None,
                cdt=cdt,
                io_dt=io_dt,
                dyn=(cb, ids),
            )
            d_nparams = None
            if node_ep:
                (d_rec_extra, dwar_a, dwag_a, dwa2_a,
                 dba1_a, dba2_a, dgn_a, dbn_a) = outs[-8:]
                outs = outs[:-8]
                hidden_n = feat
                dwa1 = jnp.concatenate(
                    [
                        _sum_diag_blocks(dwar_a, hidden_n, hidden_n),
                        _sum_diag_blocks(dwag_a, hidden_n, hidden_n),
                    ],
                    axis=0,
                )
                d_nparams = {
                    "layers": [
                        {"w": dwa1, "b": _fold_groups(dba1_a, hidden_n)},
                        {
                            "w": _sum_diag_blocks(
                                dwa2_a, hidden_n, hidden_n
                            ),
                            "b": _fold_groups(dba2_a, hidden_n),
                        },
                    ],
                    "ln": (
                        {
                            "scale": _fold_groups(dgn_a, hidden_n),
                            "bias": _fold_groups(dbn_a, hidden_n),
                        }
                        if ln_n
                        else None
                    ),
                }
                d_nparams = jax.tree_util.tree_map(
                    lambda g, p: g.astype(p.dtype), d_nparams, nparams
                )
            if embed:
                (dew1, deb1, dew2, deb2, deg_e, debt_e,
                 d_send, d_recproj, dw1e_a, dw1s_a, dw2_a,
                 db1_a, db2_a, dg_a, dbeta_a) = outs
                d_edge = None
            else:
                (d_edge, d_send, d_recproj, dw1e_a, dw1s_a, dw2_a,
                 db1_a, db2_a, dg_a, dbeta_a) = outs
            hidden = feat
            d_recproj = d_recproj[: r2d.shape[0]]
            # rec grad + rec-side weight grad finish outside the kernel
            # (N-sized ops; XLA fuses them).
            w1r = params["layers"][0]["w"][2 * hidden :].astype(jnp.float32)
            drp = d_recproj.reshape(r2d.shape[0], -1, hidden)
            d_rec = jnp.einsum("ngh,dh->ngd", drp, w1r).reshape(r2d.shape)
            rg = r2d.reshape(r2d.shape[0], -1, hidden)
            dw1r = jnp.einsum("ngd,ngh->dh", rg, drp)
            if node_ep:
                # node-MLP receiver grad: residual + the War path,
                # emitted per block by the epilogue backward
                d_rec = d_rec + d_rec_extra[: r2d.shape[0]]

            if edge_unbatched:
                if not embed:
                    # (n_stripes, E, D) per-stripe planes -> (E, D)
                    d_edge = d_edge.sum(axis=0)
                # (D, stripe) accumulator -> (D, H) by group fold
                dw1e = dw1e_a.reshape(hidden, stripe_g, hidden).sum(
                    axis=1
                )
            else:
                dw1e = _sum_diag_blocks(dw1e_a, hidden, hidden)
            dw1s = _sum_diag_blocks(dw1s_a, hidden, hidden)
            dw1 = jnp.concatenate([dw1e, dw1s, dw1r], axis=0)
            d_params = {
                "layers": [
                    {"w": dw1, "b": _fold_groups(db1_a, hidden)},
                    {
                        "w": _sum_diag_blocks(dw2_a, hidden, hidden),
                        "b": _fold_groups(db2_a, hidden),
                    },
                ],
                "ln": (
                    {
                        "scale": _fold_groups(dg_a, hidden),
                        "bias": _fold_groups(dbeta_a, hidden),
                    }
                    if ln
                    else None
                ),
            }
            # custom_vjp cotangents must match primal dtypes (params may
            # arrive bf16 under mixed precision).
            d_params = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), d_params, params
            )
            if embed:
                d_eparams = {
                    "layers": [
                        {"w": dew1, "b": deb1[0]},
                        {"w": dew2, "b": deb2[0]},
                    ],
                    "ln": {"scale": deg_e[0], "bias": debt_e[0]},
                }
                d_eparams = jax.tree_util.tree_map(
                    lambda g, p: g.astype(p.dtype), d_eparams, eparams
                )
                d_e2d = jnp.zeros_like(e2d)  # features are constants
            else:
                d_eparams = None
                d_e2d = d_edge.astype(e2d.dtype)
            f0 = lambda a: np.zeros(  # noqa: E731
                a.shape, dtype=jax.dtypes.float0
            )
            return (
                d_params,
                d_nparams,
                d_eparams,
                d_e2d,
                d_send.astype(s2d.dtype),
                d_rec.astype(r2d.dtype),
                f0(cb),
                f0(ids),
            )

        fused.defvjp(fwd, bwd)

        head, new_edge = fused(
            mlp_params, aggr_params, emb_params, e2, s2, r2, cb0, ids0
        )
        unfold = (
            (lambda x: x.reshape(x.shape[0], groups, feat))
            if batched
            else (lambda x: x)
        )
        head = unfold(head).astype(in_dtype)
        if new_edge is not None:
            new_edge = unfold(new_edge).astype(in_dtype)
        # epilogue mode: ``head`` is the UPDATED RECEIVER REP (the node
        # MLP + residual ran in-kernel); otherwise the aggregate
        return head, new_edge

    return run


# ===========================================================================
# v2: banded sender-gather prologue merged into the fused kernel, with
# the first-layer sender/receiver projections hoisted to node-sized XLA
# matmuls outside the kernel.
# ===========================================================================
# Motivation (measured profile, docs/performance.md "Roofline position"):
# v1 streams the banded-expanded ``x_send`` (E_blocked, lanes) through
# HBM twice per direction (expand-kernel write + fused-kernel read) and
# spends two per-chunk block-diagonal matmuls (``rec_proj``,
# ``x_send @ W1s``) recomputing projections that are cheaper at NODE
# granularity. v2 restructures the forward:
#
# - the sender/receiver first-layer projections run OUTSIDE the kernel
#   on the node arrays (N*B rows instead of E_blocked*B slots — the
#   MEPS m2g edge set has 40x more edge slots than mesh sender nodes),
#   under plain autodiff, so their weight/input grads need no kernel
#   code at all;
# - the kernel grid becomes VISIT-major (the banded gather's
#   per-(chunk, window) visits): each visit one-hot-gathers projected
#   sender rows from the VMEM-resident window into a scratch
#   accumulator, and the last visit of a chunk runs the edge MLP +
#   LayerNorm + aggregation exactly like v1 — ``x_send`` never exists
#   in HBM;
# - the backward kernel emits the first-layer pre-activation gradient
#   ``d_pre`` (same bytes v1 spent on ``d_send``) and skips BOTH the
#   per-chunk ``d_pre @ W1s^T`` transform and the ``dw1s``
#   accumulation; the banded scatter of ``d_pre`` feeds the outside
#   projection's autodiff.
#
# v2 requires: a banded sender layout, the saved-pre residual (the
# backward never reconstructs the gather), and interaction (not
# propagation) wiring. Callers route through
# ``fused_v2_supported`` and fall back to v1 otherwise.


def fused_v2_enabled() -> bool:
    """Coarse NEURAL_LAM_TPU_FUSED_V2 gate: ``off`` restores the v1
    expand->fused pipeline everywhere (used by equivalence tests and as
    an operational fallback). When not off, the per-edge-set choice is
    :func:`fused_v2_routed`."""
    import os

    if os.environ.get("NEURAL_LAM_TPU_FUSED_V2", "auto") == "off":
        return False
    # v2's backward needs the saved pre-activations
    return os.environ.get("NEURAL_LAM_TPU_CACHE_PRE", "on") != "off"


def fused_v2_routed(num_edge_slots: int, num_hoisted_rows: int) -> bool:
    """Per-edge-set v2 routing (mode ``auto``, the default).

    v2 trades the v1 pipeline's O(edge-slot) HBM streams (the
    materialised ``x_send`` expand, written once and re-read by the
    kernel) for O(node-row) boundary materialisations (the hoisted
    sender/receiver first-layer projections, their pads and layout
    copies at the Pallas boundary). Measured at MEPS size on v5e
    (docs/performance.md, all same-session): v1 everywhere 9.39M
    grid-points/s; v2 everywhere 8.2M (-13%); v2 on m2g+m2m only
    8.93M; v2 on m2m only 9.00M — v2 lost on EVERY MEPS edge set, with
    slot/hoisted-row ratios up to 4.9 (m2m). The kernel time itself
    drops (15.9 vs 17.3 ms of Pallas time) but the boundary pads,
    layout copies and hoisted projections cost more than the saved
    ``x_send`` stream at hidden_dim 64. The rule: take v2 iff
    ``edge_slots >= ratio * (sender_rows + padded_receiver rows)``;
    NEURAL_LAM_TPU_FUSED_V2_RATIO defaults to 8 — above every measured
    losing point (no MEPS set routes v2; a future graph with an 8x+
    ratio, where the saved stream dwarfs the boundary cost, would).
    Mode ``on`` forces v2 on every banded-capable set (the equivalence
    tests' hook).
    """
    import os

    if not fused_v2_enabled():
        return False
    if os.environ.get("NEURAL_LAM_TPU_FUSED_V2", "auto") == "on":
        return True
    ratio = float(os.environ.get("NEURAL_LAM_TPU_FUSED_V2_RATIO", "8"))
    return num_edge_slots >= ratio * max(num_hoisted_rows, 1)


def _fused_v2_fwd_kernel(
    gchunk_ref,  # scalar prefetch: chunk id per visit (non-decreasing)
    gwindow_ref,  # scalar prefetch: sender-window id per visit
    cb_ref,  # scalar prefetch: output block id per chunk
    gv_ids_ref,  # (1, C) window-local sender ids per visit; -1 dead
    ids_ref,  # (1, C) receiver-block-local ids per chunk; -1 dead
    edge_ref,
    sendp_ref,  # (W, stripe) projected sender window
    recp_ref,  # (BR, stripe) projected receiver block
    w1e_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    gamma_ref,
    beta_ref,
    mmat_ref,
    *rest,
    block_rows,
    win_rows,
    chunk_edges,
    n_visits,
    layer_norm,
    update_edges,
    edge_unbatched,
    embed_edges,
    cdt=jnp.float32,
):
    cv = lambda x: x.astype(cdt)  # noqa: E731
    rest = list(rest)
    emb_refs = rest[:7] if embed_edges else None
    if embed_edges:
        rest = rest[7:]
    tile_ref = rest.pop(0) if (edge_unbatched and update_edges) else None
    gath_ref = rest.pop()  # scratch (C, stripe) f32
    aggr_ref = rest.pop(0)
    new_edge_ref = rest.pop(0) if update_edges else None
    pre_ref = rest.pop(0)

    v = pl.program_id(1)
    c = gchunk_ref[v]
    prev_c = gchunk_ref[jnp.maximum(v - 1, 0)]
    first_visit = jnp.logical_or(v == 0, c != prev_c)
    nxt_c = gchunk_ref[jnp.minimum(v + 1, n_visits - 1)]
    last_visit = jnp.logical_or(v == n_visits - 1, nxt_c != c)
    prev_b = cb_ref[jnp.maximum(c - 1, 0)]
    first_chunk = jnp.logical_or(c == 0, cb_ref[c] != prev_b)

    # -- prologue: banded gather of projected sender rows ------------------
    gv_ids = gv_ids_ref[:]  # (1, C)
    rows_w = jax.lax.broadcasted_iota(
        jnp.int32, (win_rows, chunk_edges), dimension=0
    )
    onehot_w = (gv_ids == rows_w).astype(cdt)  # (W, C)
    contrib = jax.lax.dot_general(
        onehot_w,
        cv(sendp_ref[:]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, stripe)

    @pl.when(first_visit)
    def _():
        gath_ref[:] = contrib

    @pl.when(jnp.logical_not(first_visit))
    def _():
        gath_ref[:] += contrib

    # the output block is revisited by every visit of its chunks; zero it
    # once, at the first visit of its first chunk (before the last-visit
    # accumulation below can run)
    @pl.when(jnp.logical_and(first_visit, first_chunk))
    def _():
        aggr_ref[:] = jnp.zeros_like(aggr_ref)

    # -- epilogue: edge MLP + LN + aggregation on the chunk's last visit ---
    @pl.when(last_visit)
    def _():
        ids = ids_ref[:]  # (1, C)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, chunk_edges), dimension=0
        )
        one_hot_t = (ids == rows).astype(cdt)  # (BR, C)
        gathered_rec = jax.lax.dot_general(
            one_hot_t,
            cv(recp_ref[:]),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, stripe)
        if embed_edges:
            edge_val = _embed_forward(edge_ref[:], emb_refs, cdt)
        else:
            edge_val = edge_ref[:]
        pre = (
            jnp.dot(
                cv(edge_val), w1e_ref[:],
                preferred_element_type=jnp.float32,
            )
            + gath_ref[:]
            + gathered_rec
            + b1_ref[:]
        )
        pre_ref[:] = pre
        h1 = jax.nn.silu(pre)
        z = (
            jnp.dot(cv(h1), w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[:]
        )
        if layer_norm:
            mu = jnp.dot(z, mmat_ref[:], preferred_element_type=jnp.float32)
            cz = z - mu
            var = jnp.dot(
                cz * cz, mmat_ref[:], preferred_element_type=jnp.float32
            )
            msg = (
                cz * jax.lax.rsqrt(var + _LN_EPS) * gamma_ref[:]
                + beta_ref[:]
            )
        else:
            msg = z
        if update_edges:
            if edge_unbatched:
                edge_b = jnp.dot(
                    cv(edge_val), tile_ref[:],
                    preferred_element_type=jnp.float32,
                )
            else:
                edge_b = edge_val.astype(jnp.float32)
            new_edge_ref[:] = edge_b + msg
        aggr_ref[:] += jnp.dot(
            one_hot_t, cv(msg), preferred_element_type=jnp.float32
        )


def _fused_v2_bwd_kernel(
    chunk_block_ref,
    ids_ref,
    edge_ref,
    d_aggr_ref,
    pre_in_ref,
    w1e_ref,
    w2_ref,
    b2_ref,
    gamma_ref,
    mmat_ref,
    *rest_refs,
    block_rows,
    chunk_edges,
    layer_norm,
    update_edges,
    edge_unbatched,
    embed_edges,
    cdt=jnp.float32,
):
    """v1 backward minus the sender/receiver machinery: emits per-edge
    ``d_pre`` (the caller banded-scatters it to the projected-sender
    grad) and the per-block ``d_recproj``; no ``d_send`` transform, no
    ``dw1s``, no receiver recompute (pre is always saved)."""
    cv = lambda x: x.astype(cdt)  # noqa: E731
    rest_refs = list(rest_refs)
    emb_refs = rest_refs[:7] if embed_edges else None
    if embed_edges:
        rest_refs = rest_refs[7:]
    d_new_edge_ref = rest_refs.pop(0) if update_edges else None
    tile_ref = (
        rest_refs.pop(0) if (edge_unbatched and update_edges) else None
    )
    if embed_edges:
        d_edge_ref = None
        emb_accum_refs = rest_refs[:6]
        rest_refs = rest_refs[6:]
    else:
        d_edge_ref = rest_refs.pop(0)
        emb_accum_refs = None
    (
        d_pre_ref,
        d_recproj_ref,
        dw1e_ref,
        dw2_ref,
        db1_ref,
        db2_ref,
        dgamma_ref,
        dbeta_ref,
    ) = rest_refs[:8]

    s = pl.program_id(0)
    c = pl.program_id(1)
    prev = chunk_block_ref[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, chunk_block_ref[c] != prev)
    very_first = jnp.logical_and(s == 0, c == 0)

    @pl.when(is_first)
    def _():
        d_recproj_ref[:] = jnp.zeros_like(d_recproj_ref)

    @pl.when(very_first)
    def _():
        dw1e_ref[:] = jnp.zeros_like(dw1e_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    ids = ids_ref[:]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, chunk_edges), dimension=0
    )
    one_hot_t = (ids == rows).astype(cdt)

    if embed_edges:
        edge_val = cv(_embed_forward(edge_ref[:], emb_refs, cdt))
    else:
        edge_val = edge_ref[:]
    pre = pre_in_ref[:]
    h1 = jax.nn.silu(pre)
    z = (
        jnp.dot(cv(h1), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )

    d_msg = jax.lax.dot_general(
        one_hot_t,
        cv(d_aggr_ref[:]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if update_edges:
        d_msg = d_msg + d_new_edge_ref[:].astype(jnp.float32)

    if layer_norm:
        mu = jnp.dot(z, mmat_ref[:], preferred_element_type=jnp.float32)
        cz = z - mu
        var = jnp.dot(
            cz * cz, mmat_ref[:], preferred_element_type=jnp.float32
        )
        rinv = jax.lax.rsqrt(var + _LN_EPS)
        xhat = cz * rinv
        d_xhat = d_msg * gamma_ref[:]
        m1 = jnp.dot(
            d_xhat, mmat_ref[:], preferred_element_type=jnp.float32
        )
        m2 = jnp.dot(
            d_xhat * xhat, mmat_ref[:],
            preferred_element_type=jnp.float32,
        )
        dz = rinv * (d_xhat - m1 - xhat * m2)
        dgamma_ref[:] += jnp.sum(d_msg * xhat, axis=0, keepdims=True)
        dbeta_ref[:] += jnp.sum(d_msg, axis=0, keepdims=True)
    else:
        dz = d_msg

    dzc = cv(dz)
    d_h1 = jax.lax.dot_general(
        dzc,
        w2_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_ref[:] += jax.lax.dot_general(
        cv(h1), dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[:] += jnp.sum(dz, axis=0, keepdims=True)

    sig = jax.nn.sigmoid(pre)
    d_pre = d_h1 * (sig * (1.0 + pre * (1.0 - sig)))
    d_pre_ref[:] = d_pre
    d_prec = cv(d_pre)

    d_edge = jax.lax.dot_general(
        d_prec, w1e_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if update_edges:
        if edge_unbatched:
            d_edge = d_edge + jax.lax.dot_general(
                cv(d_new_edge_ref[:]), tile_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            d_edge = d_edge + d_new_edge_ref[:].astype(jnp.float32)
    if embed_edges:
        _embed_backward(
            edge_ref[:], d_edge, emb_refs, emb_accum_refs, very_first, cdt
        )
    elif edge_unbatched:
        d_edge_ref[0] = d_edge
    else:
        d_edge_ref[:] = d_edge

    dw1e_ref[:] += jax.lax.dot_general(
        cv(edge_val), d_prec, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] += jnp.sum(d_pre, axis=0, keepdims=True)
    d_recproj_ref[:] += jnp.dot(
        one_hot_t, d_prec, preferred_element_type=jnp.float32
    )


def _prep_weights_v2(
    mlp_params: dict,
    groups: int,
    feat_dim: int,
    edge_unbatched: bool,
    cdt=jnp.float32,
):
    """v2 kernel weights: like :func:`_prep_weights` but WITHOUT the
    sender/receiver first-layer blocks — those projections run outside
    the kernel at node granularity."""
    layers = mlp_params["layers"]
    w1 = layers[0]["w"].astype(jnp.float32)
    w1e, _, _ = jnp.split(w1, 3, axis=0)
    ln = mlp_params["ln"]
    hidden = w1.shape[1]
    if ln is not None:
        gamma, beta = ln["scale"], ln["bias"]
    else:
        gamma = jnp.ones((hidden,), jnp.float32)
        beta = jnp.zeros((hidden,), jnp.float32)
    if edge_unbatched:
        w1e_k = jnp.tile(w1e, (1, groups))
        tile = jnp.tile(jnp.eye(hidden, dtype=jnp.float32), (1, groups))
        tile = tile.astype(cdt)
    else:
        w1e_k = _block_diag(w1e, groups)
        tile = None
    return dict(
        w1e=w1e_k.astype(cdt),
        b1=_tile_vec(layers[0]["b"], groups),
        w2=_block_diag(layers[1]["w"].astype(jnp.float32), groups).astype(
            cdt
        ),
        b2=_tile_vec(layers[1]["b"], groups),
        gamma=_tile_vec(gamma, groups),
        beta=_tile_vec(beta, groups),
        mmat=_group_mean_matrix(groups, feat_dim),
        tile=tile,
    )


def _fused_v2_fwd_impl(
    layout: BlockedLayout,
    banded,
    edge2d: jax.Array,
    sendp2d: jax.Array,
    recp2d: jax.Array,
    wb: dict,
    stripe: int,
    *,
    layer_norm: bool,
    update_edges: bool,
    edge_unbatched: bool,
    interpret: bool,
    emb_weights=None,
    cdt=jnp.float32,
    dyn=None,
    dyn_gather=None,
):
    from .pallas_segment import _banded_dyn, _dyn_or_static

    cb, ids = _dyn_or_static(layout, dyn)
    gchunk, gwindow, gv_ids = _banded_dyn(banded, dyn_gather, scatter=False)
    embed_edges = emb_weights is not None
    lanes = sendp2d.shape[1]
    in_feat = edge2d.shape[1] if edge_unbatched else None
    feat = emb_weights[2].shape[1] if embed_edges else in_feat
    n_stripes = lanes // stripe
    n_chunks = int(layout.chunk_block.shape[0])
    n_visits = int(banded.gvisit_chunk.shape[0])
    out_rows = layout.num_blocks * layout.block_rows
    if recp2d.shape[0] != out_rows:
        recp2d = _pad_rows(recp2d, out_rows)
    if sendp2d.shape[0] != banded.padded_send_rows:
        sendp2d = _pad_rows(sendp2d, banded.padded_send_rows)
    ce, br, win = layout.chunk_edges, layout.block_rows, banded.win_rows
    if banded.n_chunks != n_chunks or banded.chunk_edges != ce:
        raise ValueError(
            "banded layout does not match the blocked layout: "
            f"{(banded.n_chunks, banded.chunk_edges)} vs {(n_chunks, ce)}"
        )

    const = lambda s, v, gc, gw, cb: (0, 0)  # noqa: E731

    def cs(shape):
        return pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)

    edge_spec = (
        pl.BlockSpec((ce, in_feat), lambda s, v, gc, gw, cb: (gc[v], 0),
                     memory_space=pltpu.VMEM)
        if edge_unbatched
        else pl.BlockSpec((ce, stripe), lambda s, v, gc, gw, cb: (gc[v], s),
                          memory_space=pltpu.VMEM)
    )
    w1e_spec = (
        cs((feat, stripe)) if edge_unbatched else cs((stripe, stripe))
    )
    in_specs = [
        pl.BlockSpec((1, ce), lambda s, v, gc, gw, cb: (0, v),
                     memory_space=pltpu.VMEM),  # gv_ids
        pl.BlockSpec((1, ce), lambda s, v, gc, gw, cb: (0, gc[v]),
                     memory_space=pltpu.VMEM),  # ids
        edge_spec,
        pl.BlockSpec((win, stripe), lambda s, v, gc, gw, cb: (gw[v], s),
                     memory_space=pltpu.VMEM),  # sendp window
        pl.BlockSpec((br, stripe),
                     lambda s, v, gc, gw, cb: (cb[gc[v]], s),
                     memory_space=pltpu.VMEM),  # recp block
        w1e_spec,
        cs((1, stripe)),  # b1
        cs((stripe, stripe)),  # w2
        cs((1, stripe)),  # b2
        cs((1, stripe)),  # gamma
        cs((1, stripe)),  # beta
        cs((stripe, stripe)),  # mmat
    ]
    operands = [
        gchunk,
        gwindow,
        cb,
        gv_ids,
        ids,
        edge2d,
        sendp2d,
        recp2d,
        wb["w1e"],
        wb["b1"],
        wb["w2"],
        wb["b2"],
        wb["gamma"],
        wb["beta"],
        wb["mmat"],
    ]
    if embed_edges:
        in_specs += [cs(tuple(w.shape)) for w in emb_weights]
        operands += list(emb_weights)
    if edge_unbatched and update_edges:
        in_specs.append(cs((feat, stripe)))
        operands.append(wb["tile"])

    chunk_out = pl.BlockSpec(
        (ce, stripe), lambda s, v, gc, gw, cb: (gc[v], s),
        memory_space=pltpu.VMEM,
    )
    out_specs = [
        pl.BlockSpec((br, stripe),
                     lambda s, v, gc, gw, cb: (cb[gc[v]], s),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32)]
    if update_edges:
        out_specs.append(chunk_out)
        out_shape.append(
            jax.ShapeDtypeStruct((layout.num_blocked, lanes), jnp.float32)
        )
    out_specs.append(chunk_out)  # pre (always saved in v2)
    out_shape.append(
        jax.ShapeDtypeStruct((layout.num_blocked, lanes), jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_stripes, n_visits),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((ce, stripe), jnp.float32)],
    )
    kernel = functools.partial(
        _fused_v2_fwd_kernel,
        block_rows=br,
        win_rows=win,
        chunk_edges=ce,
        n_visits=n_visits,
        layer_norm=layer_norm,
        update_edges=update_edges,
        edge_unbatched=edge_unbatched,
        embed_edges=embed_edges,
        cdt=cdt,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    aggregated = outs[0]
    new_edge = outs[1] if update_edges else None
    pre = outs[-1]
    return aggregated, new_edge, pre


def _fused_v2_bwd_impl(
    layout: BlockedLayout,
    edge2d: jax.Array,
    wb: dict,
    d_aggr: jax.Array,
    d_new_edge,
    pre2d: jax.Array,
    stripe: int,
    *,
    layer_norm: bool,
    update_edges: bool,
    edge_unbatched: bool,
    interpret: bool,
    emb_weights=None,
    cdt=jnp.float32,
    io_dt=jnp.float32,
    dyn=None,
):
    from .pallas_segment import _dyn_or_static

    cb, ids = _dyn_or_static(layout, dyn)
    embed_edges = emb_weights is not None
    lanes = pre2d.shape[1]
    in_feat = edge2d.shape[1] if edge_unbatched else None
    feat = emb_weights[2].shape[1] if embed_edges else in_feat
    n_stripes = lanes // stripe
    n_chunks = int(layout.chunk_block.shape[0])
    out_rows = layout.num_blocks * layout.block_rows
    d_aggr = d_aggr.astype(io_dt)
    d_aggr_pad = d_aggr if d_aggr.shape[0] == out_rows else _pad_rows(
        d_aggr, out_rows
    )
    ce, br = layout.chunk_edges, layout.block_rows

    def cix(s, c, cb):
        return (c, s)

    def bix(s, c, cb):
        return (cb[c], s)

    const = lambda s, c, cb: (0, 0)  # noqa: E731

    def cs(shape):
        return pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)

    cspec = pl.BlockSpec((ce, stripe), cix, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((br, stripe), bix, memory_space=pltpu.VMEM)
    wspec = cs((stripe, stripe))
    vspec = cs((1, stripe))
    if edge_unbatched:
        edge_spec = pl.BlockSpec(
            (ce, in_feat), lambda s, c, cb: (c, 0),
            memory_space=pltpu.VMEM,
        )
        w1e_spec = cs((feat, stripe))
        d_edge_spec = pl.BlockSpec(
            (1, ce, feat), lambda s, c, cb: (s, c, 0),
            memory_space=pltpu.VMEM,
        )
        d_edge_shape = jax.ShapeDtypeStruct(
            (n_stripes, layout.num_blocked, feat), jnp.float32
        )
        dw1e_spec = w1e_spec
        dw1e_shape = jax.ShapeDtypeStruct((feat, stripe), jnp.float32)
    else:
        edge_spec, w1e_spec = cspec, wspec
        d_edge_spec = cspec
        d_edge_shape = jax.ShapeDtypeStruct(
            (layout.num_blocked, lanes), jnp.float32
        )
        dw1e_spec = wspec
        dw1e_shape = jax.ShapeDtypeStruct((stripe, stripe), jnp.float32)

    in_specs = [
        pl.BlockSpec((1, ce), lambda s, c, cb: (0, c),
                     memory_space=pltpu.VMEM),
        edge_spec,
        bspec,  # d_aggr
        cspec,  # pre
        w1e_spec,
        wspec,  # w2
        vspec,  # b2
        vspec,  # gamma
        wspec,  # mmat
    ]
    operands = [
        cb,
        ids,
        edge2d,
        d_aggr_pad,
        pre2d,
        wb["w1e"],
        wb["w2"],
        wb["b2"],
        wb["gamma"],
        wb["mmat"],
    ]
    if embed_edges:
        in_specs += [cs(tuple(w.shape)) for w in emb_weights]
        operands += list(emb_weights)
    if update_edges:
        in_specs.append(cspec)
        operands.append(d_new_edge.astype(io_dt))
        if edge_unbatched:
            in_specs.append(cs((feat, stripe)))
            operands.append(wb["tile"])

    e_rows = layout.num_blocked
    head_specs = []
    head_shapes = []
    if embed_edges:
        for w in emb_weights[:6]:
            head_specs.append(cs(tuple(w.shape)))
            head_shapes.append(
                jax.ShapeDtypeStruct(tuple(w.shape), jnp.float32)
            )
    else:
        head_specs.append(d_edge_spec)
        head_shapes.append(d_edge_shape)
    out_specs = tuple(head_specs) + (
        cspec,  # d_pre
        bspec,  # d_recproj
        dw1e_spec,
        wspec,  # dw2
        vspec,  # db1
        vspec,  # db2
        vspec,  # dgamma
        vspec,  # dbeta
    )
    out_shape = tuple(head_shapes) + (
        jax.ShapeDtypeStruct((e_rows, lanes), jnp.float32),
        jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32),
        dw1e_shape,
        jax.ShapeDtypeStruct((stripe, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
        jax.ShapeDtypeStruct((1, stripe), jnp.float32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_stripes, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kernel = functools.partial(
        _fused_v2_bwd_kernel,
        block_rows=br,
        chunk_edges=ce,
        layer_norm=layer_norm,
        update_edges=update_edges,
        edge_unbatched=edge_unbatched,
        embed_edges=embed_edges,
        cdt=cdt,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)


def make_fused_interaction_v2(
    layout: BlockedLayout,
    banded,
    *,
    update_edges: bool,
    interpret: bool,
):
    """Build the v2 differentiable fused edge phase for one edge set.

    Returns ``fused(mlp_params, edge_rep, send_nodes, rec_nodes,
    emb_params=None, edge_feats=None, dyn_layout=None, dyn_banded=None)
    -> (aggregated_sum, new_edge | None)``.

    Unlike v1, ``send_nodes``/``rec_nodes`` are the NODE arrays
    (``(N_send, [B,] D)`` / ``(N_rec, [B,] D)``): the banded sender
    gather runs inside the kernel (visit-major prologue) and the
    first-layer sender/receiver projections run outside at node
    granularity under plain autodiff. ``dyn_banded`` threads per-shard
    visit tables as ``(bg_group, bg_other, bg_ids, bs_group, bs_other,
    bs_ids)`` (the spatially sharded executor's table layout); the
    scatter tables are consumed by the backward's ``d_pre`` scatter.

    Interaction wiring only (PropagationNet keeps the v1 path: its
    sender residual needs raw per-edge sender rows).
    """

    def run(
        mlp_params, edge_rep, send_nodes, rec_nodes,
        emb_params=None, edge_feats=None,
        dyn_layout=None, dyn_banded=None,
    ):
        cb0, ids0 = (
            dyn_layout
            if dyn_layout is not None
            else (layout.chunk_block, layout.local_ids)
        )
        if dyn_banded is not None:
            (bgc0, bgw0, bgi0, bsg0, bso0, bsi0) = dyn_banded
        else:
            bgc0, bgw0, bgi0 = (
                banded.gvisit_chunk, banded.gvisit_window,
                banded.gvisit_ids,
            )
            bsg0, bso0, bsi0 = (
                banded.svisit_window, banded.svisit_chunk,
                banded.svisit_ids,
            )
        batched = send_nodes.ndim == 3
        embed = emb_params is not None
        if embed:
            assert edge_feats is not None, "edge_feats required to embed"
        feats2 = (
            jnp.asarray(edge_feats, jnp.float32)
            if edge_feats is not None
            else None
        )
        edge_unbatched = embed or (batched and edge_rep.ndim == 2)
        in_dtype = rec_nodes.dtype
        import os as _os

        from .segment import kernel_matmul_high as _mh
        from .segment import matmul_high as _mh_full

        bf16_streams = (
            in_dtype == jnp.bfloat16
            and _os.environ.get("NEURAL_LAM_TPU_BF16_KERNELS", "auto")
            != "off"
        )
        cdt = jnp.bfloat16 if (bf16_streams or _mh()) else jnp.float32
        io_dt = jnp.bfloat16 if (bf16_streams or _mh_full()) else jnp.float32
        feat = send_nodes.shape[-1]
        if batched:
            b = send_nodes.shape[1]
            fold = lambda x: x.reshape(x.shape[0], b * feat)  # noqa: E731
        else:
            fold = lambda x: x  # noqa: E731
        groups = send_nodes.shape[1] if batched else 1
        stripe_g = _stripe_groups(groups, feat)
        stripe = stripe_g * feat

        if embed:
            e2 = feats2.astype(io_dt)
        elif edge_unbatched:
            e2 = edge_rep.astype(io_dt)
        else:
            e2 = fold(edge_rep).astype(io_dt)
        s2 = fold(send_nodes)
        r2 = fold(rec_nodes)
        ln = mlp_params["ln"] is not None

        cv = lambda x: x.astype(cdt)  # noqa: E731

        def proj(x2d, w):
            """Node-granularity first-layer projection: fold the lane
            groups into rows (free row-major reshape), one (D, D)
            matmul with f32 accumulation, stream in ``io_dt``.

            Exact f32 operands when the kernel runs exact f32: XLA's
            DEFAULT precision rounds f32 matmul operands to bf16 on
            TPU, which would diverge from the in-kernel v1 projection
            (measured ~1e-3 relative drift over a full model step).
            """
            n = x2d.shape[0]
            xr = x2d.reshape(-1, feat)
            out = jax.lax.dot_general(
                cv(xr), cv(w), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(n, -1).astype(io_dt)

        # Outside-the-kernel projections: grads for w1s/w1r and the
        # node arrays come from plain autodiff; the custom VJP below
        # only covers the kernel (its d_params carries ZERO w1s/w1r
        # blocks, summed by JAX with the projections' contributions).
        w1 = mlp_params["layers"][0]["w"]
        hidden = feat
        w1s = w1[hidden : 2 * hidden].astype(jnp.float32)
        w1r = w1[2 * hidden :].astype(jnp.float32)
        sp2 = _pad_rows(proj(s2, w1s), banded.padded_send_rows)
        out_rows = layout.num_blocks * layout.block_rows
        rp2 = _pad_rows(proj(r2, w1r), out_rows)

        def _impl(wb, ew, e2d, sp2d, rp2d, cb, ids, bgc, bgw, bgi):
            return _fused_v2_fwd_impl(
                layout, banded, e2d, sp2d, rp2d, wb, stripe,
                layer_norm=ln,
                update_edges=update_edges,
                edge_unbatched=edge_unbatched,
                interpret=interpret,
                emb_weights=ew,
                cdt=cdt,
                dyn=(cb, ids),
                dyn_gather=(bgc, bgw, bgi),
            )

        @jax.custom_vjp
        def fused(
            params, eparams, e2d, sp2d, rp2d,
            cb, ids, bgc, bgw, bgi, bsg, bso, bsi,
        ):
            wb = _prep_weights_v2(
                params, stripe_g, feat, edge_unbatched, cdt
            )
            ew = _prep_embedder_weights(eparams, cdt) if embed else None
            return _impl(wb, ew, e2d, sp2d, rp2d, cb, ids, bgc, bgw, bgi)[
                :2
            ]

        def fwd(
            params, eparams, e2d, sp2d, rp2d,
            cb, ids, bgc, bgw, bgi, bsg, bso, bsi,
        ):
            wb = _prep_weights_v2(
                params, stripe_g, feat, edge_unbatched, cdt
            )
            ew = _prep_embedder_weights(eparams, cdt) if embed else None
            aggregated, new_edge, pre2d = _impl(
                wb, ew, e2d, sp2d, rp2d, cb, ids, bgc, bgw, bgi
            )
            return (
                (aggregated, new_edge),
                (
                    params, eparams, wb, ew, e2d, pre2d,
                    cb, ids, bgc, bgw, bgi, bsg, bso, bsi,
                ),
            )

        def bwd(res, grads):
            (
                params, eparams, wb, ew, e2d, pre2d,
                cb, ids, bgc, bgw, bgi, bsg, bso, bsi,
            ) = res
            # run() pads sp2d/rp2d to these static row counts before
            # the custom_vjp boundary, so the cotangents match exactly
            sp_rows = banded.padded_send_rows
            rp_rows = layout.num_blocks * layout.block_rows
            d_aggr, d_new_edge = grads
            outs = _fused_v2_bwd_impl(
                layout, e2d, wb, d_aggr, d_new_edge, pre2d, stripe,
                layer_norm=ln,
                update_edges=update_edges,
                edge_unbatched=edge_unbatched,
                interpret=interpret,
                emb_weights=ew,
                cdt=cdt,
                io_dt=io_dt,
                dyn=(cb, ids),
            )
            if embed:
                (dew1, deb1, dew2, deb2, deg_e, debt_e,
                 d_pre, d_recproj, dw1e_a, dw2_a,
                 db1_a, db2_a, dg_a, dbeta_a) = outs
                d_edge = None
            else:
                (d_edge, d_pre, d_recproj, dw1e_a, dw2_a,
                 db1_a, db2_a, dg_a, dbeta_a) = outs
            # sender-projection grad: banded scatter of d_pre (the
            # dual of the in-kernel gather prologue)
            from .pallas_segment import banded_scatter_nondiff

            d_sp = banded_scatter_nondiff(
                d_pre.astype(io_dt), banded, interpret,
                out_dtype=jnp.float32,
                keep_padded=True,
                dyn=(bsg, bso, bsi),
            )
            if d_sp.shape[0] != sp_rows:
                d_sp = d_sp[:sp_rows]
            d_rp = d_recproj[:rp_rows]

            if edge_unbatched:
                if not embed:
                    d_edge = d_edge.sum(axis=0)
                dw1e = dw1e_a.reshape(hidden, stripe_g, hidden).sum(axis=1)
            else:
                dw1e = _sum_diag_blocks(dw1e_a, hidden, hidden)
            zero_w = jnp.zeros((hidden, hidden), jnp.float32)
            dw1 = jnp.concatenate([dw1e, zero_w, zero_w], axis=0)
            d_params = {
                "layers": [
                    {"w": dw1, "b": _fold_groups(db1_a, hidden)},
                    {
                        "w": _sum_diag_blocks(dw2_a, hidden, hidden),
                        "b": _fold_groups(db2_a, hidden),
                    },
                ],
                "ln": (
                    {
                        "scale": _fold_groups(dg_a, hidden),
                        "bias": _fold_groups(dbeta_a, hidden),
                    }
                    if ln
                    else None
                ),
            }
            d_params = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), d_params, params
            )
            if embed:
                d_eparams = {
                    "layers": [
                        {"w": dew1, "b": deb1[0]},
                        {"w": dew2, "b": deb2[0]},
                    ],
                    "ln": {"scale": deg_e[0], "bias": debt_e[0]},
                }
                d_eparams = jax.tree_util.tree_map(
                    lambda g, p: g.astype(p.dtype), d_eparams, eparams
                )
                d_e2d = jnp.zeros_like(e2d)
            else:
                d_eparams = None
                d_e2d = d_edge.astype(e2d.dtype)
            f0 = lambda a: np.zeros(  # noqa: E731
                a.shape, dtype=jax.dtypes.float0
            )
            return (
                d_params,
                d_eparams,
                d_e2d,
                d_sp.astype(io_dt),
                d_rp.astype(io_dt),
                f0(cb), f0(ids), f0(bgc), f0(bgw), f0(bgi),
                f0(bsg), f0(bso), f0(bsi),
            )

        fused.defvjp(fwd, bwd)

        aggregated, new_edge = fused(
            mlp_params, emb_params, e2, sp2, rp2,
            cb0, ids0, bgc0, bgw0, bgi0, bsg0, bso0, bsi0,
        )
        # Same residency contract as v1: a caller that keeps the
        # receiver array block-padded gets the aggregation back
        # unsliced (pad rows are exact zeros); otherwise slice.
        if aggregated.shape[0] != rec_nodes.shape[0]:
            aggregated = aggregated[: rec_nodes.shape[0]]
        unfold = (
            (lambda x: x.reshape(x.shape[0], groups, feat))
            if batched
            else (lambda x: x)
        )
        aggregated = unfold(aggregated).astype(in_dtype)
        if new_edge is not None:
            new_edge = unfold(new_edge).astype(in_dtype)
        return aggregated, new_edge

    return run
