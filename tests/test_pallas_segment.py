"""Pallas blocked-CSR segment-sum kernel vs XLA oracle (interpret mode).

On CPU these run the kernel through the Pallas interpreter, exercising
the exact program that compiles for TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_lam_tpu.ops.interaction import make_edge_set, place_edge_features
from neural_lam_tpu.ops.pallas_segment import (
    build_blocked_layout,
    make_blocked_segment_sum,
)
from neural_lam_tpu.ops.segment import aggregate_mean, aggregate_sum


@pytest.mark.parametrize("block_rows,chunk_edges", [(64, 128), (128, 256)])
@pytest.mark.parametrize("shape", [(977, 301), (50, 700), (128, 64)])
def test_kernel_matches_segment_sum(shape, block_rows, chunk_edges):
    E, N = shape
    rng = np.random.default_rng(E + N)
    recv = np.sort(rng.integers(0, N, E))
    layout = build_blocked_layout(
        recv, N, block_rows=block_rows, chunk_edges=chunk_edges
    )
    msgs = rng.normal(size=(E, 32)).astype(np.float32)
    mb = np.zeros((layout.num_blocked, 32), np.float32)
    valid = layout.perm >= 0
    mb[valid] = msgs[layout.perm[valid]]

    seg = make_blocked_segment_sum(layout, interpret=True)
    out = seg(jnp.asarray(mb))
    ref = jax.ops.segment_sum(
        jnp.asarray(msgs), jnp.asarray(recv), num_segments=N
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_kernel_gradients_match(monkeypatch):
    E, N, D = 500, 130, 16
    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, N, E))
    layout = build_blocked_layout(recv, N, block_rows=64, chunk_edges=128)
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    mb = np.zeros((layout.num_blocked, D), np.float32)
    valid = layout.perm >= 0
    mb[valid] = msgs[layout.perm[valid]]
    seg = make_blocked_segment_sum(layout, interpret=True)

    w = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    g = jax.grad(lambda m: jnp.sum(seg(m) * w))(jnp.asarray(mb))
    g_ref = jax.grad(
        lambda m: jnp.sum(
            jax.ops.segment_sum(m, jnp.asarray(recv), num_segments=N) * w
        )
    )(jnp.asarray(msgs))
    got = np.asarray(g)[valid][np.argsort(layout.perm[valid])]
    np.testing.assert_allclose(got, np.asarray(g_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g)[~valid], 0.0)


def test_aggregate_dispatch_pallas_vs_fallback(monkeypatch):
    """aggregate_sum/mean must agree between the Pallas-interpret path
    and the XLA fallback on the same EdgeSet."""
    rng = np.random.default_rng(3)
    E, N, D = 300, 90, 8
    senders = rng.integers(0, 40, E)
    receivers = rng.integers(0, N, E)
    es, perm = make_edge_set(senders, receivers, num_rec=N)
    assert es.layout is not None
    msgs = rng.normal(size=(es.num_padded, D)).astype(np.float32)
    # Zero dead slots: the fallback path routes them to the dead segment
    # anyway, but keep inputs identical for exactness.
    msgs[perm < 0] = 0

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    got_sum = aggregate_sum(es, jnp.asarray(msgs))
    got_mean = aggregate_mean(es, jnp.asarray(msgs))
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "off")
    ref_sum = aggregate_sum(es, jnp.asarray(msgs))
    ref_mean = aggregate_mean(es, jnp.asarray(msgs))
    np.testing.assert_allclose(
        np.asarray(got_sum), np.asarray(ref_sum), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_mean), np.asarray(ref_mean), atol=1e-5
    )


@pytest.mark.parametrize("sender_path", ["banded", "permute"])
def test_custom_vjp_gathers_match_xla_ad(monkeypatch, sender_path):
    """Full interaction-net gradients must agree between the Pallas
    custom-VJP gather path and plain XLA autodiff, for both sender-side
    machineries (banded windows and sender-sorted layout + permute)."""
    from neural_lam_tpu.ops import (
        apply_interaction_net,
        init_interaction_net,
    )

    monkeypatch.setenv(
        "NEURAL_LAM_TPU_BANDED",
        "auto" if sender_path == "banded" else "off",
    )
    rng = np.random.default_rng(11)
    E, Ns, Nr, D = 220, 35, 50, 8
    senders = rng.integers(0, Ns, E)
    receivers = rng.integers(0, Nr, E)
    es, perm = make_edge_set(senders, receivers, num_rec=Nr, num_send=Ns)
    if sender_path == "banded":
        assert es.banded is not None
    else:
        assert es.send_layout is not None
    edge_rep = place_edge_features(
        rng.normal(size=(E, D)).astype(np.float32), perm, es
    )
    send_rep = rng.normal(size=(Ns, D)).astype(np.float32)
    rec_rep = rng.normal(size=(Nr, D)).astype(np.float32)
    params = init_interaction_net(jax.random.PRNGKey(0), D)

    # Loss must only consume valid edge rows: dead padding slots are
    # invisible to the model (never aggregated), and the Pallas VJP
    # correctly assigns them zero gradient where plain XLA AD would
    # propagate artificial gradients from a loss that reads them.
    valid = np.nonzero(perm >= 0)[0]

    def loss(p, s, r, e):
        new_rec, new_edge = apply_interaction_net(p, es, s, r, e)
        return jnp.sum(new_rec**2) + jnp.sum(jnp.sin(new_edge[valid]))

    args = (params, jnp.asarray(send_rep), jnp.asarray(rec_rep),
            jnp.asarray(edge_rep))
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    got = jax.grad(loss, argnums=(1, 2))(*args)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "off")
    want = jax.grad(loss, argnums=(1, 2))(*args)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("batched", [False, True])
def test_banded_sender_gather_matches_permute_path(monkeypatch, batched):
    """The banded sender gather/scatter (per-(chunk, window) one-hot
    kernels straight off receiver-sorted slots) must match the
    sender-sorted-layout + slot-permutation path: forward per-edge rows
    (dead slots aside, which neither path lets reach the loss) and the
    scatter-add gradient."""
    import os

    from neural_lam_tpu.ops.interaction import make_edge_set
    from neural_lam_tpu.ops.segment import gather_senders

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    rng = np.random.default_rng(17)
    n_send, n_rec, n_edges = 41, 29, 300
    senders = rng.integers(0, n_send, n_edges)
    receivers = rng.integers(0, n_rec, n_edges)
    receivers[0] = n_rec - 1
    shape = (n_send, 3, 8) if batched else (n_send, 8)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def build(banded_on):
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_BANDED", "auto" if banded_on else "off"
        )
        es, _ = make_edge_set(
            senders, receivers, num_rec=n_rec, num_send=n_send
        )
        return es

    es_banded = build(True)
    es_perm = build(False)
    # random senders on a tiny set may fail the bandedness guard; make
    # the test meaningful by requiring it built here (small id space)
    assert es_banded.banded is not None
    assert es_perm.banded is None and es_perm.send_layout is not None

    got = gather_senders(es_banded, x)
    ref = gather_senders(es_perm, x)
    live = np.asarray(es_banded.receivers) != n_rec
    np.testing.assert_allclose(
        np.asarray(got)[live], np.asarray(ref)[live], rtol=1e-6
    )

    def loss(es, x):
        out = gather_senders(es, x)
        live_m = jnp.asarray(live, out.dtype).reshape(
            (-1,) + (1,) * (out.ndim - 1)
        )
        return jnp.sum((out * live_m) ** 2)

    g_banded = jax.grad(loss, argnums=1)(es_banded, x)
    g_perm = jax.grad(loss, argnums=1)(es_perm, x)
    np.testing.assert_allclose(
        np.asarray(g_banded), np.asarray(g_perm), rtol=1e-5, atol=1e-6
    )


def test_banded_layout_rejects_nonlocal_senders():
    """A sender structure where every chunk touches most windows must
    fall back (build returns None) instead of building huge tables."""
    from neural_lam_tpu.ops.pallas_segment import build_banded_layout

    rng = np.random.default_rng(3)
    num_send = 256 * 64  # 64 windows at win_rows=256
    slots = rng.integers(0, num_send, 512 * 40).astype(np.int64)
    assert (
        build_banded_layout(slots, num_send, chunk_edges=512) is None
    )


def test_dynamic_layout_arrays_match_static():
    """Kernels accept per-call (traced) chunk_block/local_ids with the
    same static shape: results must equal the layout's own constants —
    the contract the spatially sharded executor builds on (one traced
    body, per-shard index arrays as data)."""
    import jax

    from neural_lam_tpu.ops.pallas_segment import (
        blocked_expand_nondiff,
        blocked_segment_sum_nondiff,
        build_blocked_layout,
        pad_blocked_layout,
    )

    rng = np.random.default_rng(5)
    num_rec = 40
    layouts = []
    for seed in (0, 1):
        r = np.sort(
            np.random.default_rng(seed).integers(0, num_rec, 90 + seed * 40)
        )
        layouts.append(
            build_blocked_layout(r, num_rec, block_rows=16, chunk_edges=32)
        )
    n_chunks = max(int(l.chunk_block.shape[0]) for l in layouts)
    layouts = [pad_blocked_layout(l, n_chunks) for l in layouts]
    rep = layouts[0]  # representative: static shapes only

    for lay in layouts:
        msgs = jnp.asarray(
            rng.normal(size=(lay.num_blocked, 8)), jnp.float32
        )
        nodes = jnp.asarray(rng.normal(size=(num_rec, 8)), jnp.float32)
        want_sum = blocked_segment_sum_nondiff(msgs, lay, interpret=True)
        want_exp = blocked_expand_nondiff(nodes, lay, interpret=True)

        # same results through the representative layout + dynamic
        # arrays, traced under jit (arrays arrive as tracers)
        got_sum, got_exp = jax.jit(
            lambda m, x, cb, ids: (
                blocked_segment_sum_nondiff(
                    m, rep, interpret=True, dyn=(cb, ids)
                ),
                blocked_expand_nondiff(
                    x, rep, interpret=True, dyn=(cb, ids)
                ),
            )
        )(msgs, nodes, lay.chunk_block, lay.local_ids)
        np.testing.assert_allclose(got_sum, want_sum, rtol=1e-6)
        np.testing.assert_allclose(got_exp, want_exp, rtol=1e-6)


def test_pad_blocked_layout_appends_dead_chunks():
    """Padded chunks are all-dead, target the final block, and keep
    chunk_block non-decreasing; sums are unchanged."""
    from neural_lam_tpu.ops.pallas_segment import (
        blocked_segment_sum_nondiff,
        build_blocked_layout,
        pad_blocked_layout,
    )

    r = np.sort(np.random.default_rng(2).integers(0, 30, 70))
    lay = build_blocked_layout(r, 30, block_rows=16, chunk_edges=32)
    padded = pad_blocked_layout(lay, int(lay.chunk_block.shape[0]) + 3)
    cb = np.asarray(padded.chunk_block)
    assert (np.diff(cb) >= 0).all()
    assert (cb[-3:] == padded.num_blocks - 1).all()
    extra = np.asarray(padded.local_ids)[0, lay.num_blocked:]
    assert (extra == -1).all()

    msgs = np.random.default_rng(3).normal(
        size=(lay.num_blocked, 8)
    ).astype(np.float32)
    msgs_p = np.zeros((padded.num_blocked, 8), np.float32)
    msgs_p[: lay.num_blocked] = msgs
    np.testing.assert_allclose(
        blocked_segment_sum_nondiff(
            jnp.asarray(msgs_p), padded, interpret=True
        ),
        blocked_segment_sum_nondiff(
            jnp.asarray(msgs), lay, interpret=True
        ),
        rtol=1e-6,
    )


def test_pad_banded_layout_matches_unpadded():
    """Padding both visit directions with dead visits changes nothing:
    padded gather/scatter outputs equal the unpadded layout's, the pad
    entries repeat each direction's last group (no fresh zero-init) and
    carry all-dead ids."""
    from neural_lam_tpu.ops.pallas_segment import (
        banded_expand_nondiff,
        banded_scatter_nondiff,
        build_banded_layout,
        build_blocked_layout,
        pad_banded_layout,
    )

    rng = np.random.default_rng(11)
    n_send, n_rec, n_edges = 41, 29, 300
    senders = rng.integers(0, n_send, n_edges)
    receivers = np.sort(rng.integers(0, n_rec, n_edges))
    lay = build_blocked_layout(receivers, n_rec, block_rows=16,
                               chunk_edges=32)
    dead = lay.perm < 0
    slot_send = np.where(dead, -1, senders[np.where(dead, 0, lay.perm)])
    banded = build_banded_layout(slot_send, n_send, chunk_edges=32,
                                 win_rows=16)
    assert banded is not None
    padded = pad_banded_layout(
        banded,
        int(banded.gvisit_chunk.shape[0]) + 3,
        int(banded.svisit_chunk.shape[0]) + 2,
    )
    assert (
        np.asarray(padded.svisit_window)[-2:]
        == np.asarray(banded.svisit_window)[-1]
    ).all()
    assert (np.asarray(padded.svisit_ids)[0, -2 * 32:] == -1).all()

    x = jnp.asarray(rng.normal(size=(n_send, 8)), jnp.float32)
    msgs = jnp.asarray(
        rng.normal(size=(banded.n_chunks * 32, 8)), jnp.float32
    )
    np.testing.assert_allclose(
        banded_expand_nondiff(x, padded, interpret=True),
        banded_expand_nondiff(x, banded, interpret=True),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        banded_scatter_nondiff(msgs, padded, interpret=True),
        banded_scatter_nondiff(msgs, banded, interpret=True),
        rtol=1e-6,
    )


def test_dynamic_banded_tables_match_static():
    """Banded kernels accept per-call (traced) visit tables with the
    same static shapes — the contract the spatially sharded executor's
    banded sender gather builds on (one traced body, per-shard tables
    as data)."""
    from neural_lam_tpu.ops.pallas_segment import (
        banded_expand_nondiff,
        banded_scatter_nondiff,
        build_banded_layout,
        build_blocked_layout,
        pad_banded_layout,
    )

    rng = np.random.default_rng(13)
    n_send, n_rec = 41, 29
    bandeds = []
    sends = []
    for seed, n_edges in ((0, 260), (1, 300)):
        r = np.random.default_rng(seed)
        senders = r.integers(0, n_send, n_edges)
        receivers = np.sort(r.integers(0, n_rec, n_edges))
        lay = build_blocked_layout(receivers, n_rec, block_rows=16,
                                   chunk_edges=32)
        dead = lay.perm < 0
        slot_send = np.where(dead, -1, senders[np.where(dead, 0, lay.perm)])
        b = build_banded_layout(slot_send, n_send, chunk_edges=32,
                                win_rows=16)
        assert b is not None
        bandeds.append(b)
        sends.append(slot_send)
    # pad shards to common visit AND chunk counts (like the executor)
    n_chunks = max(b.n_chunks for b in bandeds)
    n_gv = max(int(b.gvisit_chunk.shape[0]) for b in bandeds) + 1
    n_sv = max(int(b.svisit_chunk.shape[0]) for b in bandeds) + 1
    grown = []
    for b, slot_send in zip(bandeds, sends):
        if b.n_chunks < n_chunks:
            slot_send = np.concatenate(
                [slot_send, np.full((n_chunks - b.n_chunks) * 32, -1)]
            )
            b = build_banded_layout(slot_send, n_send, chunk_edges=32,
                                    win_rows=16)
        grown.append(pad_banded_layout(b, n_gv, n_sv))
    rep = grown[0]  # representative: static shapes only

    for lay in grown:
        x = jnp.asarray(rng.normal(size=(n_send, 8)), jnp.float32)
        msgs = jnp.asarray(
            rng.normal(size=(n_chunks * 32, 8)), jnp.float32
        )
        want_exp = banded_expand_nondiff(x, lay, interpret=True)
        want_sct = banded_scatter_nondiff(msgs, lay, interpret=True)
        got_exp, got_sct = jax.jit(
            lambda x, m, gc, gw, gi, sw, sc, si: (
                banded_expand_nondiff(
                    x, rep, interpret=True, dyn=(gc, gw, gi)
                ),
                banded_scatter_nondiff(
                    m, rep, interpret=True, dyn=(sw, sc, si)
                ),
            )
        )(
            x, msgs,
            lay.gvisit_chunk, lay.gvisit_window, lay.gvisit_ids,
            lay.svisit_window, lay.svisit_chunk, lay.svisit_ids,
        )
        np.testing.assert_allclose(got_exp, want_exp, rtol=1e-6)
        np.testing.assert_allclose(got_sct, want_sct, rtol=1e-6)
