"""Behavioural tests for the GNN op layer.

These encode the semantics of the reference InteractionNet/PropagationNet
(reference: neural_lam/gnn_layers.py and tests/test_gnn_layers.py) against
independent numpy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.ops import (
    EdgeSet,
    apply_interaction_net,
    apply_mlp,
    init_interaction_net,
    init_mlp,
    make_edge_set,
    place_edge_features,
)


def _np_mlp(params, x):
    """Numpy oracle for apply_mlp."""
    layers = params["layers"]
    n = len(layers)
    x = np.asarray(x, dtype=np.float64)
    for i, layer in enumerate(layers):
        x = x @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        if i != n - 1:
            x = x / (1.0 + np.exp(-x)) * 1.0 if False else x * (1 / (1 + np.exp(-x)))  # silu
    if params["ln"] is not None:
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / np.sqrt(var + 1e-5)
        x = x * np.asarray(params["ln"]["scale"]) + np.asarray(
            params["ln"]["bias"]
        )
    return x


def test_mlp_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, [5, 8, 8])
    x = np.random.default_rng(1).normal(size=(7, 5)).astype(np.float32)
    got = np.asarray(apply_mlp(params, jnp.asarray(x)))
    want = _np_mlp(params, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mlp_no_layer_norm_and_depth():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, [4, 6, 6, 3], layer_norm=False)
    assert params["ln"] is None
    assert len(params["layers"]) == 3
    x = jnp.ones((2, 4))
    y = apply_mlp(params, x)
    assert y.shape == (2, 3)


def _random_graph(rng, num_snd, num_rec, num_edges, d):
    senders = rng.integers(0, num_snd, size=num_edges)
    receivers = rng.integers(0, num_rec, size=num_edges)
    receivers[0] = num_rec - 1  # pin num_rec = max+1 convention
    send_rep = rng.normal(size=(num_snd, d)).astype(np.float32)
    rec_rep = rng.normal(size=(num_rec, d)).astype(np.float32)
    edge_rep = rng.normal(size=(num_edges, d)).astype(np.float32)
    return senders, receivers, send_rep, rec_rep, edge_rep


def _oracle_interaction(
    params,
    senders,
    receivers,
    send_rep,
    rec_rep,
    edge_rep,
    aggr="sum",
    propagation=False,
):
    """Literal per-edge loop implementation of the documented semantics."""
    num_rec = rec_rep.shape[0]
    d = rec_rep.shape[1]
    msgs = np.zeros((len(senders), d))
    for e, (s, r) in enumerate(zip(senders, receivers)):
        inp = np.concatenate([edge_rep[e], send_rep[s], rec_rep[r]])
        m = _np_mlp(params["edge"][0], inp[None])[0]
        if propagation:
            m = send_rep[s] + m
        msgs[e] = m
    agg = np.zeros((num_rec, d))
    cnt = np.zeros(num_rec)
    for e, r in enumerate(receivers):
        agg[r] += msgs[e]
        cnt[r] += 1
    if aggr == "mean" or propagation:
        agg = agg / np.maximum(cnt, 1)[:, None]
    rec_diff = _np_mlp(
        params["aggr"][0], np.concatenate([rec_rep, agg], axis=-1)
    )
    base = agg if propagation else rec_rep
    return base + rec_diff, edge_rep + msgs


@pytest.mark.parametrize("aggr", ["sum", "mean"])
@pytest.mark.parametrize("propagation", [False, True])
def test_interaction_net_matches_oracle(rng, aggr, propagation):
    num_snd, num_rec, num_edges, d = 11, 7, 40, 8
    senders, receivers, send_rep, rec_rep, edge_rep = _random_graph(
        rng, num_snd, num_rec, num_edges, d
    )
    es, perm = make_edge_set(senders, receivers, pad_multiple=16)
    edge_rep_p = place_edge_features(edge_rep, perm, es)
    valid = perm >= 0

    params = init_interaction_net(jax.random.PRNGKey(3), d)
    new_rec, new_edge = apply_interaction_net(
        params,
        es,
        jnp.asarray(send_rep),
        jnp.asarray(rec_rep),
        jnp.asarray(edge_rep_p),
        aggr=aggr,
        propagation=propagation,
    )

    want_rec, want_edge = _oracle_interaction(
        params,
        senders,
        receivers,
        send_rep,
        rec_rep,
        edge_rep,
        aggr=aggr,
        propagation=propagation,
    )
    np.testing.assert_allclose(
        np.asarray(new_rec), want_rec, rtol=1e-4, atol=1e-4
    )
    # Only the valid (permuted) slots are meaningful.
    np.testing.assert_allclose(
        np.asarray(new_edge)[valid],
        want_edge[perm[valid]],
        rtol=1e-4,
        atol=1e-4,
    )


def test_interaction_net_update_edges_false(rng):
    senders, receivers, send_rep, rec_rep, edge_rep = _random_graph(
        rng, 5, 4, 12, 6
    )
    es, perm = make_edge_set(senders, receivers, pad_multiple=8)
    edge_rep_p = place_edge_features(edge_rep, perm, es)
    params = init_interaction_net(jax.random.PRNGKey(1), 6)
    out = apply_interaction_net(
        params,
        es,
        jnp.asarray(send_rep),
        jnp.asarray(rec_rep),
        jnp.asarray(edge_rep_p),
        update_edges=False,
    )
    assert isinstance(out, jnp.ndarray)
    assert out.shape == (4, 6)


def test_disconnected_receiver_gets_zero_aggregate(rng):
    # Receiver 2 has no incoming edges: its aggregate must be exactly zero,
    # so its update is aggr_mlp(concat(rec, 0)) + rec.
    senders = np.array([0, 1, 0, 3])
    receivers = np.array([0, 1, 1, 3])
    d = 4
    send_rep = rng.normal(size=(4, d)).astype(np.float32)
    rec_rep = rng.normal(size=(4, d)).astype(np.float32)
    edge_rep = rng.normal(size=(4, d)).astype(np.float32)
    es, perm = make_edge_set(senders, receivers, pad_multiple=8)
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    new_rec = apply_interaction_net(
        params,
        es,
        jnp.asarray(send_rep),
        jnp.asarray(rec_rep),
        jnp.asarray(place_edge_features(edge_rep, perm, es)),
        update_edges=False,
        aggr="mean",
    )
    want2 = rec_rep[2] + _np_mlp(
        params["aggr"][0],
        np.concatenate([rec_rep[2], np.zeros(d)])[None],
    )[0]
    np.testing.assert_allclose(np.asarray(new_rec)[2], want2, rtol=1e-4)


def test_chunked_mlps_match_separate_application(rng):
    """SplitMLPs equivalence (reference: neural_lam/gnn_layers.py:275-325)."""
    d = 4
    senders = np.arange(8) % 3
    receivers = np.array([0, 0, 1, 1, 2, 2, 2, 1])
    es, perm = make_edge_set(senders, receivers, pad_multiple=4, sort=False)
    assert es.num_padded == 8  # no padding => chunks stay aligned
    edge_rep = rng.normal(size=(8, d)).astype(np.float32)
    send_rep = rng.normal(size=(3, d)).astype(np.float32)
    rec_rep = rng.normal(size=(3, d)).astype(np.float32)

    params = init_interaction_net(
        jax.random.PRNGKey(5), d, num_edge_chunks=2, num_aggr_chunks=1
    )
    new_rec, new_edge = apply_interaction_net(
        params,
        es,
        jnp.asarray(send_rep),
        jnp.asarray(rec_rep),
        jnp.asarray(edge_rep),
        edge_chunk_sizes=[5, 3],
    )
    # Oracle: apply chunk MLPs separately on raw inputs
    x_send = send_rep[np.asarray(es.senders)]
    x_rec = rec_rep[np.asarray(es.recv_gather)]
    edge_in = np.concatenate([edge_rep, x_send, x_rec], axis=-1)
    m0 = _np_mlp(params["edge"][0], edge_in[:5])
    m1 = _np_mlp(params["edge"][1], edge_in[5:])
    msgs = np.concatenate([m0, m1])
    np.testing.assert_allclose(
        np.asarray(new_edge), edge_rep + msgs, rtol=1e-4, atol=1e-4
    )


def test_vmap_batching_independence(rng):
    """Batched application equals per-sample application."""
    senders, receivers, send_rep, rec_rep, edge_rep = _random_graph(
        rng, 6, 5, 20, 8
    )
    es, perm = make_edge_set(senders, receivers)
    edge_rep_p = place_edge_features(edge_rep, perm, es)
    params = init_interaction_net(jax.random.PRNGKey(7), 8)

    B = 3
    send_b = rng.normal(size=(B, 6, 8)).astype(np.float32)
    rec_b = rng.normal(size=(B, 5, 8)).astype(np.float32)
    edge_b = np.stack([edge_rep_p] * B)

    fn = lambda s, r, e: apply_interaction_net(
        params, es, s, r, e, update_edges=False
    )
    batched = jax.vmap(fn)(
        jnp.asarray(send_b), jnp.asarray(rec_b), jnp.asarray(edge_b)
    )
    for b in range(B):
        single = fn(
            jnp.asarray(send_b[b]),
            jnp.asarray(rec_b[b]),
            jnp.asarray(edge_b[b]),
        )
        np.testing.assert_allclose(
            np.asarray(batched)[b], np.asarray(single), rtol=1e-5, atol=1e-5
        )


def test_gradients_flow_through_all_inputs(rng):
    senders, receivers, send_rep, rec_rep, edge_rep = _random_graph(
        rng, 6, 5, 20, 8
    )
    es, perm = make_edge_set(senders, receivers)
    edge_rep_p = place_edge_features(edge_rep, perm, es)
    params = init_interaction_net(jax.random.PRNGKey(2), 8)

    def loss(p, s, r, e):
        out = apply_interaction_net(p, es, s, r, e, update_edges=False)
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params,
        jnp.asarray(send_rep),
        jnp.asarray(rec_rep),
        jnp.asarray(edge_rep_p),
    )
    gp, gs, gr, ge = grads
    assert float(jnp.abs(gs).max()) > 0
    assert float(jnp.abs(gr).max()) > 0
    assert float(jnp.abs(ge[perm >= 0]).max()) > 0
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_apply_matmul_precision(monkeypatch):
    """NEURAL_LAM_TPU_MATMUL_PRECISION=highest must reach the global
    jax matmul precision (it is what makes the mode REAL on TPU, where
    the hardware default rounds f32 matmul operands to bf16 — including
    inside the Pallas kernels; see ops.segment.apply_matmul_precision)."""
    import jax

    from neural_lam_tpu.ops.segment import apply_matmul_precision

    before = jax.config.jax_default_matmul_precision
    try:
        monkeypatch.setenv("NEURAL_LAM_TPU_MATMUL_PRECISION", "highest")
        apply_matmul_precision()
        assert jax.config.jax_default_matmul_precision == "highest"
        # any other value leaves the global config alone
        monkeypatch.setenv("NEURAL_LAM_TPU_MATMUL_PRECISION", "high")
        jax.config.update("jax_default_matmul_precision", before)
        apply_matmul_precision()
        assert jax.config.jax_default_matmul_precision == before
    finally:
        jax.config.update("jax_default_matmul_precision", before)


def test_small_set_xla_routing_matches_pallas(rng, monkeypatch):
    """NEURAL_LAM_TPU_SMALL_SET_EDGES routes tiny edge sets through the
    plain XLA gather/segment path; results must match the Pallas
    (interpret-mode) path. The knob exists for the hierarchical models,
    whose ~46 tiny per-level GNN steps per forward pay fixed kernel
    dispatch overhead (docs/performance.md round-5)."""
    from neural_lam_tpu.ops.segment import pallas_for, small_set_threshold

    n_send, n_rec, n_edges, d = 24, 20, 60, 8
    senders = rng.integers(0, n_send, size=n_edges)
    receivers = rng.integers(0, n_rec, size=n_edges)
    edge_set, perm = make_edge_set(senders, receivers, num_rec=n_rec)
    feats = rng.normal(size=(n_edges, d)).astype(np.float32)
    edge_rep = place_edge_features(feats, perm, edge_set)
    send_rep = rng.normal(size=(n_send, d)).astype(np.float32)
    rec_rep = rng.normal(size=(n_rec, d)).astype(np.float32)
    params = init_interaction_net(
        jax.random.PRNGKey(3), input_dim=d, hidden_layers=1
    )

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    assert small_set_threshold() == 0 and pallas_for(edge_set)
    out_pallas, edges_pallas = apply_interaction_net(
        params, edge_set, send_rep, rec_rep, edge_rep
    )

    monkeypatch.setenv("NEURAL_LAM_TPU_SMALL_SET_EDGES", str(n_edges + 1))
    assert not pallas_for(edge_set)
    fresh_set, fresh_perm = make_edge_set(senders, receivers, num_rec=n_rec)
    out_xla, edges_xla = apply_interaction_net(
        params,
        fresh_set,
        send_rep,
        rec_rep,
        place_edge_features(feats, fresh_perm, fresh_set),
    )
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pallas), rtol=2e-5, atol=2e-5
    )
    # edge outputs: padding-slot values are dead (receivers == num_rec
    # slots never aggregate); compare valid slots in original edge order
    np.testing.assert_allclose(
        np.asarray(edges_xla)[fresh_perm >= 0][np.argsort(
            fresh_perm[fresh_perm >= 0]
        )],
        np.asarray(edges_pallas)[perm >= 0][np.argsort(
            perm[perm >= 0]
        )],
        rtol=2e-5,
        atol=2e-5,
    )
