"""Golden parity against the reference implementation executing live.

Unlike the float64-oracle suite (test_forward_parity.py, authored in
this repo), the expected values here are produced by the reference's
own torch code running from /root/reference via tests/reference_harness
— GNN layers, MLP factory, metrics, clamp numerics — with weights
transplanted into our parameter pytrees. A misread of the reference
semantics therefore fails here even if the oracle shares the bug.

Covers the behaviour matrix of the reference's largest test file
(reference: tests/test_gnn_layers.py:138-1055): interaction vs
propagation numeric divergence, update_edges returns, sum/mean
aggregation, SplitMLPs chunking, gradient flow through every input,
and edge-case graphs (disconnected receivers, self-loops, high degree).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_harness import (  # noqa: E402
    gnn_params_from_torch,
    load_reference_module,
    mlp_params_from_torch,
)

from neural_lam_tpu.metrics import get_metric  # noqa: E402
from neural_lam_tpu.ops.interaction import (  # noqa: E402
    apply_interaction_net,
    make_edge_set,
    place_edge_features,
)
from neural_lam_tpu.ops.mlp import apply_mlp  # noqa: E402
from neural_lam_tpu.utils.numerics import (  # noqa: E402
    inverse_sigmoid,
    inverse_softplus,
)

GL = load_reference_module("gnn_layers")
REF_METRICS = load_reference_module("metrics")
REF_UTILS = load_reference_module("utils")


def _edge_cases():
    """Graph topologies from the reference GNN edge-case tests
    (reference: tests/test_gnn_layers.py:596-748)."""
    rng = np.random.default_rng(0)
    dense_s = rng.integers(0, 7, 64)
    dense_r = rng.integers(0, 5, 64)
    return {
        "random": (dense_s, dense_r, 7, 5),
        "disconnected_receivers": (
            np.array([0, 1, 2]), np.array([0, 0, 4]), 3, 5
        ),
        "self_loop_style": (
            np.array([0, 1, 2, 0]), np.array([0, 1, 2, 2]), 3, 3
        ),
        "high_degree": (
            np.zeros(32, dtype=np.int64),
            np.zeros(32, dtype=np.int64),
            1,
            1,
        ),
        "asymmetric": (
            np.array([0, 0, 0, 1]), np.array([0, 1, 2, 0]), 2, 3
        ),
    }


def _run_pair(
    gnn_cls,
    senders,
    receivers,
    n_send,
    n_rec,
    d=8,
    update_edges=True,
    aggr="sum",
    seed=0,
    **kwargs,
):
    """Build the reference layer, transplant weights, run both."""
    torch.manual_seed(seed)
    ei = torch.tensor(
        np.stack([senders, receivers]).astype(np.int64)
    )
    ref_net = gnn_cls(
        ei, d, update_edges=update_edges, aggr=aggr, **kwargs
    ).float()

    rng = np.random.default_rng(seed + 1)
    send = rng.normal(size=(n_send, d)).astype(np.float32)
    rec = rng.normal(size=(n_rec, d)).astype(np.float32)
    edge = rng.normal(size=(len(senders), d)).astype(np.float32)

    ref_out = ref_net(
        torch.tensor(send), torch.tensor(rec), torch.tensor(edge)
    )

    es, perm = make_edge_set(
        senders, receivers, num_rec=n_rec, num_send=n_send
    )
    params = gnn_params_from_torch(ref_net)
    edge_p = place_edge_features(edge, perm, es)
    ours = apply_interaction_net(
        params,
        es,
        jnp.asarray(send),
        jnp.asarray(rec),
        jnp.asarray(edge_p),
        aggr=aggr,
        update_edges=update_edges,
        propagation=(gnn_cls is GL.PropagationNet),
    )
    return ref_out, ours, perm


@pytest.mark.parametrize("pallas_mode", ["off", "interpret"])
@pytest.mark.parametrize("case", sorted(_edge_cases()))
@pytest.mark.parametrize(
    "gnn_name,aggr",
    [
        ("InteractionNet", "sum"),
        ("InteractionNet", "mean"),
        ("PropagationNet", "sum"),  # forced to mean internally
    ],
)
def test_gnn_forward_matches_reference(
    monkeypatch, pallas_mode, case, gnn_name, aggr
):
    # "interpret" exercises the fused Pallas kernel directly against
    # the reference; "off" exercises the XLA fallback.
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", pallas_mode)
    senders, receivers, n_send, n_rec = _edge_cases()[case]
    ref_out, ours, perm = _run_pair(
        GL.GNN_TYPES[gnn_name], senders, receivers, n_send, n_rec,
        aggr=aggr,
    )
    ref_rec, ref_edge = (t.detach().numpy() for t in ref_out)
    np.testing.assert_allclose(
        np.asarray(ours[0]), ref_rec, rtol=1e-5, atol=1e-5
    )
    ours_edge = np.asarray(ours[1])
    valid = perm >= 0
    np.testing.assert_allclose(
        ours_edge[valid], ref_edge[perm[valid]], rtol=1e-5, atol=1e-5
    )


def test_interaction_vs_propagation_diverge():
    """The two GNN flavours must differ numerically on the same weights
    (reference: tests/test_gnn_layers.py:138-328)."""
    senders, receivers, n_send, n_rec = _edge_cases()["random"]
    _, ours_i, _ = _run_pair(
        GL.InteractionNet, senders, receivers, n_send, n_rec, seed=5
    )
    _, ours_p, _ = _run_pair(
        GL.PropagationNet, senders, receivers, n_send, n_rec, seed=5
    )
    assert not np.allclose(np.asarray(ours_i[0]), np.asarray(ours_p[0]))


def test_update_edges_false_returns_single_tensor():
    """update_edges=False returns only node reps on both sides
    (reference: tests/test_gnn_layers.py:330-393)."""
    senders, receivers, n_send, n_rec = _edge_cases()["random"]
    ref_out, ours, _ = _run_pair(
        GL.InteractionNet, senders, receivers, n_send, n_rec,
        update_edges=False,
    )
    assert isinstance(ref_out, torch.Tensor)
    assert isinstance(ours, jnp.ndarray)
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.detach().numpy(), rtol=1e-5, atol=1e-5
    )


def test_split_mlps_chunking_matches_reference():
    """Per-chunk MLPs via edge/aggr_chunk_sizes (HiLAMParallel wiring;
    reference: tests/test_gnn_layers.py:450-511)."""
    rng = np.random.default_rng(2)
    d = 8
    # receivers laid out in two contiguous chunks, edges in three
    senders = rng.integers(0, 6, 48)
    receivers = np.sort(rng.integers(0, 10, 48))
    edge_chunks = [20, 16, 12]
    aggr_chunks = [4, 6]
    torch.manual_seed(3)
    ei = torch.tensor(np.stack([senders, receivers]).astype(np.int64))
    ref_net = GL.InteractionNet(
        ei, d, update_edges=True,
        edge_chunk_sizes=edge_chunks, aggr_chunk_sizes=aggr_chunks,
    ).float()
    send = rng.normal(size=(6, d)).astype(np.float32)
    rec = rng.normal(size=(10, d)).astype(np.float32)
    edge = rng.normal(size=(48, d)).astype(np.float32)
    ref_rec, ref_edge = ref_net(
        torch.tensor(send), torch.tensor(rec), torch.tensor(edge)
    )

    # Our chunked path needs the un-blocked layout (sort=False keeps
    # original edge order so chunk boundaries line up), padding chunk
    # sizes adjusted to the padded edge count.
    es, perm = make_edge_set(
        senders, receivers, num_rec=10, sort=False
    )
    params = gnn_params_from_torch(ref_net)
    edge_p = place_edge_features(edge, perm, es)
    pad_edge_chunks = list(edge_chunks)
    pad_edge_chunks[-1] += es.num_padded - len(senders)
    ours_rec, ours_edge = apply_interaction_net(
        params, es,
        jnp.asarray(send), jnp.asarray(rec), jnp.asarray(edge_p),
        update_edges=True,
        edge_chunk_sizes=pad_edge_chunks,
        aggr_chunk_sizes=aggr_chunks,
    )
    np.testing.assert_allclose(
        np.asarray(ours_rec), ref_rec.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours_edge)[: len(senders)],
        ref_edge.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )


def test_gradients_match_reference():
    """Gradient flow through every input matches torch autograd
    (reference: tests/test_gnn_layers.py:513-594)."""
    senders, receivers, n_send, n_rec = _edge_cases()["random"]
    d = 8
    torch.manual_seed(7)
    ei = torch.tensor(np.stack([senders, receivers]).astype(np.int64))
    ref_net = GL.InteractionNet(ei, d).float()
    rng = np.random.default_rng(8)
    send = rng.normal(size=(n_send, d)).astype(np.float32)
    rec = rng.normal(size=(n_rec, d)).astype(np.float32)
    edge = rng.normal(size=(len(senders), d)).astype(np.float32)

    t_send = torch.tensor(send, requires_grad=True)
    t_rec = torch.tensor(rec, requires_grad=True)
    t_edge = torch.tensor(edge, requires_grad=True)
    r_rec, r_edge = ref_net(t_send, t_rec, t_edge)
    (r_rec.square().sum() + r_edge.square().sum()).backward()

    es, perm = make_edge_set(
        senders, receivers, num_rec=n_rec, num_send=n_send
    )
    params = gnn_params_from_torch(ref_net)
    valid = jnp.asarray((perm >= 0).astype(np.float32))[:, None]

    def loss(send, rec, edge_orig):
        # differentiable padded-slot placement of original-order edges
        edge_p = jnp.where(
            valid > 0,
            edge_orig[jnp.maximum(jnp.asarray(perm), 0)],
            0.0,
        )
        o_rec, o_edge = apply_interaction_net(
            params, es, send, rec, edge_p, update_edges=True
        )
        return jnp.sum(o_rec**2) + jnp.sum((o_edge * valid) ** 2)

    g_send, g_rec, g_edge = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(send), jnp.asarray(rec), jnp.asarray(edge)
    )
    np.testing.assert_allclose(
        np.asarray(g_send), t_send.grad.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_rec), t_rec.grad.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_edge), t_edge.grad.numpy(), rtol=1e-4, atol=1e-5
    )


def test_make_mlp_matches_reference():
    """MLP factory parity incl. LayerNorm placement
    (reference: neural_lam/utils.py:538-570)."""
    rng = np.random.default_rng(4)
    for blueprint, ln in [([8, 16, 8], True), ([8, 16, 16, 4], False),
                          ([5, 7], True)]:
        torch.manual_seed(11)
        ref = REF_UTILS.make_mlp(blueprint, layer_norm=ln).float()
        x = rng.normal(size=(13, blueprint[0])).astype(np.float32)
        want = ref(torch.tensor(x)).detach().numpy()
        got = apply_mlp(mlp_params_from_torch(ref), jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize(
    "name", ["mse", "mae", "wmse", "wmae", "nll", "crps_gauss"]
)
@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize(
    "average_grid,sum_vars", [(True, True), (False, True), (True, False)]
)
def test_metrics_match_reference(name, masked, average_grid, sum_vars):
    """Metric registry parity on random tensors incl. mask/reduction
    flags (reference: neural_lam/metrics.py:38-397)."""
    rng = np.random.default_rng(6)
    b, t, n, d = 2, 3, 11, 4
    pred = rng.normal(size=(b, t, n, d)).astype(np.float32)
    target = rng.normal(size=(b, t, n, d)).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=(b, t, n, d)).astype(np.float32)
    mask = (
        (rng.uniform(size=n) > 0.3).astype(np.float32) if masked else None
    )

    ref_fn = REF_METRICS.get_metric(name)
    want = ref_fn(
        torch.tensor(pred),
        torch.tensor(target),
        torch.tensor(std),
        mask=None if mask is None else torch.tensor(mask, dtype=torch.bool),
        average_grid=average_grid,
        sum_vars=sum_vars,
    ).numpy()
    got = get_metric(name)(
        jnp.asarray(pred),
        jnp.asarray(target),
        jnp.asarray(std),
        mask=None if mask is None else jnp.asarray(mask, bool),
        average_grid=average_grid,
        sum_vars=sum_vars,
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-5, atol=2e-6
    )


def test_inverse_clamp_numerics_match_reference():
    """inverse_softplus / inverse_sigmoid bit-level agreement
    (reference: neural_lam/utils.py:800-874)."""
    xs = np.linspace(0.05, 30.0, 200, dtype=np.float32)
    want = REF_UTILS.inverse_softplus(torch.tensor(xs)).numpy()
    got = np.asarray(inverse_softplus(jnp.asarray(xs)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    ps = np.linspace(0.01, 0.99, 99, dtype=np.float32)
    want = REF_UTILS.inverse_sigmoid(torch.tensor(ps)).numpy()
    got = np.asarray(inverse_sigmoid(jnp.asarray(ps)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
