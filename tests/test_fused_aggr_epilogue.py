"""Node-MLP epilogue (in-kernel aggr_mlp) vs the XLA node-MLP tail.

The fused kernel can apply the aggregation-side node MLP + receiver
residual per output block before the aggregate ever leaves VMEM
(reference semantics: aggr_mlp(cat(rec, aggr)) + rec residual,
neural_lam/gnn_layers.py:91,149-152). The epilogue must reproduce the
unfused path — values AND gradients including the aggr-MLP weight
grads — across multi-block receiver spaces (blocks whose last chunk
triggers the epilogue at different grid steps), batched/unbatched,
update_edges, bf16 streams, and with the cached-pre backward on and
off."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_lam_tpu.ops.interaction import (
    apply_interaction_net,
    init_interaction_net,
    make_edge_set,
)

jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    # multi-block receivers (420 rows -> 4 blocks of 128) with uneven
    # in-degree so block boundaries fall mid-chunk
    n_send, n_rec, n_edges = 300, 420, 2400
    senders = rng.integers(0, n_send, n_edges)
    receivers = np.sort(rng.integers(0, n_rec, n_edges))
    receivers[0], receivers[-1] = 0, n_rec - 1
    es, perm = make_edge_set(
        senders, receivers, num_rec=n_rec, num_send=n_send
    )
    assert es.layout.num_blocks > 1, "fixture must be multi-block"
    return es, n_send, n_rec


def _arrays(es, n_send, n_rec, batched, d=64, b=2):
    rng = np.random.default_rng(3)
    shape = (lambda n: (n, b, d)) if batched else (lambda n: (n, d))
    return (
        jnp.asarray(rng.normal(size=shape(n_send)), jnp.float32),
        jnp.asarray(rng.normal(size=shape(n_rec)), jnp.float32),
        jnp.asarray(rng.normal(size=shape(es.num_padded)), jnp.float32),
    )


def _grad_fn(params, es, send, rec, edge, update_edges):
    def f(p, s, r, e):
        out = apply_interaction_net(
            p, es, s, r, e, update_edges=update_edges
        )
        if update_edges:
            new_rec, new_edge = out
            vm = (np.asarray(es.receivers) < es.num_rec).astype(
                np.float32
            )
            vm = jnp.asarray(vm).reshape(
                (-1,) + (1,) * (new_edge.ndim - 1)
            )
            return jnp.sum(jnp.sin(new_rec)) + jnp.sum(
                jnp.sin(new_edge) * vm
            )
        return jnp.sum(jnp.sin(out))

    return jax.value_and_grad(f)


@pytest.mark.parametrize("cache_pre", ["on", "off"])
@pytest.mark.parametrize("update_edges", [False, True])
@pytest.mark.parametrize("batched", [False, True])
def test_epilogue_matches_unfused(
    monkeypatch, setup, batched, update_edges, cache_pre
):
    es, n_send, n_rec = setup
    params = init_interaction_net(jax.random.PRNGKey(0), 64)
    send, rec, edge = _arrays(es, n_send, n_rec, batched)
    grad_f = _grad_fn(params, es, send, rec, edge, update_edges)

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", cache_pre)
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_AGGR", "on")
    es.fn_cache.clear()
    l_ep, g_ep = grad_f(params, send, rec, edge)
    es.fn_cache.clear()
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "off")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_AGGR", "off")
    l_u, g_u = grad_f(params, send, rec, edge)
    es.fn_cache.clear()

    np.testing.assert_allclose(float(l_ep), float(l_u), rtol=2e-5,
                               atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ep), jax.tree_util.tree_leaves(g_u)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_epilogue_engages_and_gates(monkeypatch, setup):
    """The epilogue actually runs (observable via the impl spy), stays
    off for mean aggregation / chunked aggr MLPs / FUSED_AGGR=off, and
    the kernel output in epilogue mode is the UPDATED receiver rep."""
    import neural_lam_tpu.ops.pallas_fused as pf

    es, n_send, n_rec = setup
    params = init_interaction_net(jax.random.PRNGKey(0), 64)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True)

    seen = {}
    orig = pf._fused_fwd_impl

    def spy(*a, **kw):
        seen["node"] = kw.get("node_weights") is not None
        return orig(*a, **kw)

    monkeypatch.setattr(pf, "_fused_fwd_impl", spy)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")

    es.fn_cache.clear()
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_AGGR", "on")
    apply_interaction_net(params, es, send, rec, edge,
                          update_edges=False)
    assert seen["node"] is True
    es.fn_cache.clear()
    apply_interaction_net(params, es, send, rec, edge,
                          update_edges=False, aggr="mean")
    assert seen["node"] is False
    es.fn_cache.clear()
    # default: OFF (measured neutral-to-negative on v5e at MEPS size —
    # see fused_aggr_enabled's docstring)
    monkeypatch.delenv("NEURAL_LAM_TPU_FUSED_AGGR")
    apply_interaction_net(params, es, send, rec, edge,
                          update_edges=False)
    assert seen["node"] is False
    es.fn_cache.clear()


def test_epilogue_bf16_streams(monkeypatch, setup):
    """bf16 mixed precision rides the epilogue (bf16 operands, f32
    accumulation) within mixed tolerance of the f32 unfused path."""
    es, n_send, n_rec = setup
    params = init_interaction_net(jax.random.PRNGKey(0), 64)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True)
    to16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16), t
    )

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_AGGR", "on")
    es.fn_cache.clear()
    out16 = apply_interaction_net(
        to16(params), es, to16(send), to16(rec), to16(edge),
        update_edges=False,
    )
    assert out16.dtype == jnp.bfloat16
    es.fn_cache.clear()
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "off")
    ref = apply_interaction_net(params, es, send, rec, edge,
                                update_edges=False)
    es.fn_cache.clear()
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref),
        rtol=0.06, atol=0.3,
    )
