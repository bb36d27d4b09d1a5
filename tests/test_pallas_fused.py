"""Fused interaction kernel vs the separate-kernel path (interpret mode).

The fused Pallas kernel (ops/pallas_fused.py) must reproduce the
separate gather -> edge-MLP -> aggregate pipeline — values AND
gradients, for every wiring variant (interaction/propagation,
update_edges, sum/mean, batched/unbatched) — since the model routes
through whichever is enabled.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.ops.interaction import (
    apply_interaction_net,
    init_interaction_net,
    make_edge_set,
)

jax.config.update("jax_enable_x64", False)


def _random_edge_set(rng, n_send=37, n_rec=23, n_edges=180):
    senders = rng.integers(0, n_send, n_edges)
    receivers = rng.integers(0, n_rec, n_edges)
    # ensure num_rec is pinned even if some receivers are absent
    receivers[0] = n_rec - 1
    es, perm = make_edge_set(
        senders, receivers, num_rec=n_rec, num_send=n_send
    )
    return es, perm


def _apply(params, es, send, rec, edge, monkeypatch, fused, **kw):
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto" if fused else "off")
    return apply_interaction_net(params, es, send, rec, edge, **kw)


@pytest.mark.parametrize("update_edges", [False, True])
@pytest.mark.parametrize("propagation", [False, True])
@pytest.mark.parametrize("batched", [False, True])
def test_fused_matches_separate_path(
    monkeypatch, update_edges, propagation, batched
):
    rng = np.random.default_rng(3)
    d = 8
    es, perm = _random_edge_set(rng)
    params = init_interaction_net(jax.random.PRNGKey(0), d)

    shape = (lambda n: (n, 3, d)) if batched else (lambda n: (n, d))
    send = jnp.asarray(rng.normal(size=shape(37)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=shape(23)), jnp.float32)
    edge = jnp.asarray(
        rng.normal(size=shape(es.num_padded)), jnp.float32
    )

    kw = dict(update_edges=update_edges, propagation=propagation)
    ref = _apply(params, es, send, rec, edge, monkeypatch, False, **kw)
    out = _apply(params, es, send, rec, edge, monkeypatch, True, **kw)
    if update_edges:
        np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
        # padded (dead) edge slots may hold arbitrary values on either
        # path; compare valid slots only
        valid = np.asarray(perm) >= 0
        np.testing.assert_allclose(
            np.asarray(out[1])[valid],
            np.asarray(ref[1])[valid],
            rtol=2e-5,
            atol=2e-5,
        )
    else:
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("propagation", [False, True])
def test_fused_gradients_match(monkeypatch, propagation):
    rng = np.random.default_rng(7)
    d = 8
    es, _ = _random_edge_set(rng, n_send=19, n_rec=11, n_edges=70)
    params = init_interaction_net(jax.random.PRNGKey(1), d)

    send = jnp.asarray(rng.normal(size=(19, 2, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(11, 2, d)), jnp.float32)
    edge = jnp.asarray(rng.normal(size=(es.num_padded, 2, d)), jnp.float32)

    def loss(params, send, rec, edge, fused):
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_FUSED", "auto" if fused else "off"
        )
        new_rec, new_edge = apply_interaction_net(
            params, es, send, rec, edge,
            update_edges=True, propagation=propagation,
        )
        # involve both outputs; mask dead edge slots like a real model
        # does implicitly (their messages never reach any loss)
        valid = jnp.asarray(
            (np.asarray(es.receivers) < es.num_rec), jnp.float32
        )[:, None, None]
        return jnp.sum(new_rec**2) + jnp.sum((new_edge * valid) ** 2)

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, send, rec, edge, False
    )
    g_fused = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, send, rec, edge, True
    )
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_fused, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_fused, flat_ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_fused_mean_aggregation(monkeypatch):
    """PropagationNet forces mean; sum/mean also differ for plain
    InteractionNet with aggr='mean'."""
    rng = np.random.default_rng(11)
    d = 8
    es, _ = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=40)
    params = init_interaction_net(jax.random.PRNGKey(2), d)
    send = jnp.asarray(rng.normal(size=(13, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(9, d)), jnp.float32)
    edge = jnp.asarray(rng.normal(size=(es.num_padded, d)), jnp.float32)
    kw = dict(update_edges=False, aggr="mean")
    ref = _apply(params, es, send, rec, edge, monkeypatch, False, **kw)
    out = _apply(params, es, send, rec, edge, monkeypatch, True, **kw)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("update_edges", [False, True])
def test_fused_respects_mixed_batched_unbatched(monkeypatch, update_edges):
    """Static (unbatched) edge embeddings mixed with batched node reps:
    the fused kernel consumes them via column-tiled weights; the
    fallback broadcasts. Values must agree."""
    rng = np.random.default_rng(13)
    d = 8
    es, perm = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=40)
    params = init_interaction_net(jax.random.PRNGKey(3), d)
    send = jnp.asarray(rng.normal(size=(13, 4, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(9, 4, d)), jnp.float32)
    edge = jnp.asarray(rng.normal(size=(es.num_padded, d)), jnp.float32)
    kw = dict(update_edges=update_edges)
    ref = _apply(params, es, send, rec, edge, monkeypatch, False, **kw)
    out = _apply(params, es, send, rec, edge, monkeypatch, True, **kw)
    if update_edges:
        np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
        valid = np.asarray(perm) >= 0
        np.testing.assert_allclose(
            np.asarray(out[1])[valid], np.asarray(ref[1])[valid],
            rtol=2e-5, atol=2e-5,
        )
    else:
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_unbatched_edge_gradients(monkeypatch):
    """Gradients through a shared (unbatched) edge embedding match the
    broadcast fallback, including the group-summed edge grad."""
    rng = np.random.default_rng(17)
    d = 8
    es, _ = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=40)
    params = init_interaction_net(jax.random.PRNGKey(4), d)
    send = jnp.asarray(rng.normal(size=(13, 2, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(9, 2, d)), jnp.float32)
    edge = jnp.asarray(rng.normal(size=(es.num_padded, d)), jnp.float32)

    def loss(params, send, rec, edge, fused):
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_FUSED", "auto" if fused else "off"
        )
        new_rec, new_edge = apply_interaction_net(
            params, es, send, rec, edge, update_edges=True
        )
        valid = jnp.asarray(
            (np.asarray(es.receivers) < es.num_rec), jnp.float32
        )[:, None, None]
        return jnp.sum(new_rec**2) + jnp.sum((new_edge * valid) ** 2)

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, send, rec, edge, False
    )
    g_fused = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, send, rec, edge, True
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused),
        jax.tree_util.tree_leaves(g_ref),
    ):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("embed", [False, True])
def test_fused_bf16_kernel_compute(monkeypatch, embed):
    """bf16 inputs select bf16 matmul operands inside the kernel
    (f32 accumulation). Values/grads must track the f32 separate path
    within bf16 rounding; BF16_KERNELS=off reverts to boundary casts."""
    from neural_lam_tpu.ops.interaction import place_edge_features
    from neural_lam_tpu.ops.mlp import init_mlp

    rng = np.random.default_rng(29)
    d, f_dim = 8, 3
    es, perm = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=48)
    params = init_interaction_net(jax.random.PRNGKey(7), d)
    if embed:
        emb_params = init_mlp(jax.random.PRNGKey(8), [f_dim, d, d])
        feats_raw = rng.normal(size=(48, f_dim)).astype(np.float32)
        feats = jnp.asarray(place_edge_features(feats_raw, perm, es))
        edge = None
    else:
        emb_params, feats = None, None
        edge = jnp.asarray(rng.normal(size=(es.num_padded, d)), jnp.float32)

    send = jnp.asarray(rng.normal(size=(13, 2, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(9, 2, d)), jnp.float32)

    def run(params, send, rec, edge, fused, bf16_kernels):
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_FUSED", "auto" if fused else "off"
        )
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_FUSED_EMBED", "on" if (fused and embed) else "off"
        )
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_BF16_KERNELS", "auto" if bf16_kernels else "off"
        )
        return apply_interaction_net(
            params, es, send, rec, edge,
            update_edges=False,
            edge_embedder=emb_params,
            edge_features=feats,
        )

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    to_bf = lambda x: None if x is None else jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), x
    )

    ref = run(params, send, rec, edge, False, False)  # separate path, f32
    # real bf16 mode: trainer casts params AND batch to bf16 in-step
    got = run(
        to_bf(params), to_bf(send), to_bf(rec), to_bf(edge), True, True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.08, atol=0.08,
    )

    # off-switch: fused kernel back to f32 operands (boundary casts only)
    off = run(
        to_bf(params), to_bf(send), to_bf(rec), to_bf(edge), True, False
    )
    np.testing.assert_allclose(
        np.asarray(off, np.float32), np.asarray(ref, np.float32),
        rtol=0.08, atol=0.08,
    )

    def loss(params, send, rec, edge, fused, bf16_kernels):
        out = run(params, send, rec, edge, fused, bf16_kernels)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # Gradient check isolates the in-kernel operand precision: compare
    # bf16-operand vs f32-operand kernels at the SAME bf16 inputs (the
    # bf16 rounding of inputs/params dominates any comparison against
    # the full-f32 path and is not what this test is about). Tolerance
    # is leaf-scaled: bf16 matmul noise is relative to the leaf's
    # gradient magnitude, not elementwise.
    g_f32k = jax.grad(loss, argnums=(0, 1, 2))(
        to_bf(params), to_bf(send), to_bf(rec), to_bf(edge), True, False
    )
    g_bf = jax.grad(loss, argnums=(0, 1, 2))(
        to_bf(params), to_bf(send), to_bf(rec), to_bf(edge), True, True
    )
    # grads w.r.t. bf16 inputs come back bf16 (mixed-precision contract)
    assert jax.tree_util.tree_leaves(g_bf)[-1].dtype == jnp.bfloat16
    for a, b in zip(
        jax.tree_util.tree_leaves(g_bf), jax.tree_util.tree_leaves(g_f32k)
    ):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = float(np.abs(b).max()) + 1e-6
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05 * scale)


def test_matmul_precision_high(monkeypatch):
    """NEURAL_LAM_TPU_MATMUL_PRECISION=high (the TF32-equivalent of the
    reference's float32_matmul_precision("high") CUDA default,
    reference: neural_lam/train_model.py:423-427): f32 inputs keep f32
    outputs/accumulation while matmul operands and the edge-wide gather
    traffic round to bf16. Values/grads track the exact path within
    bf16-operand rounding."""
    rng = np.random.default_rng(33)
    d = 8
    es, perm = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=48)
    params = init_interaction_net(jax.random.PRNGKey(5), d)
    edge = jnp.asarray(rng.normal(size=(es.num_padded, 2, d)), jnp.float32)
    send = jnp.asarray(rng.normal(size=(13, 2, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(9, 2, d)), jnp.float32)

    def run(params, send, rec, edge, high):
        monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
        monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto")
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_MATMUL_PRECISION",
            "high" if high else "highest",
        )
        return apply_interaction_net(
            params, es, send, rec, edge, update_edges=False
        )

    exact = run(params, send, rec, edge, False)
    high = run(params, send, rec, edge, True)
    assert high.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(high), np.asarray(exact), rtol=0.05, atol=0.05
    )

    def loss(params, send, rec, edge, high_mode):
        return jnp.sum(run(params, send, rec, edge, high_mode) ** 2)

    g_exact = jax.grad(loss, argnums=(0, 1, 2))(
        params, send, rec, edge, False
    )
    g_high = jax.grad(loss, argnums=(0, 1, 2))(
        params, send, rec, edge, True
    )
    # grads of f32 inputs stay f32 under high
    for a, b in zip(
        jax.tree_util.tree_leaves(g_high), jax.tree_util.tree_leaves(g_exact)
    ):
        assert a.dtype == jnp.float32
        a = np.asarray(a)
        b = np.asarray(b)
        scale = float(np.abs(b).max()) + 1e-6
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05 * scale)


def test_fused_embed_no_tracer_leak_across_jits(monkeypatch):
    """The cached fused closure must not capture edge features from the
    first (traced) call: the second, separately-jitted call would then
    see a leaked tracer (regression: bf16 CLI eval after training
    raised UnexpectedTracerError because the train-step trace's cast
    edge features were baked into the EdgeSet's fn_cache closure)."""
    from neural_lam_tpu.ops.interaction import place_edge_features
    from neural_lam_tpu.ops.mlp import init_mlp

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_EMBED", "on")

    rng = np.random.default_rng(41)
    d, f_dim = 8, 3
    es, perm = _random_edge_set(rng, n_send=11, n_rec=7, n_edges=30)
    params = init_interaction_net(jax.random.PRNGKey(1), d)
    emb_params = init_mlp(jax.random.PRNGKey(2), [f_dim, d, d])
    feats = jnp.asarray(
        place_edge_features(
            rng.normal(size=(30, f_dim)).astype(np.float32), perm, es
        )
    )
    send = jnp.asarray(rng.normal(size=(11, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(7, d)), jnp.float32)

    def apply(params, emb_params, feats, send, rec):
        return apply_interaction_net(
            params, es, send, rec, None,
            update_edges=False,
            edge_embedder=emb_params,
            # in-step cast: feats is a tracer inside each trace
            edge_features=feats * 1.0,
        )

    out1 = jax.jit(apply)(params, emb_params, feats, send, rec)
    out2 = jax.jit(lambda *a: apply(*a) + 0.0)(
        params, emb_params, feats, send, rec
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=1e-6
    )


@pytest.mark.parametrize("update_edges", [False, True])
@pytest.mark.parametrize("batched", [False, True])
def test_fused_in_kernel_embedder(monkeypatch, update_edges, batched):
    """The in-kernel edge-embedder path (raw static features + embedder
    MLP fused into the kernel) matches embedding up-front, for values
    and for gradients through BOTH parameter trees."""
    from neural_lam_tpu.ops.interaction import place_edge_features
    from neural_lam_tpu.ops.mlp import init_mlp

    rng = np.random.default_rng(23)
    d, f_dim = 8, 3
    es, perm = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=48)
    params = init_interaction_net(jax.random.PRNGKey(5), d)
    emb_params = init_mlp(jax.random.PRNGKey(6), [f_dim, d, d])
    feats_raw = rng.normal(size=(48, f_dim)).astype(np.float32)
    feats = jnp.asarray(place_edge_features(feats_raw, perm, es))

    shape = (lambda n: (n, 2, d)) if batched else (lambda n: (n, d))
    send = jnp.asarray(rng.normal(size=shape(13)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=shape(9)), jnp.float32)

    def run(params, emb_params, send, rec, fused):
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_FUSED", "auto" if fused else "off"
        )
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_FUSED_EMBED", "on" if fused else "off"
        )
        out = apply_interaction_net(
            params, es, send, rec, None,
            update_edges=update_edges,
            edge_embedder=emb_params,
            edge_features=feats,
        )
        return out

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    ref = run(params, emb_params, send, rec, False)
    got = run(params, emb_params, send, rec, True)
    valid = np.asarray(perm) >= 0
    if update_edges:
        np.testing.assert_allclose(got[0], ref[0], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got[1])[valid], np.asarray(ref[1])[valid],
            rtol=2e-5, atol=2e-5,
        )
    else:
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def loss(params, emb_params, send, rec, fused):
        out = run(params, emb_params, send, rec, fused)
        if update_edges:
            mask = jnp.asarray(valid.astype(np.float32)).reshape(
                (-1,) + (1,) * (out[1].ndim - 1)
            )
            return jnp.sum(out[0] ** 2) + jnp.sum((out[1] * mask) ** 2)
        return jnp.sum(out**2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, emb_params, send, rec, False
    )
    g_got = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params, emb_params, send, rec, True
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_got),
        jax.tree_util.tree_leaves(g_ref),
    ):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("embed", [False, True])
def test_cached_pre_gradients_match(monkeypatch, embed):
    """NEURAL_LAM_TPU_CACHE_PRE saves the first-layer pre-activations
    as a VJP residual and the backward kernel skips their recompute —
    gradients must be identical to the recompute path."""
    from neural_lam_tpu.ops.mlp import init_mlp

    rng = np.random.default_rng(23)
    d = 8
    es, _ = _random_edge_set(rng, n_send=19, n_rec=11, n_edges=70)
    params = init_interaction_net(jax.random.PRNGKey(1), d)
    send = jnp.asarray(rng.normal(size=(19, 2, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(11, 2, d)), jnp.float32)
    if embed:
        feats = jnp.asarray(
            rng.normal(size=(es.num_padded, 3)), jnp.float32
        )
        emb = init_mlp(jax.random.PRNGKey(5), [3, d, d], layer_norm=True)
        kw = dict(edge_embedder=emb, edge_features=feats)
        edge = None
    else:
        kw = {}
        edge = jnp.asarray(
            rng.normal(size=(es.num_padded, 2, d)), jnp.float32
        )

    def loss(params, send, rec):
        new_rec, new_edge = apply_interaction_net(
            params, es, send, rec, edge, update_edges=True, **kw
        )
        valid = jnp.asarray(
            (np.asarray(es.receivers) < es.num_rec), jnp.float32
        )[:, None, None]
        return jnp.sum(new_rec**2) + jnp.sum((new_edge * valid) ** 2)

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto")
    # pin the v1 kernel: this test compares cache_pre on/off on the
    # SAME kernel at exact-equality tolerance (CACHE_PRE=off disables
    # v2 anyway, so letting "on" route to v2 would compare different
    # f32 summation orders; v2 equivalence lives in
    # test_pallas_fused_v2.py)
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "off")
    if embed:
        monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_EMBED", "on")

    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "off")
    es.fn_cache.clear()
    g_off = jax.grad(loss, argnums=(0, 1, 2))(params, send, rec)
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "on")
    es.fn_cache.clear()
    g_on = jax.grad(loss, argnums=(0, 1, 2))(params, send, rec)
    for a, b in zip(
        jax.tree_util.tree_flatten(g_on)[0],
        jax.tree_util.tree_flatten(g_off)[0],
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    # bf16 residual mode: the forward is bit-identical (the cast
    # happens on the residual WRITE only) and gradients agree at bf16
    # tolerance — the residual feeds the backward silu/LN recompute
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "bf16")
    es.fn_cache.clear()
    v_bf = loss(params, send, rec)
    g_bf = jax.grad(loss, argnums=(0, 1, 2))(params, send, rec)
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "on")
    es.fn_cache.clear()
    np.testing.assert_array_equal(
        np.asarray(v_bf), np.asarray(loss(params, send, rec))
    )
    for a, b in zip(
        jax.tree_util.tree_flatten(g_bf)[0],
        jax.tree_util.tree_flatten(g_on)[0],
    ):
        # per-tensor norm tolerance: individual elements can amplify
        # through the LayerNorm backward's rinv, but the gradient as a
        # whole must stay within bf16 rounding of the exact one
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(b) + 1e-12
        assert np.linalg.norm(a - b) / denom < 2e-2, (
            np.linalg.norm(a - b) / denom
        )


def test_stripe_groups_lane_alignment():
    """Partial stripes are mid-array lane blocks, which Mosaic only
    lowers at 128-lane multiples; odd group counts with no aligned
    divisor must fall back to one full-width stripe (regression: batch
    5 at hidden 64 previously picked an unlowerable 64-lane stripe)."""
    from neural_lam_tpu.ops.pallas_fused import _stripe_groups

    for feat in (8, 64, 128, 256):
        for groups in range(1, 18):
            g = _stripe_groups(groups, feat)
            assert groups % g == 0
            stripe = g * feat
            assert stripe == groups * feat or stripe % 128 == 0, (
                f"misaligned stripe {stripe} for groups={groups}, "
                f"feat={feat}"
            )
    assert _stripe_groups(4, 64) == 4  # 256 lanes, the tuned default
    assert _stripe_groups(6, 64) == 2  # 128-lane stripes
    assert _stripe_groups(5, 64) == 5  # no aligned divisor: full width
    assert _stripe_groups(16, 64) == 4


@pytest.mark.parametrize("mode", ["high", "high-kernels"])
def test_high_kernels_io_stream_dtype(monkeypatch, mode):
    """``high-kernels`` rounds matmul operands inside the kernel only —
    the HBM streams handed to the fused impl stay exact f32, while full
    ``high`` thins them to bf16 (the documented contract of
    segment.kernel_matmul_high)."""
    import neural_lam_tpu.ops.pallas_fused as pf

    rng = np.random.default_rng(7)
    d = 8
    es, _ = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=48)
    params = init_interaction_net(jax.random.PRNGKey(5), d)
    edge = jnp.asarray(rng.normal(size=(es.num_padded, 2, d)), jnp.float32)
    send = jnp.asarray(rng.normal(size=(13, 2, d)), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(9, 2, d)), jnp.float32)

    seen = {}
    orig = pf._fused_fwd_impl

    def spy(layout, edge2d, send2d, rec2d, *a, **kw):
        seen["dtypes"] = (edge2d.dtype, send2d.dtype, rec2d.dtype)
        return orig(layout, edge2d, send2d, rec2d, *a, **kw)

    monkeypatch.setattr(pf, "_fused_fwd_impl", spy)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto")
    # the spy hooks the v1 impl; the v2 stream contract is asserted in
    # test_pallas_fused_v2.py::test_v2_io_stream_dtype
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "off")
    monkeypatch.setenv("NEURAL_LAM_TPU_MATMUL_PRECISION", mode)
    es.fn_cache.clear()
    out = apply_interaction_net(
        params, es, send, rec, edge, update_edges=False
    )
    assert out.dtype == jnp.float32
    want = jnp.bfloat16 if mode == "high" else jnp.float32
    assert seen["dtypes"] == (want, want, want)


def test_stripe_cap_guard(monkeypatch):
    """Full-width stripe fallback is bounded: a batch with no
    128-aligned divisor stays fused while its full-width stripe fits
    the lane cap (B=5 at hidden 64 = 320 lanes) but falls back to the
    unfused path with a warning beyond it (B=9 = 576 lanes), producing
    identical values either way (VERDICT r2: no silent VMEM blow-up)."""
    import warnings as _warnings

    from neural_lam_tpu.ops.interaction import _use_fused
    from neural_lam_tpu.ops.pallas_fused import stripe_fits

    assert stripe_fits(5, 64)  # 320-lane full-width stripe: allowed
    assert stripe_fits(20, 64)  # aligned divisor exists (4 x 256)
    assert not stripe_fits(9, 64)  # 576 lanes: over the cap
    assert not stripe_fits(25, 64)

    import neural_lam_tpu.ops.interaction as interaction

    rng = np.random.default_rng(11)
    d = 64
    es, _ = _random_edge_set(rng, n_send=13, n_rec=9, n_edges=48)
    params = init_interaction_net(jax.random.PRNGKey(2), d)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto")
    interaction._stripe_warned.clear()  # warn-once dedup is per-process

    for b, fused_expected in ((5, True), (9, False)):
        send = jnp.asarray(rng.normal(size=(13, b, d)), jnp.float32)
        rec = jnp.asarray(rng.normal(size=(9, b, d)), jnp.float32)
        edge = jnp.asarray(
            rng.normal(size=(es.num_padded, b, d)), jnp.float32
        )
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            routed = _use_fused(params, es, send, rec, edge)
        assert routed == fused_expected
        assert any("unfused path" in str(w.message) for w in caught) == (
            not fused_expected
        )
        out = apply_interaction_net(
            params, es, send, rec, edge, update_edges=False
        )
        monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "off")
        ref = apply_interaction_net(
            params, es, send, rec, edge, update_edges=False
        )
        monkeypatch.setenv("NEURAL_LAM_TPU_FUSED", "auto")
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
