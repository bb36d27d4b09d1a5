"""v2 fused kernel (merged banded-gather prologue) vs v1 and unfused.

The v2 kernel (ops/pallas_fused.py "v2" section) merges the banded
sender gather into the fused edge kernel as a visit-major prologue and
hoists the first-layer sender/receiver projections outside; it must
reproduce the v1 pipeline and the unfused oracle — values AND gradients
— for every wiring variant it claims (interaction, update_edges on/off,
in-kernel embedder on/off, batched/unbatched). Fixtures here use a
MULTI-window sender space with chunks straddling window boundaries so
the scratch accumulation across visits is actually exercised (a single
256-row window would make every chunk a single visit).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_lam_tpu.ops.interaction import (
    apply_interaction_net,
    init_interaction_net,
    make_edge_set,
    place_edge_features,
)
from neural_lam_tpu.ops.mlp import init_mlp

jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n_send, n_rec, n_edges = 600, 420, 2600
    receivers = np.sort(rng.integers(0, n_rec, n_edges))
    # banded, multi-window senders: ids track the receiver position
    # (like a regular mesh) with a +-60 jitter band
    senders = np.clip(
        (receivers * n_send / n_rec).astype(int)
        + rng.integers(-60, 60, n_edges),
        0,
        n_send - 1,
    )
    es, perm = make_edge_set(
        senders, receivers, num_rec=n_rec, num_send=n_send
    )
    assert es.banded is not None, "fixture must build banded tables"
    # the prologue's multi-visit path must actually trigger
    assert int(es.banded.gvisit_chunk.shape[0]) > int(
        es.banded.n_chunks
    ), "fixture must have chunks straddling >1 sender window"
    feats = rng.normal(size=(n_edges, 3)).astype(np.float32)
    feats_p = place_edge_features(feats, perm, es)
    valid = np.asarray(es.receivers) < n_rec
    return es, feats_p, valid, n_send, n_rec


def _arrays(es, n_send, n_rec, batched, d=64, b=2):
    shape = (lambda n: (n, b, d)) if batched else (lambda n: (n, d))
    send = jax.random.normal(jax.random.PRNGKey(1), shape(n_send))
    rec = jax.random.normal(jax.random.PRNGKey(2), shape(n_rec))
    edge = jax.random.normal(jax.random.PRNGKey(3), shape(es.num_padded))
    return send, rec, edge


def _run(monkeypatch, es, mode, v2, fn):
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", mode)
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", v2)
    es.fn_cache.clear()
    try:
        return fn()
    finally:
        es.fn_cache.clear()


@pytest.mark.parametrize("batched", [False, True])
@pytest.mark.parametrize("update_edges", [False, True])
@pytest.mark.parametrize("embed", [False, True])
def test_v2_matches_v1_and_unfused(
    monkeypatch, setup, embed, update_edges, batched
):
    es, feats_p, valid, n_send, n_rec = setup
    d = 64
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    embedder = init_mlp(jax.random.PRNGKey(4), [3, d, d])
    send, rec, edge = _arrays(es, n_send, n_rec, batched, d=d)
    vmask = jnp.asarray(valid)

    def f(p, s, r, e):
        kw = dict(update_edges=update_edges)
        if embed:
            out = apply_interaction_net(
                p[0], es, s, r, None,
                edge_embedder=p[1], edge_features=feats_p, **kw,
            )
        else:
            out = apply_interaction_net(p[0], es, s, r, e, **kw)
        if update_edges:
            new_rec, new_edge = out
            vm = vmask.reshape((-1,) + (1,) * (new_edge.ndim - 1))
            # dead padding slots hold arbitrary values on every path
            return jnp.sum(jnp.sin(new_rec)) + jnp.sum(
                jnp.sin(new_edge) * vm
            )
        return jnp.sum(jnp.sin(out))

    grad_f = jax.value_and_grad(f)
    args = ((params, embedder), send, rec, edge)
    run = lambda mode, v2: _run(  # noqa: E731
        monkeypatch, es, mode, v2, lambda: grad_f(*args)
    )
    l2, g2 = run("interpret", "on")
    l1, g1 = run("interpret", "off")
    lu, gu = run("off", "off")

    for (l, g), name in (((l2, g2), "v2"), ((l1, g1), "v1")):
        np.testing.assert_allclose(
            float(l), float(lu), rtol=2e-5, atol=2e-5, err_msg=name
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gu)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                rtol=4e-4, atol=4e-4, err_msg=name,
            )


def test_v2_routing_and_gates(monkeypatch, setup):
    """v2 is taken exactly when enabled + banded + cache_pre; the
    CACHE_PRE=off gate falls back to v1 (its backward needs the saved
    pre-activations)."""
    from neural_lam_tpu.ops.pallas_fused import fused_v2_enabled

    es, feats_p, valid, n_send, n_rec = setup
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "on")
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "on")
    assert fused_v2_enabled()
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "off")
    assert not fused_v2_enabled()
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "on")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "off")
    assert not fused_v2_enabled()

    # cache-key check: a v2 run populates a "fused_v2" closure, v1 does
    # not — the routing is observable, not incidental
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "on")
    d = 64
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True, d=d)
    es.fn_cache.clear()
    apply_interaction_net(params, es, send, rec, edge, update_edges=False)
    assert any(k[0] == "fused_v2" for k in es.fn_cache)
    es.fn_cache.clear()
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "off")
    apply_interaction_net(params, es, send, rec, edge, update_edges=False)
    assert not any(k[0] == "fused_v2" for k in es.fn_cache)
    assert any(k[0] == "fused" for k in es.fn_cache)
    es.fn_cache.clear()


def test_v2_propagation_falls_back(monkeypatch, setup):
    """PropagationNet keeps the v1 path (the sender residual needs raw
    per-edge sender rows) and still matches the unfused oracle."""
    es, feats_p, valid, n_send, n_rec = setup
    d = 64
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True, d=d)
    kw = dict(update_edges=False, propagation=True)

    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "on")
    es.fn_cache.clear()
    out = apply_interaction_net(params, es, send, rec, edge, **kw)
    # the assert must run BEFORE the cache clears: propagation must not
    # have routed through the v2 closure
    assert not any(k[0] == "fused_v2" for k in es.fn_cache)
    es.fn_cache.clear()
    ref = _run(
        monkeypatch, es, "off", "off",
        lambda: apply_interaction_net(params, es, send, rec, edge, **kw),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_v2_mixed_precision_bf16(monkeypatch, setup):
    """bf16 streams ride the v2 kernel (bf16 operands, f32 accumulation)
    within mixed-precision tolerance of the f32 unfused oracle."""
    es, feats_p, valid, n_send, n_rec = setup
    d = 64
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True, d=d)
    to_bf16 = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    # mixed precision casts params inside the step (trainer._loss)
    params_bf16 = jax.tree_util.tree_map(to_bf16, params)

    out = _run(
        monkeypatch, es, "interpret", "on",
        lambda: apply_interaction_net(
            params_bf16, es, to_bf16(send), to_bf16(rec), to_bf16(edge),
            update_edges=False,
        ),
    )
    assert out.dtype == jnp.bfloat16
    ref = _run(
        monkeypatch, es, "off", "off",
        lambda: apply_interaction_net(
            params, es, send, rec, edge, update_edges=False
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.06, atol=0.25
    )


@pytest.mark.parametrize("mode", ["high", "high-kernels"])
def test_v2_io_stream_dtype(monkeypatch, setup, mode):
    """v2 stream contract mirrors v1's: full ``high`` thins the edge /
    projected-sender / projected-receiver HBM streams to bf16, while
    ``high-kernels`` keeps them exact f32 (operands round in VMEM
    only)."""
    import neural_lam_tpu.ops.pallas_fused as pf

    es, feats_p, valid, n_send, n_rec = setup
    d = 64
    params = init_interaction_net(jax.random.PRNGKey(5), d)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True, d=d)

    seen = {}
    orig = pf._fused_v2_fwd_impl

    def spy(layout, banded, edge2d, sendp2d, recp2d, *a, **kw):
        seen["dtypes"] = (edge2d.dtype, sendp2d.dtype, recp2d.dtype)
        return orig(layout, banded, edge2d, sendp2d, recp2d, *a, **kw)

    monkeypatch.setattr(pf, "_fused_v2_fwd_impl", spy)
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "on")
    monkeypatch.setenv("NEURAL_LAM_TPU_MATMUL_PRECISION", mode)
    es.fn_cache.clear()
    out = apply_interaction_net(
        params, es, send, rec, edge, update_edges=False
    )
    es.fn_cache.clear()
    assert out.dtype == jnp.float32
    want = jnp.bfloat16 if mode == "high" else jnp.float32
    assert seen["dtypes"] == (want, want, want)


def test_v2_auto_ratio_routing(monkeypatch, setup):
    """Mode ``auto`` routes per edge set by the byte trade: v2 only
    when edge slots outweigh the hoisted sender+receiver rows by the
    configured ratio (measured basis in fused_v2_routed's docstring —
    v2-everywhere lost 13% at MEPS size because the grid-sized g2m
    sender set pays more in hoisted projections than it saves)."""
    from neural_lam_tpu.ops.pallas_fused import fused_v2_routed

    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "auto")
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", "on")
    # With the default ratio (8, above every measured losing point) NO
    # MEPS edge set routes v2 — the default single-chip step is the
    # measured-fastest v1-everywhere program
    assert not fused_v2_routed(255488, 6561 + 64000)  # m2g, ratio 3.6
    assert not fused_v2_routed(104960, 63784 + 6656)  # g2m, ratio 1.5
    assert not fused_v2_routed(65024, 6561 + 6656)  # m2m, ratio 4.9
    # an extreme-ratio set would route v2
    assert fused_v2_routed(10 * (6561 + 64000), 6561 + 64000)
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2_RATIO", "3")
    assert fused_v2_routed(255488, 6561 + 64000)
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "on")
    assert fused_v2_routed(104960, 63784 + 6656)
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "off")
    assert not fused_v2_routed(255488, 6561 + 64000)

    # end-to-end: with the threshold lowered under the toy fixture's
    # ratio (~2.6), auto routes v2; at the default it stays on v1
    es, feats_p, valid, n_send, n_rec = setup
    lay = es.layout
    hoisted = n_send + lay.num_blocks * lay.block_rows
    assert lay.num_blocked >= 2 * hoisted
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2", "auto")
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2_RATIO", "2")
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    d = 64
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    send, rec, edge = _arrays(es, n_send, n_rec, batched=True, d=d)
    es.fn_cache.clear()
    apply_interaction_net(params, es, send, rec, edge, update_edges=False)
    assert any(k[0] == "fused_v2" for k in es.fn_cache)
    es.fn_cache.clear()
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_V2_RATIO", "50")
    apply_interaction_net(params, es, send, rec, edge, update_edges=False)
    assert not any(k[0] == "fused_v2" for k in es.fn_cache)
    es.fn_cache.clear()
