"""Degree-aligned blocked layouts (ops/pallas_segment.build_aligned_layout).

Uniform-degree edge sets (the reference's 4-NN m2g,
neural_lam/create_graph.py:779-792, and the hierarchical 1-NN down
edges) get a layout whose slot positions encode the receiver row, so
the fused kernel replaces both per-chunk one-hot matmuls with static
stacks/slice-sums (dead slots zeroed by the ``live_col`` mask). These
tests hold the aligned path to exact behavioural parity with the
one-hot layout — values and gradients — and pin the builder's
routing/validity invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.ops.interaction import (
    apply_interaction_net,
    init_interaction_net,
    make_edge_set,
    place_edge_features,
)
from neural_lam_tpu.ops.mlp import init_mlp
from neural_lam_tpu.ops.pallas_segment import (
    blocked_segment_sum_nondiff,
    build_aligned_layout,
)

jax.config.update("jax_enable_x64", False)

HIDDEN = 64


def _uniform_edges(num_rec, degree, num_send, seed=0):
    rng = np.random.default_rng(seed)
    receivers = np.repeat(np.arange(num_rec), degree)
    senders = rng.integers(0, num_send, len(receivers))
    return senders, receivers


def _ragged_edges(num_rec, lo, hi, num_send, seed=0):
    rng = np.random.default_rng(seed)
    degs = rng.integers(lo, hi + 1, num_rec)
    receivers = np.repeat(np.arange(num_rec), degs)
    senders = rng.integers(0, num_send, len(receivers))
    return senders, receivers


# ---------------------------------------------------------------------------
# builder invariants
# ---------------------------------------------------------------------------
def test_builder_uniform_degree_4():
    # 300 receivers = 1 full + 1 partial block; the partial block's
    # chunk rounding needs a ratio above the strict default
    _, receivers = _uniform_edges(300, 4, 100)
    lay = build_aligned_layout(np.sort(receivers), 300, max_slot_ratio=2.0)
    assert lay is not None
    assert lay.aligned_groups == 2 and lay.chunk_edges == 512
    # layout validity: slot -> (receiver, local id) consistency
    perm = lay.perm
    ids = np.asarray(lay.local_ids)[0]
    cb = np.asarray(lay.chunk_block)
    live_col = np.asarray(lay.live_col)[:, 0]
    rs = np.sort(receivers)
    for s in range(perm.shape[0]):
        c = s // lay.chunk_edges
        if perm[s] >= 0:
            assert ids[s] == rs[perm[s]] - cb[c] * lay.block_rows
            assert live_col[s] == 1.0
        else:
            assert ids[s] == -1 and live_col[s] == 0.0
    # every live edge exactly once
    live = perm[perm >= 0]
    assert len(live) == len(receivers) == len(np.unique(live))


def test_builder_degree_1_down_edges():
    lay = build_aligned_layout(np.arange(100), 100)
    assert lay is not None
    assert lay.aligned_groups == 1 and lay.chunk_edges == 256


def test_builder_rejects_ragged_at_default_ratio():
    # g2m-like: degrees 13..17 — padding to 18 exceeds the default
    # 1.05 slot ratio (measured slower at step level, see the builder
    # docstring), so the generic layout stays in charge
    _, receivers = _ragged_edges(300, 13, 17, 100)
    assert build_aligned_layout(np.sort(receivers), 300) is None


def test_builder_accepts_ragged_at_raised_ratio():
    _, receivers = _ragged_edges(300, 13, 17, 100)
    lay = build_aligned_layout(np.sort(receivers), 300, max_slot_ratio=2.0)
    assert lay is not None and lay.aligned_groups == 2
    live_col = np.asarray(lay.live_col)[:, 0]
    assert live_col.sum() == len(receivers)
    # generic one-hot consumer on the aligned layout: exact segment sum
    rng = np.random.default_rng(0)
    msgs = rng.normal(size=(lay.num_blocked, 128)).astype(np.float32)
    out = blocked_segment_sum_nondiff(
        jnp.asarray(msgs), lay, interpret=True
    )
    rs = np.sort(receivers)
    want = np.zeros((300, 128), np.float32)
    for s in range(lay.perm.shape[0]):
        if lay.perm[s] >= 0:
            want[rs[lay.perm[s]]] += msgs[s]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_builder_rejects_wildly_ragged():
    # multiscale-m2m-like: a few huge-degree receivers blow the ratio
    rng = np.random.default_rng(0)
    degs = np.full(300, 8)
    degs[:5] = 32
    receivers = np.repeat(np.arange(300), degs)
    assert build_aligned_layout(np.sort(receivers), 300) is None


# ---------------------------------------------------------------------------
# fused-kernel equivalence vs the one-hot layout
# ---------------------------------------------------------------------------
def _run(monkeypatch, aligned, senders, receivers, num_rec, num_send,
         batched=True, update_edges=False, propagation=False,
         cache_pre="on", ratio=None, embed=False):
    monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NEURAL_LAM_TPU_ALIGNED", "auto" if aligned else "off")
    monkeypatch.setenv("NEURAL_LAM_TPU_CACHE_PRE", cache_pre)
    if ratio is not None:
        monkeypatch.setenv("NEURAL_LAM_TPU_ALIGNED_RATIO", str(ratio))
    es, perm = make_edge_set(
        senders, receivers, num_rec=num_rec, num_send=num_send
    )
    if aligned:
        assert es.layout.aligned_groups > 0, "expected an aligned layout"
    else:
        assert es.layout.aligned_groups == 0
    rng = np.random.default_rng(42)
    params = init_interaction_net(jax.random.PRNGKey(0), HIDDEN)
    shape = (lambda n: (n, 4, HIDDEN)) if batched else (
        lambda n: (n, HIDDEN)
    )
    send_rep = jnp.asarray(
        rng.normal(size=shape(num_send)).astype(np.float32)
    )
    rec_rep = jnp.asarray(
        rng.normal(size=shape(num_rec)).astype(np.float32)
    )
    valid_idx = np.nonzero(perm >= 0)[0]
    kw = {}
    if embed:
        feats_orig = rng.normal(size=(len(receivers), 3)).astype(np.float32)
        emb = init_mlp(
            jax.random.PRNGKey(1), [3, HIDDEN, HIDDEN], dtype=jnp.float32
        )
        kw = dict(
            edge_embedder=emb,
            edge_features=jnp.asarray(
                place_edge_features(feats_orig, perm, es)
            ),
        )
        edge_orig = None
    else:
        edge_orig = jnp.asarray(
            rng.normal(size=(len(receivers), HIDDEN)).astype(np.float32)
        )

    def loss(p, s, r, eo):
        if embed:
            e = None
        else:
            e = jnp.zeros((es.num_padded, eo.shape[-1]), eo.dtype)
            e = e.at[valid_idx].set(eo[perm[perm >= 0]])
        out = apply_interaction_net(
            p, es, s, r, e,
            update_edges=update_edges, propagation=propagation, **kw,
        )
        if update_edges:
            nr, ne = out
            # compare the edge update on live slots only (dead-slot
            # values legitimately differ between layouts)
            return (nr ** 2).sum() + (ne[valid_idx] ** 2).sum()
        return (out ** 2).sum()

    argnums = (0, 1, 2) if embed else (0, 1, 2, 3)
    val, grads = jax.value_and_grad(loss, argnums=argnums)(
        params, send_rep, rec_rep, edge_orig
    )
    return np.asarray(val), jax.tree_util.tree_map(np.asarray, grads)


@pytest.mark.parametrize("update_edges", [False, True])
@pytest.mark.parametrize("cache_pre", ["on", "off"])
def test_uniform_aligned_matches_onehot(monkeypatch, update_edges,
                                        cache_pre):
    senders, receivers = _uniform_edges(512, 4, 520)
    args = (senders, receivers, 512, 520)
    v0, g0 = _run(monkeypatch, False, *args, update_edges=update_edges,
                  cache_pre=cache_pre)
    v1, g1 = _run(monkeypatch, True, *args, update_edges=update_edges,
                  cache_pre=cache_pre)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-3
        ),
        g0, g1,
    )


@pytest.mark.parametrize("batched", [False, True])
def test_uniform_aligned_propagation(monkeypatch, batched):
    senders, receivers = _uniform_edges(512, 4, 520)
    args = (senders, receivers, 512, 520)
    v0, g0 = _run(monkeypatch, False, *args, batched=batched,
                  propagation=True)
    v1, g1 = _run(monkeypatch, True, *args, batched=batched,
                  propagation=True)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-3
        ),
        g0, g1,
    )


def test_masked_aligned_matches_onehot(monkeypatch):
    """Padded (ragged-degree) alignment: dead slots inside live
    receiver rows must be invisible — the live_col mask zeroes their
    messages and gradients."""
    senders, receivers = _ragged_edges(300, 13, 17, 520)
    args = (senders, receivers, 512, 520)
    v0, g0 = _run(monkeypatch, False, *args)
    v1, g1 = _run(monkeypatch, True, *args, ratio=2.0)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-3
        ),
        g0, g1,
    )


def test_embed_fused_aligned_matches_onehot(monkeypatch):
    """The in-kernel edge embedder composes with the aligned layout."""
    monkeypatch.setenv("NEURAL_LAM_TPU_FUSED_EMBED", "on")
    senders, receivers = _uniform_edges(512, 4, 520)
    args = (senders, receivers, 512, 520)
    v0, g0 = _run(monkeypatch, False, *args, embed=True)
    v1, g1 = _run(monkeypatch, True, *args, embed=True)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-3
        ),
        g0, g1,
    )


def test_dyn_layout_guard(monkeypatch):
    """Per-shard dynamic tables cannot ride an aligned-kernel closure
    (positional math ignores the id tables)."""
    from neural_lam_tpu.ops.pallas_fused import make_fused_interaction

    monkeypatch.setenv("NEURAL_LAM_TPU_ALIGNED", "auto")
    senders, receivers = _uniform_edges(512, 4, 520)
    es, _ = make_edge_set(
        senders, receivers, num_rec=512, num_send=520
    )
    lay = es.layout
    assert lay.aligned_groups > 0
    fn = make_fused_interaction(
        lay, update_edges=False, propagation=False, interpret=True
    )
    params = init_interaction_net(jax.random.PRNGKey(0), HIDDEN)
    x = jnp.zeros((lay.num_blocked, HIDDEN))
    r = jnp.zeros((512, HIDDEN))
    with pytest.raises(ValueError, match="aligned layout"):
        fn(
            params["edge"][0], x, x, r,
            dyn_layout=(lay.chunk_block, lay.local_ids),
        )


def test_model_forward_invariant_to_alignment(monkeypatch, tmp_path):
    """GraphLAM end-to-end: the m2g (4-NN, exactly uniform) edge set
    rides the aligned layout by default; the model forward must be
    unchanged vs NEURAL_LAM_TPU_ALIGNED=off."""
    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.graphs.build import create_graph_from_datastore
    from neural_lam_tpu.models import GraphLAM

    ds = DummyDatastore(
        n_grid_x=9, n_grid_y=9, n_timesteps=10, root_path=tmp_path
    )
    create_graph_from_datastore(
        ds, ds.root_path / "graph" / "multiscale", hierarchical=False
    )
    rng = np.random.default_rng(0)
    n = ds.num_grid_points
    prev = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    prev_prev = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    forcing = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))

    def forward(aligned):
        monkeypatch.setenv("NEURAL_LAM_TPU_PALLAS", "interpret")
        monkeypatch.setenv(
            "NEURAL_LAM_TPU_ALIGNED", "auto" if aligned else "off"
        )
        # the 9x9 toy grid's m2g has only 81 receivers — one partial
        # block, so last-block chunk rounding exceeds the strict 1.05
        # default ratio (at MEPS size m2g sits at 1.002); raise it so
        # the aligned path is actually exercised here
        monkeypatch.setenv("NEURAL_LAM_TPU_ALIGNED_RATIO", "8.0")
        model = GraphLAM(
            ds, graph_name="multiscale", hidden_dim=8,
            processor_layers=2,
        )
        # the 4-NN m2g set must actually take the aligned layout
        groups = model.graph.m2g.edges.layout.aligned_groups
        assert (groups > 0) == aligned, (groups, aligned)
        params = model.init_params(jax.random.PRNGKey(0))
        out, _ = model.step(params, prev, prev_prev, forcing)
        return np.asarray(out)

    o_off = forward(False)
    o_on = forward(True)
    np.testing.assert_allclose(o_on, o_off, rtol=2e-5, atol=2e-5)
