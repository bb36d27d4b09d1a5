"""A/B: regular-structure (stencil) m2m formulation vs the fused kernel.

On the uniform quad mesh every same-level m2m edge belongs to one of 8
offset classes (N/S/E/W + diagonals, reference: create_graph.py:279-332)
and its static feature vector is constant within the class. Message
passing can therefore be written WITHOUT edge lists: per class, the
sender field is a shifted copy of the node field (zero-padded at the
border with a receiver-side validity mask), the evolving edge state is
a dense (8, nx, ny, d) tensor, and the whole InteractionNet step is 8
masked dense MLP applications + adds — no gathers, no one-hot matmuls,
no Pallas, no per-chunk overheads. This is the one structural
single-chip lever round 4 left untried (docs/performance.md round-5).

The A/B isolates the level-0 m2m set (81 x 81 mesh, 51,520 edges — the
dominant same-level set at MEPS size) and times one InteractionNet
application, forward and forward+backward, both formulations, on the
current backend:

    python scripts/stencil_ab.py [--iters 40] [--batch 4] [--check]

``--check`` first verifies the two formulations agree on CPU
(exact f32) before timing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

NX = NY = 81
HID = 64

# the 8 offset classes: edge class c connects sender (i+dx, j+dy) -> (i, j)
OFFSETS = [
    (dx, dy)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    if (dx, dy) != (0, 0)
]


def build_edges():
    """Edge list equivalent to the stencil: all 8-neighbour pairs on the
    NX x NY quad grid (same connectivity as mk_2d_graph with diagonals,
    both directions)."""
    idx = np.arange(NX * NY).reshape(NX, NY)
    senders, receivers, classes = [], [], []
    for c, (dx, dy) in enumerate(OFFSETS):
        # receiver (i, j) has sender (i+dx, j+dy) when in bounds
        ri = np.arange(max(0, -dx), NX - max(0, dx))
        rj = np.arange(max(0, -dy), NY - max(0, dy))
        rr, cc = np.meshgrid(ri, rj, indexing="ij")
        senders.append(idx[rr + dx, cc + dy].ravel())
        receivers.append(idx[rr, cc].ravel())
        classes.append(np.full(rr.size, c))
    return (
        np.concatenate(senders),
        np.concatenate(receivers),
        np.concatenate(classes),
    )


def stencil_step(mlp_edge, mlp_aggr, x2d, edge_state, masks):
    """One InteractionNet application in stencil form.

    x2d: (NX, NY, B, d) node field; edge_state: (8, NX, NY, B, d)
    batched evolving per-class edge reps (like the threaded edge reps
    between the real model's processor layers); masks:
    (8, NX, NY, 1, 1) receiver-side validity. Returns
    (new_x2d, new_edge_state). Matches apply_interaction_net
    semantics: messages = edge_mlp(edge, sender, receiver); aggregate
    = masked sum over classes; node update = receiver residual +
    aggr_mlp(rec, aggr); edge update = edge residual + messages.
    """
    import jax.numpy as jnp

    from neural_lam_tpu.ops.mlp import apply_mlp_split_first

    agg = jnp.zeros_like(x2d)
    new_edges = []
    for c, (dx, dy) in enumerate(OFFSETS):
        # shifted sender field: position (i, j) reads (i+dx, j+dy)
        shifted = jnp.roll(x2d, (-dx, -dy), axis=(0, 1))
        e_rep = edge_state[c]  # (NX, NY, B, d) batched evolving state
        msg = apply_mlp_split_first(
            mlp_edge, (e_rep, shifted, x2d)
        )  # (NX, NY, B, d)
        msg = msg * masks[c]
        agg = agg + msg
        new_edges.append(e_rep + msg)
    rec_diff = apply_mlp_split_first(mlp_aggr, (x2d, agg))
    return x2d + rec_diff, jnp.stack(new_edges)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", str(REPO / ".bench_cache" / "jax_cache")
    )

    import jax.numpy as jnp

    from neural_lam_tpu.ops.interaction import (
        apply_interaction_net,
        init_interaction_net,
        make_edge_set,
        place_edge_features,
    )

    senders, receivers, classes = build_edges()
    n = NX * NY
    B, d = args.batch, HID
    rng = np.random.default_rng(0)
    class_emb = rng.normal(size=(8, d)).astype(np.float32) * 0.3
    x = rng.normal(size=(n, B, d)).astype(np.float32)

    params = init_interaction_net(
        jax.random.PRNGKey(0), input_dim=d, hidden_layers=1
    )
    mlp_edge = params["edge"][0]
    mlp_aggr = params["aggr"][0]

    # --- edge-list side -------------------------------------------------
    # batched edge state from the start: the real model threads the
    # (batched) edge reps between processor layers, so the steady-state
    # cost per layer is what matters
    edge_set, perm = make_edge_set(senders, receivers, num_rec=n)
    edge_rep = jnp.broadcast_to(
        jnp.asarray(
            place_edge_features(class_emb[classes], perm, edge_set)
        )[:, None, :],
        (edge_set.num_padded, B, d),
    )

    def list_step(x_nodes, e_rep):
        return apply_interaction_net(
            params, edge_set, x_nodes, x_nodes, e_rep,
            update_edges=True,
        )

    # --- stencil side ---------------------------------------------------
    masks = np.zeros((8, NX, NY, 1, 1), np.float32)
    for c, (dx, dy) in enumerate(OFFSETS):
        ri = slice(max(0, -dx), NX - max(0, dx))
        rj = slice(max(0, -dy), NY - max(0, dy))
        masks[c, ri, rj] = 1.0
    masks = jnp.asarray(masks)
    edge_state0 = jnp.broadcast_to(
        jnp.asarray(class_emb)[:, None, None, None, :],
        (8, NX, NY, B, d),
    )

    def sten_step(x_nodes, e_state):
        x2d = x_nodes.reshape(NX, NY, B, d)
        new_x, new_e = stencil_step(
            mlp_edge, mlp_aggr, x2d, e_state, masks
        )
        return new_x.reshape(n, B, d), new_e

    if args.check:
        a = np.asarray(
            jax.jit(list_step)(jnp.asarray(x), edge_rep)[0]
        )
        b = np.asarray(
            jax.jit(sten_step)(jnp.asarray(x), edge_state0)[0]
        )
        diff = np.abs(a - b).max()
        print(f"check: max abs node diff = {diff:.3e}", file=sys.stderr)
        # TPU hardware-default matmul precision rounds the fused path's
        # one-hot gather/aggregate matmul operands to bf16; the stencil
        # has no one-hot matmuls, so the compiled-vs-compiled diff IS
        # that rounding (measured 2.9e-2 max at default precision,
        # 9.5e-7 under jax_default_matmul_precision=highest — verified
        # round 5). See docs/performance.md "Matmul precision on TPU".
        tol = 5e-2 if jax.default_backend() == "tpu" else 1e-4
        assert diff < tol, diff
        # fwd numbers should be close in magnitude too
        assert np.abs(a).mean() > 0.01

    # --- timing ---------------------------------------------------------
    # steady state: thread BOTH node and edge state between iterations
    # (as the real model's processor layers do)
    def timed(fn, e0):
        fn_j = jax.jit(fn)
        st = fn_j(jnp.asarray(x), e0)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st = fn_j(*st)
        jax.block_until_ready(st)
        return (time.perf_counter() - t0) / args.iters

    def timed_grad(fn, e0):
        def loss(xx, ee):
            out_x, out_e = fn(xx, ee)
            return jnp.sum(out_x) + jnp.sum(out_e)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        st = g(jnp.asarray(x), e0)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st = g(*st)
        jax.block_until_ready(st)
        return (time.perf_counter() - t0) / args.iters

    rows = {}
    for name, fn, e0 in (
        ("edge_list", list_step, edge_rep),
        ("stencil", sten_step, edge_state0),
    ):
        fwd = timed(fn, e0)
        fwdbwd = timed_grad(fn, e0)
        rows[name] = {"fwd_ms": fwd * 1e3, "fwdbwd_ms": fwdbwd * 1e3}
        print(
            f"{name}: fwd {fwd * 1e3:.3f} ms  fwd+bwd {fwdbwd * 1e3:.3f} ms",
            file=sys.stderr,
        )
    rows["speedup_fwd"] = (
        rows["edge_list"]["fwd_ms"] / rows["stencil"]["fwd_ms"]
    )
    rows["speedup_fwdbwd"] = (
        rows["edge_list"]["fwdbwd_ms"] / rows["stencil"]["fwdbwd_ms"]
    )
    rows["backend"] = jax.default_backend()
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
