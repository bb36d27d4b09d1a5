"""Capture a jax.profiler device trace of the bench train step and print
an op-level time breakdown.

Usage: python scripts/profile_step.py [--steps N] [--outdir DIR]

Parses the captured xplane protobuf with tensorboard_plugin_profile's
converter when available; otherwise just leaves the trace for xprof.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_trainer(model="graph_lam", spatial_shards=0, precision="32"):
    """The exact bench configuration (shared with bench.py)."""
    import bench

    trainer, dstore = bench.build_trainer(model, spatial_shards, precision)
    return trainer, dstore, bench.__dict__


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--outdir", default=str(REPO / ".bench_cache" / "trace"))
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--model", default="graph_lam")
    ap.add_argument("--spatial_shards", type=int, default=0)
    ap.add_argument("--precision", default="32", choices=("32", "bf16"))
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench

    bench.init_devices_or_die()
    trainer, dstore, C = build_trainer(
        args.model, args.spatial_shards, args.precision
    )
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    train_step = trainer.make_train_step()

    rng = np.random.default_rng(0)
    n = dstore.num_grid_points
    f_dim = C["N_FORCING"] * 3
    raw = (
        rng.normal(size=(C["BATCH"], 2, n, C["N_STATE"])).astype(np.float32),
        rng.normal(
            size=(C["BATCH"], C["AR_STEPS"], n, C["N_STATE"])
        ).astype(np.float32),
        rng.normal(
            size=(C["BATCH"], C["AR_STEPS"], n, f_dim)
        ).astype(np.float32),
    )
    batch, _ = trainer.device_put_batch(raw)  # pads grid when sharded

    # warm up (compile)
    params, opt_state, loss = train_step(params, opt_state, *batch)
    jax.block_until_ready(loss)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(outdir)):
        for _ in range(args.steps):
            params, opt_state, loss = train_step(params, opt_state, *batch)
        jax.block_until_ready(loss)
    print("trace captured to", outdir, file=sys.stderr)

    traces = sorted(
        glob.glob(str(outdir / "**" / "*.trace.json.gz"), recursive=True)
    )
    if not traces:
        print("no trace.json.gz found", file=sys.stderr)
        return
    summarize_trace(traces[-1], args.top, args.steps)


def _category(name: str) -> str:
    if "closed_call" in name or "custom-call" in name:
        return "pallas"
    if "fusion" in name:
        return "fusion"
    if "copy" in name:
        return "copy"
    if "convolution" in name or "dot" in name:
        return "dot"
    if "transpose" in name:
        return "transpose"
    if "reduce" in name:
        return "reduce"
    return "other"


def summarize_trace(path: str, top: int, steps: int) -> None:
    """Exclusive-time breakdown from the Perfetto trace's "XLA Ops"
    device line (async copy/slice lines overlap compute and would
    double-count; this line is the op-by-op execution timeline)."""
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    op_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["args"].get("name") == "XLA Ops"
        and e["pid"] in device_pids
    }
    totals: dict = defaultdict(float)
    cats: dict = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e["name"].split(" = ")[0].lstrip("%")
        totals[name] += e["dur"]
        cats[_category(name)] += e["dur"]
    if not totals:
        print("no XLA Ops events found", file=sys.stderr)
        return
    busy = sum(cats.values()) / 1e3 / steps
    print(f"\nTPU busy: {busy:.2f} ms/step (exclusive op time)")
    print("by category (ms/step):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v/1e3/steps:8.3f}")
    print(f"top {top} ops (ms/step):")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3/steps:8.3f}  {name[:100]}")


if __name__ == "__main__":
    main()
