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


def build_trainer():
    import jax

    cache = REPO / ".bench_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    ds = bench.__dict__  # reuse bench's constants
    from neural_lam_tpu.config import DatastoreSelection, NeuralLAMConfig
    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.graphs import create_graph_from_datastore
    from neural_lam_tpu.models import ARForecaster, GraphLAM
    from neural_lam_tpu.trainer import Trainer, TrainingArgs

    dstore = DummyDatastore(
        n_grid_x=ds["GRID_X"],
        n_grid_y=ds["GRID_Y"],
        n_timesteps=8,
        n_state_features=ds["N_STATE"],
        n_forcing_features=ds["N_FORCING"],
        n_static_features=4,
        root_path=cache,
    )
    graph_dir = dstore.root_path / "graph" / "multiscale"
    if not (graph_dir / "graph.npz").exists():
        create_graph_from_datastore(dstore, graph_dir, hierarchical=False)
    model = GraphLAM(
        dstore,
        graph_name="multiscale",
        hidden_dim=ds["HIDDEN_DIM"],
        processor_layers=ds["PROC_LAYERS"],
    )
    forecaster = ARForecaster(model, dstore)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path="")
    )
    args = TrainingArgs(batch_size=ds["BATCH"], ar_steps_train=ds["AR_STEPS"])
    trainer = Trainer(forecaster, config, dstore, args)
    return trainer, dstore, ds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--outdir", default=str(REPO / ".bench_cache" / "trace"))
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import numpy as np

    trainer, dstore, C = build_trainer()
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
    batch, _ = trainer.device_put_batch(raw)

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

    planes = sorted(
        glob.glob(str(outdir / "**" / "*.xplane.pb"), recursive=True)
    )
    if not planes:
        print("no xplane.pb found", file=sys.stderr)
        return
    latest = planes[-1]
    summarize_xplane(latest, args.top, args.steps)


def summarize_xplane(path: str, top: int, steps: int) -> None:
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(int)
        counts = defaultdict(int)
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname and "tensorcore" not in lname:
                pass
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps
                counts[name] += 1
        if not totals:
            continue
        print(f"\n== plane: {plane.name} ==")
        total_ms = sum(totals.values()) / 1e9
        print(f"(sum over lines, {steps} steps) total {total_ms:.2f} ms")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        for name, ps in rows:
            ms = ps / 1e9 / steps
            print(f"{ms:9.3f} ms/step  x{counts[name]//steps:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
