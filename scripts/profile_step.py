"""Capture a jax.profiler trace of the MEPS-size train step on TPU.

Usage: python scripts/profile_step.py [outdir]
Prints a per-op-category summary parsed from the trace so kernel tuning
doesn't need TensorBoard in the loop.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

GRID_X, GRID_Y = 268, 238
N_STATE, N_FORCING = 17, 6
BATCH = 4


def main() -> None:
    import jax

    from bench import CACHE_DIR  # reuse the cached graph
    from neural_lam_tpu.config import (
        DatastoreSelection,
        NeuralLAMConfig,
    )
    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.graphs import create_graph_from_datastore
    from neural_lam_tpu.models import ARForecaster, GraphLAM
    from neural_lam_tpu.trainer import Trainer, TrainingArgs

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nl_profile"
    CACHE_DIR.mkdir(exist_ok=True)
    ds = DummyDatastore(
        n_grid_x=GRID_X,
        n_grid_y=GRID_Y,
        n_timesteps=8,
        n_state_features=N_STATE,
        n_forcing_features=N_FORCING,
        n_static_features=4,
        root_path=CACHE_DIR,
    )
    graph_dir = ds.root_path / "graph" / "multiscale"
    if not (graph_dir / "graph.npz").exists():
        create_graph_from_datastore(ds, graph_dir, hierarchical=False)
    model = GraphLAM(ds, graph_name="multiscale")
    trainer = Trainer(
        ARForecaster(model, ds),
        NeuralLAMConfig(
            datastore=DatastoreSelection(kind="dummydata", config_path="")
        ),
        ds,
        TrainingArgs(batch_size=BATCH),
    )
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.make_train_step()
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(BATCH, 2, n, N_STATE)).astype(np.float32),
        rng.normal(size=(BATCH, 1, n, N_STATE)).astype(np.float32),
        rng.normal(size=(BATCH, 1, n, N_FORCING * 3)).astype(np.float32),
    )
    db, _ = trainer.device_put_batch(batch)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, *db)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, *db)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    time.sleep(1)
    summarize(outdir)


def summarize(outdir: str) -> None:
    traces = sorted(
        glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    )
    if not traces:
        print("no trace found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    per_op = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep only device lanes (TensorCore op events)
        name = ev.get("name", "")
        args = ev.get("args", {})
        if not isinstance(args, dict):
            args = {}
        key = args.get("long_name", name).split("(")[0][:80]
        per_op[key] += ev["dur"]
    total = sum(per_op.values())
    print(f"total device-op time (3 steps, us): {total:.0f}")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/3:10.0f} us/step  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
