"""Compile the MEPS-size sharded train step on a virtual CPU mesh and
emit the per-step collective budget + projected scaling efficiency.

Usage::

    python scripts/collective_budget.py [--models graph_lam hi_lam ...]
        [--shards 2 4 8] [--out docs/collective_budget.md]

Runs entirely on CPU (8 virtual devices) — safe to run while the TPU is
busy. Step-time bases for the projections default to the measured
single-chip fp32 numbers from ``scripts/bench_family.py``
(docs/performance.md); override per model with
``--step-time-ms graph_lam=28.0 hi_lam=40.8``. The projection divides
compute by P and charges every exchanged byte serially against the v5e
ICI bandwidth (a no-overlap floor, see
neural_lam_tpu/parallel/collective_budget.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
# The collective structure is identical with the Pallas kernels off, and
# the CPU backend would only interpret them slowly.
os.environ["NEURAL_LAM_TPU_PALLAS"] = "off"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

# Measured single-chip fp32 train-step grid-points/s (round-4 final
# family matrix, docs/performance.md) — basis for the projected
# efficiencies; step time = BATCH * n_grid / gps.
MEASURED_GPS = {
    "graph_lam": 9.1e6,
    "hi_lam": 6.26e6,
    "hi_lam_parallel": 7.83e6,
}


def exchange_rounds(model_name: str, metas: dict, proc_layers: int) -> dict:
    """Exchanges per FORWARD for each edge set, from the model's
    message-passing structure (neither side is read from the HLO, so
    the analytic table stays an independent cross-check).

    - graph_lam: the multiscale m2m set runs once per processor layer;
      g2m/m2g once each (models/graph_lam.py).
    - hi_lam: each processor layer runs a down sweep then an up sweep,
      each touching every same-level set once -> m2m{l} x 2*layers;
      up{l} runs in every up sweep plus the mesh INIT sweep, down{l} in
      every down sweep plus the READOUT sweep -> layers + 1 each
      (models/hi_lam.py:55-135, hierarchical.py:124-181; reference:
      hi_lam.py:302-360, hierarchical.py:229-279).
    - hi_lam_parallel: all mesh sets run once per processor layer, plus
      the same INIT/READOUT sweeps (models/hi_lam_parallel.py;
      reference: hi_lam_parallel.py:147-209).
    """
    rounds = {}
    for name in metas:
        if name in ("g2m", "m2g"):
            rounds[name] = 1
        elif name.startswith("m2m"):
            rounds[name] = (
                2 * proc_layers if model_name == "hi_lam" else proc_layers
            )
        else:  # up{l} / down{l}
            rounds[name] = proc_layers + 1
    return rounds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models", nargs="+",
        default=["graph_lam", "hi_lam", "hi_lam_parallel"],
        choices=sorted(MEASURED_GPS),
    )
    ap.add_argument("--shards", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument(
        "--step-time-ms", nargs="+", default=[],
        metavar="MODEL=MS",
        help="override the measured step-time basis, e.g. graph_lam=28.0",
    )
    ap.add_argument("--out", default=str(REPO / "docs" /
                                         "collective_budget.md"))
    ap.add_argument("--json", default=str(REPO / ".bench_cache" /
                                          "collective_budget.json"))
    args = ap.parse_args()
    overrides = {}
    for item in args.step_time_ms:
        if "=" not in item:
            ap.error(
                f"--step-time-ms takes MODEL=MS pairs (got {item!r}); "
                "e.g. --step-time-ms graph_lam=28.0 hi_lam=40.8"
            )
        k, v = item.split("=", 1)
        overrides[k] = float(v)

    import bench
    from neural_lam_tpu.models import ARForecaster
    from neural_lam_tpu.parallel import ShardedModel
    from neural_lam_tpu.parallel.collective_budget import (
        analytic_budget,
        attribute_rows,
        format_markdown,
        hlo_collective_table,
        hlo_wire_bytes,
        projected_efficiency,
    )
    from neural_lam_tpu.trainer import make_optimizer

    sections = []
    payload = {"configs": []}
    for model_name in args.models:
        trainer, ds = bench.build_trainer(model_name)
        model = trainer.forecaster.predictor
        fc = ARForecaster(model, ds)
        params = model.init_params(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3)
        opt_state = optimizer.init(params)
        n = ds.num_grid_points
        step_ms = overrides.get(
            model_name, bench.BATCH * n / MEASURED_GPS[model_name] * 1e3
        )

        for P_ in args.shards:
            devices = np.array(jax.devices()[:P_]).reshape(1, P_)
            mesh = Mesh(devices, axis_names=("data", "spatial"))
            sharded = ShardedModel(model, ds, mesh)
            step = sharded.make_train_step(
                fc, optimizer, trainer.per_var_std
            )

            rng = np.random.default_rng(0)
            B = bench.BATCH
            init = sharded.pad_grid(
                rng.normal(size=(B, 2, n, bench.N_STATE)).astype(
                    np.float32
                )
            )
            target = sharded.pad_grid(
                rng.normal(size=(B, 1, n, bench.N_STATE)).astype(
                    np.float32
                )
            )
            forcing = sharded.pad_grid(
                rng.normal(
                    size=(B, 1, n, bench.N_FORCING * 3)
                ).astype(np.float32)
            )
            sharding = sharded.node_sharding()
            dev = lambda a: jax.device_put(a, sharding)  # noqa: E731
            print(
                f"[{model_name} P={P_}] lowering + compiling ...",
                file=sys.stderr,
            )
            hlo = step.lower(
                params, opt_state, dev(init), dev(target), dev(forcing)
            ).compile().as_text()

            rows = attribute_rows(
                hlo_collective_table(hlo), sharded.metas
            )
            rounds = exchange_rounds(
                model_name, sharded.metas, bench.PROC_LAYERS
            )
            analytic = analytic_budget(
                sharded.metas, B, model.hidden_dim, rounds=rounds
            )
            edge_bytes = sum(a["bytes_per_step"] for a in analytic)
            n_coll = sum(a["collectives_per_step"] for a in analytic)
            hlo_bytes = hlo_wire_bytes(rows, P_)
            projections = [
                projected_efficiency(
                    step_ms / 1e3, edge_bytes, n_coll, P_
                )
            ]
            strategies = {
                name: m.strategy for name, m in sharded.metas.items()
            }
            sections.append(
                format_markdown(
                    rows, analytic, projections,
                    f"MEPS {model_name} train step, spatial P={P_} "
                    f"(strategies: {strategies})",
                )
            )
            payload["configs"].append(
                {
                    "model": model_name,
                    "P": P_,
                    "step_time_ms_basis": step_ms,
                    "strategies": strategies,
                    "analytic_edge_bytes_per_step": edge_bytes,
                    "hlo_wire_bytes": hlo_bytes,
                    "collectives_per_step": n_coll,
                    "hlo_rows": [r.__dict__ for r in rows],
                    "projection": projections[0],
                }
            )
            print(
                f"[{model_name} P={P_}] strategies={strategies} "
                f"edge_bytes/step={edge_bytes:,} "
                f"hlo_wire_bytes={hlo_bytes:,}",
                file=sys.stderr,
            )

    head = (
        "# Collective budget (generated by scripts/collective_budget.py)"
        "\n\nMEPS-size sharded train steps (GraphLAM + the hierarchical"
        " family) compiled on the 8-virtual-device CPU mesh; byte counts"
        " are exact HLO payloads (identical collectives to the TPU build"
        " — the partitioning is platform-independent). HLO wire bytes"
        " (all-gather x (P-1)/P, reduce-scatter x (P-1), permutes"
        " exact) cross-check the analytic per-edge-set budget: they"
        " match TO THE BYTE for graph_lam and hi_lam. For"
        " hi_lam_parallel the analytic number is a per-section UPPER"
        " bound — the combined per-section executor gathers each"
        " sender level ONCE per processor layer and shares it across"
        " the sections riding that level (m2m{l}, up{l}, down{l-1}),"
        " so the compiled forward moves fewer bytes than per-section"
        " accounting; the conservative projection uses the upper"
        " bound.\nProjection bases: measured single-chip fp32 step"
        f" times (grid-points/s: {MEASURED_GPS})."
        "\n\n"
    )
    Path(args.out).write_text(head + "\n".join(sections))
    Path(args.json).parent.mkdir(exist_ok=True)
    Path(args.json).write_text(json.dumps(payload, indent=1))
    print(f"wrote {args.out} and {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
