"""Compile the MEPS-size sharded train step on a virtual CPU mesh and
emit the per-step collective budget + projected scaling efficiency.

Usage::

    python scripts/collective_budget.py [--shards 2 4 8]
        [--step-time-ms 27.5] [--out docs/collective_budget.md]

Runs entirely on CPU (8 virtual devices) — safe to run while the TPU is
busy. ``--step-time-ms`` should be the measured single-chip step time
from ``bench.py`` (fp32 default step); the projection divides compute
by P and charges every exchanged byte serially against the v5e ICI
bandwidth (a no-overlap floor, see
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
import optax  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--step-time-ms", type=float, default=None,
                    help="measured single-chip step time (bench.py)")
    ap.add_argument("--out", default=str(REPO / "docs" /
                                         "collective_budget.md"))
    ap.add_argument("--json", default=str(REPO / ".bench_cache" /
                                          "collective_budget.json"))
    args = ap.parse_args()

    import bench
    from neural_lam_tpu.models import ARForecaster
    from neural_lam_tpu.parallel import ShardedModel
    from neural_lam_tpu.parallel.collective_budget import (
        analytic_budget,
        attribute_rows,
        format_markdown,
        hlo_collective_table,
        projected_efficiency,
    )

    trainer, ds = bench.build_trainer("graph_lam")
    model = trainer.forecaster.predictor
    fc = ARForecaster(model, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)

    sections = []
    payload = {"configs": []}
    for P_ in args.shards:
        devices = np.array(jax.devices()[:P_]).reshape(1, P_)
        mesh = Mesh(devices, axis_names=("data", "spatial"))
        sharded = ShardedModel(model, ds, mesh)
        step = sharded.make_train_step(fc, optimizer, trainer.per_var_std)

        rng = np.random.default_rng(0)
        n = ds.num_grid_points
        B = bench.BATCH
        init = sharded.pad_grid(
            rng.normal(size=(B, 2, n, bench.N_STATE)).astype(np.float32)
        )
        target = sharded.pad_grid(
            rng.normal(size=(B, 1, n, bench.N_STATE)).astype(np.float32)
        )
        forcing = sharded.pad_grid(
            rng.normal(
                size=(B, 1, n, bench.N_FORCING * 3)
            ).astype(np.float32)
        )
        sharding = sharded.node_sharding()
        dev = lambda a: jax.device_put(a, sharding)  # noqa: E731
        print(f"[P={P_}] lowering + compiling ...", file=sys.stderr)
        hlo = step.lower(
            params, opt_state, dev(init), dev(target), dev(forcing)
        ).compile().as_text()

        rows = attribute_rows(hlo_collective_table(hlo), sharded.metas)
        # exchange multiplicity: GraphLAM runs the m2m set once per
        # processor layer; g2m/m2g once each (forward)
        rounds = {
            name: (bench.PROC_LAYERS if name.startswith("m2m") else 1)
            for name in sharded.metas
        }
        analytic = analytic_budget(
            sharded.metas, B, model.hidden_dim, rounds=rounds
        )
        edge_bytes = sum(a["bytes_per_step"] for a in analytic)
        n_coll = sum(a["collectives_per_step"] for a in analytic)
        hlo_bytes = sum(
            r.bytes_total for r in rows if r.op != "all-reduce"
        )
        projections = []
        if args.step_time_ms:
            projections.append(
                projected_efficiency(
                    args.step_time_ms / 1e3, edge_bytes, n_coll, P_
                )
            )
        strategies = {
            name: m.strategy for name, m in sharded.metas.items()
        }
        sections.append(
            format_markdown(
                rows, analytic, projections,
                f"MEPS GraphLAM train step, spatial P={P_} "
                f"(strategies: {strategies})",
            )
        )
        payload["configs"].append(
            {
                "P": P_,
                "strategies": strategies,
                "analytic_edge_bytes_per_step": edge_bytes,
                "hlo_collective_bytes": hlo_bytes,
                "collectives_per_step": n_coll,
                "hlo_rows": [r.__dict__ for r in rows],
                "projection": projections[0] if projections else None,
            }
        )
        print(
            f"[P={P_}] strategies={strategies} "
            f"edge_bytes/step={edge_bytes:,} "
            f"hlo_collective_bytes={hlo_bytes:,}",
            file=sys.stderr,
        )

    head = (
        "# Collective budget (generated by scripts/collective_budget.py)"
        "\n\nMEPS-size GraphLAM sharded train step compiled on the"
        " 8-virtual-device CPU mesh; byte counts are exact HLO payloads"
        " (identical collectives to the TPU build — the partitioning is"
        " platform-independent)."
        + (
            f"\nProjection basis: measured {args.step_time_ms} ms"
            " single-chip fp32 step (bench.py)."
            if args.step_time_ms
            else ""
        )
        + "\n\n"
    )
    Path(args.out).write_text(head + "\n".join(sections))
    Path(args.json).parent.mkdir(exist_ok=True)
    Path(args.json).write_text(json.dumps(payload, indent=1))
    print(f"wrote {args.out} and {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
