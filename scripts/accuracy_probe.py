"""Quantify end-to-end TPU numerics vs exact-f32 CPU execution.

The TPU hardware-default matmul precision rounds f32 matmul operands
to bf16 (docs/performance.md "Matmul precision on TPU") — the same
class of rounding the reference's CUDA TF32 default applies
(reference: neural_lam/train_model.py:423-427). This probe measures
what that means END TO END: the 19-step MEPS-size GraphLAM rollout
(the reference's test protocol length) executed on the current
backend, compared against an exact-f32 run, reporting per-step
relative error in standardized space.

Usage::

    # on the TPU machine (writes the backend's rollout)
    python scripts/accuracy_probe.py --save /tmp/rollout_tpu.npz
    # exact-f32 reference on CPU (same params/inputs by construction)
    JAX_PLATFORMS='' python scripts/accuracy_probe.py --cpu \
        --save /tmp/rollout_cpu.npz
    # compare
    python scripts/accuracy_probe.py --compare /tmp/rollout_tpu.npz \
        /tmp/rollout_cpu.npz

Params and inputs are derived from fixed seeds, so separate processes
produce identical inputs. The CPU run uses the XLA fallback path
(exact f32 matmuls); `--matmul-precision-highest` instead measures the
TPU itself with exact operands (slower, sanity-checks that the
deviation is the matmul rounding and nothing else).

Regression-fixture workflow (CI-adjacent; run after ANY kernel change)::

    # one-time (or after an intentional numerics change): regenerate
    # the committed exact-f32 fixture on CPU
    python scripts/accuracy_probe.py --cpu \
        --save-fixture tests/fixtures/accuracy/rollout19_f32.npz

    # on the TPU: check the current kernels against the fixture
    python scripts/accuracy_probe.py \
        --check tests/fixtures/accuracy/rollout19_f32.npz
    python scripts/accuracy_probe.py --precision bf16 \
        --check tests/fixtures/accuracy/rollout19_f32.npz \
        --mean-rel-max 0.02 --max-rel-max 0.8

The fixture stores the full-field per-step stats plus the prediction at
a fixed grid subsample (every 50th node — small enough to commit, dense
enough that a broken kernel cannot hide). ``--check`` exits nonzero
when any step exceeds the thresholds; the fp32 defaults leave ~2.5x
headroom over the measured TPU default-precision envelope (round-5
measurement: mean_rel grows 6e-4 -> 1.04e-2 and max_rel 3.5e-3 ->
8.0e-2 over steps 1..19 — the TF32-analog matmul rounding compounding
through the rollout, docs/performance.md "Matmul precision on TPU"),
so real kernel regressions (which show up orders of magnitude above
the rounding envelope) trip it while reruns don't. With
``--matmul-precision-highest`` the same check passes at ~1e-6, which
isolates any violation to matmul rounding vs a real bug.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SUBSAMPLE = 50  # every 50th grid node goes into the committed fixture


def run_rollout(steps: int, precision: str = "32") -> np.ndarray:
    import jax

    sys.path.insert(0, str(REPO))
    import bench

    trainer, ds = bench.build_trainer(precision=precision)
    fc = trainer.forecaster
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    init = rng.normal(size=(1, 2, n, bench.N_STATE)).astype(np.float32)
    forcing = rng.normal(
        size=(1, steps, n, bench.N_FORCING * 3)
    ).astype(np.float32)
    boundary = rng.normal(
        size=(1, steps, n, bench.N_STATE)
    ).astype(np.float32)
    params, _ = trainer.init_state(jax.random.PRNGKey(0))
    if precision == "bf16":
        # match the trainer's mixed-precision step: f32 master params,
        # bf16 compute copies (trainer.py _loss)
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params
        )
    out = jax.jit(lambda p, i, f, b: fc.forward(p, i, f, b)[0])(
        params, init, forcing, boundary
    )
    return np.asarray(jax.block_until_ready(out), np.float32)


def _per_step_rows(got: np.ndarray, want: np.ndarray) -> list[dict]:
    scale = np.abs(want).mean()
    rows = []
    for t in range(got.shape[1]):
        d = got[:, t] - want[:, t]
        rows.append(
            {
                "step": t + 1,
                "mean_rel": float(np.abs(d).mean() / scale),
                "max_rel": float(np.abs(d).max() / scale),
                "rmse": float(np.sqrt((d ** 2).mean())),
            }
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=19)
    ap.add_argument("--save", type=str)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (exact f32 matmuls)")
    ap.add_argument("--precision", choices=["32", "bf16"], default="32",
                    help="bf16 runs the mixed-precision rollout "
                    "(bf16 params + compute, like --precision bf16 "
                    "training)")
    ap.add_argument("--matmul-precision-highest", action="store_true",
                    help="exact f32 operands on the current backend")
    ap.add_argument("--compare", nargs=2, metavar=("GOT", "WANT"))
    ap.add_argument("--save-fixture", type=str, metavar="PATH",
                    help="run the rollout and write a committed-size "
                    "regression fixture (subsampled field + stats)")
    ap.add_argument("--check", type=str, metavar="FIXTURE",
                    help="run the rollout on the current backend and "
                    "fail if it exceeds the thresholds vs the fixture")
    ap.add_argument("--mean-rel-max", type=float, default=0.025)
    ap.add_argument("--max-rel-max", type=float, default=0.25)
    args = ap.parse_args()

    if args.compare:
        got = np.load(args.compare[0])["prediction"]
        want = np.load(args.compare[1])["prediction"]
        print(json.dumps(_per_step_rows(got, want), indent=1))
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision_highest:
        jax.config.update("jax_default_matmul_precision", "highest")
    pred = run_rollout(args.steps, precision=args.precision)
    if args.save:
        np.savez_compressed(args.save, prediction=pred)
        print(f"wrote {args.save} shape={pred.shape}")
    if args.save_fixture:
        sub = pred[:, :, ::SUBSAMPLE, :]
        Path(args.save_fixture).parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            args.save_fixture,
            prediction_sub=sub,
            subsample=np.int64(SUBSAMPLE),
            steps=np.int64(args.steps),
            # full-field summary: --check compares it so a magnitude
            # shift outside the subsample cannot slip through
            abs_mean=np.float32(np.abs(pred).mean()),
            meta=json.dumps(
                {
                    "precision": args.precision,
                    "backend": jax.default_backend(),
                    "note": "exact-f32 CPU rollout fixture; regenerate "
                    "with scripts/accuracy_probe.py --cpu "
                    "--save-fixture after intentional numerics changes",
                }
            ),
        )
        print(
            f"wrote fixture {args.save_fixture} "
            f"sub-shape={sub.shape} "
            f"({Path(args.save_fixture).stat().st_size / 1e6:.2f} MB)"
        )
    if args.check:
        fx = np.load(args.check)
        assert int(fx["steps"]) == args.steps, (
            f"fixture has {int(fx['steps'])} steps, ran {args.steps}"
        )
        sub = pred[:, :, :: int(fx["subsample"]), :]
        want = fx["prediction_sub"]
        rows = _per_step_rows(sub, want)
        worst_mean = max(r["mean_rel"] for r in rows)
        worst_max = max(r["max_rel"] for r in rows)
        # full-field magnitude drift: catches a bug that shifts the
        # overall field while leaving the subsample stats in-threshold
        abs_mean_drift = float(
            abs(np.abs(pred).mean() - float(fx["abs_mean"]))
            / max(float(fx["abs_mean"]), 1e-12)
        )
        verdict = {
            "backend": jax.default_backend(),
            "precision": args.precision,
            "worst_mean_rel": worst_mean,
            "worst_max_rel": worst_max,
            "abs_mean_drift": abs_mean_drift,
            "thresholds": {
                "mean_rel_max": args.mean_rel_max,
                "max_rel_max": args.max_rel_max,
                "abs_mean_drift_max": args.mean_rel_max,
            },
            "per_step": rows,
        }
        print(json.dumps(verdict, indent=1))
        if (
            worst_mean > args.mean_rel_max
            or worst_max > args.max_rel_max
            or abs_mean_drift > args.mean_rel_max
        ):
            print("ACCURACY REGRESSION: thresholds exceeded",
                  file=sys.stderr)
            raise SystemExit(1)
        print("accuracy check passed", file=sys.stderr)


if __name__ == "__main__":
    main()
