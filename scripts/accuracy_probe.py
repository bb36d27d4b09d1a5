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
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_rollout(steps: int) -> np.ndarray:
    import jax

    sys.path.insert(0, str(REPO))
    import bench

    trainer, ds = bench.build_trainer()
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
    out = jax.jit(lambda p, i, f, b: fc.forward(p, i, f, b)[0])(
        params, init, forcing, boundary
    )
    return np.asarray(jax.block_until_ready(out))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=19)
    ap.add_argument("--save", type=str)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (exact f32 matmuls)")
    ap.add_argument("--matmul-precision-highest", action="store_true",
                    help="exact f32 operands on the current backend")
    ap.add_argument("--compare", nargs=2, metavar=("GOT", "WANT"))
    args = ap.parse_args()

    if args.compare:
        got = np.load(args.compare[0])["prediction"]
        want = np.load(args.compare[1])["prediction"]
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
        print(json.dumps(rows, indent=1))
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision_highest:
        jax.config.update("jax_default_matmul_precision", "highest")
    pred = run_rollout(args.steps)
    if args.save:
        np.savez_compressed(args.save, prediction=pred)
        print(f"wrote {args.save} shape={pred.shape}")


if __name__ == "__main__":
    main()
