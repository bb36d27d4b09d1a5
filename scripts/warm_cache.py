"""Warm the persistent compilation cache for the supported config
matrix (VERDICT r3 #7).

The fused-kernel step variants compile through the TPU remote-compile
helper — historically 25-45 min COLD for the embed-fused training step
and ~10 min per striped batch-16 shape — so a wiped ``.bench_cache/``
(fresh clone, new container) makes the first bench/training run of
each configuration an operational hazard. This script sweeps every
configuration ``bench.py`` and the CLI can run through
``bench.py --compile_only`` (build + compile + one warmup step, no
timing loop), one FRESH subprocess per config (co-resident big-model
executables degrade the tunnel chip; CLAUDE.md "Benchmarking"), and
prints a compile-time table.

Usage::

    python scripts/warm_cache.py [--configs a,b,...] [--timeout 5400]

Run it once after any change that invalidates executables (kernel
signature changes, jax upgrades); afterwards every bench/CLI start is
seconds. The cache lives in ``.bench_cache/jax_cache`` (gitignored).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# label -> bench.py args; mirrors scripts/bench_family.py CONFIGS plus
# the serving rollouts. Ordered cheapest-first so an interrupted warm
# run still covers the common configs.
CONFIGS: dict[str, list[str]] = {
    "graph_lam": [],
    "graph_lam_bf16": ["--precision", "bf16"],
    "graph_lam_spatial1": ["--spatial_shards", "1"],
    "graph_lam_spatial1_bf16": ["--spatial_shards", "1",
                                "--precision", "bf16"],
    "hi_lam": ["--model", "hi_lam"],
    "hi_lam_parallel": ["--model", "hi_lam_parallel"],
    "graph_lam_ar4": ["--ar_steps", "4"],
    "hi_lam_parallel_nll": ["--model", "hi_lam_parallel",
                            "--output_std", "--loss", "nll"],
    "hi_lam_parallel_crps": ["--model", "hi_lam_parallel",
                             "--output_std", "--loss", "crps_gauss"],
    "rollout19_B1": ["--rollout", "19"],
    "rollout19_B4": ["--rollout", "19", "--rollout_batch", "4"],
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--timeout", type=float, default=5400.0)
    args = ap.parse_args()

    rows = []
    for label in args.configs.split(","):
        label = label.strip()
        extra = CONFIGS[label]
        cmd = [sys.executable, str(REPO / "bench.py"), "--compile_only",
               *extra]
        print(f"=== {label} ===", file=sys.stderr)
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=args.timeout, cwd=REPO,
            )
            ok = r.returncode == 0 and '"compiled": true' in (
                r.stdout or ""
            )
            err = (
                ""
                if ok
                else (r.stderr or "").strip().splitlines()[-1:]
            )
        except subprocess.TimeoutExpired:
            ok, err = False, [f"timeout after {args.timeout:.0f} s"]
        rows.append(
            {
                "config": label,
                "ok": ok,
                "wall_s": round(time.monotonic() - t0, 1),
                **({"error": err[0]} if err else {}),
            }
        )
        print(json.dumps(rows[-1]))

    print("\n| config | compile+warmup wall (s) | ok |")
    print("|---|---|---|")
    for row in rows:
        print(f"| {row['config']} | {row['wall_s']} | {row['ok']} |")
    if not all(r["ok"] for r in rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
