"""Bench the whole model family: GraphLAM / HiLAM / HiLAMParallel.

Runs ``python bench.py --model <m>`` once per family in a FRESH
subprocess each (co-resident big-model executables degrade step time
enormously on the tunnel chip — CLAUDE.md "Benchmarking"), collects the
one-line JSONs, prints them, and writes ``BENCH_FAMILY.json`` next to
``bench.py`` so hierarchical-model perf regressions are
machine-detectable (VERDICT r2 #5).

Usage: ``python scripts/bench_family.py [--models graph_lam,hi_lam,...]``
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# label -> extra bench.py args; the default sweep covers every number
# docs/performance.md tracks (fp32 headline, bf16, single-chip sharded
# executor overhead, hierarchical families)
CONFIGS = {
    "graph_lam": ["--model", "graph_lam"],
    "graph_lam_bf16": ["--model", "graph_lam", "--precision", "bf16"],
    "graph_lam_spatial1": ["--model", "graph_lam", "--spatial_shards", "1"],
    "graph_lam_spatial1_bf16": [
        "--model", "graph_lam", "--spatial_shards", "1",
        "--precision", "bf16",
    ],
    "hi_lam": ["--model", "hi_lam"],
    "hi_lam_parallel": ["--model", "hi_lam_parallel"],
    "graph_lam_rollout19": ["--rollout", "19"],
    # the two remaining BASELINE.md configs (VERDICT r3 #3):
    # multi-step AR training (per-step remat cost at MEPS size) and the
    # probabilistic objective (2x output head + softplus std + NLL)
    "graph_lam_ar4": ["--ar_steps", "4"],
    "hi_lam_parallel_nll": [
        "--model", "hi_lam_parallel", "--output_std", "--loss", "nll",
    ],
    "hi_lam_parallel_crps": [
        "--model", "hi_lam_parallel", "--output_std", "--loss",
        "crps_gauss",
    ],
}


def run_one(label: str, extra: list[str], timeout: float) -> dict:
    cmd = [sys.executable, str(REPO / "bench.py"), *extra]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"config": label, "error": f"timeout after {timeout:.0f} s"}
    line = (r.stdout or "").strip().splitlines()
    rec: dict = {"config": label, "rc": r.returncode}
    if line:
        try:
            rec.update(json.loads(line[-1]))
        except json.JSONDecodeError:
            rec["error"] = f"unparseable output: {line[-1][:200]}"
    else:
        tail = (r.stderr or "").strip().splitlines()
        rec["error"] = tail[-1] if tail else "no output"
    return rec


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--configs", default=",".join(CONFIGS),
        help=f"comma-separated configs to bench (known: {list(CONFIGS)})",
    )
    parser.add_argument(
        "--timeout", type=float, default=5400.0,
        help="per-config subprocess timeout in seconds (cold "
        "compiles through the remote helper can take tens of minutes)",
    )
    args = parser.parse_args()

    records = []
    for label in args.configs.split(","):
        label = label.strip()
        extra = CONFIGS.get(label, ["--model", label])
        print(f"=== {label} ===", file=sys.stderr)
        rec = run_one(label, extra, args.timeout)
        print(json.dumps(rec))
        records.append(rec)

    out = REPO / "BENCH_FAMILY.json"
    out.write_text(json.dumps(records, indent=2) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    if any("error" in r for r in records):
        sys.exit(3)


if __name__ == "__main__":
    main()
