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
ALL_MODELS = ("graph_lam", "hi_lam", "hi_lam_parallel")


def run_one(model: str, timeout: float) -> dict:
    cmd = [sys.executable, str(REPO / "bench.py"), "--model", model]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"model": model, "error": f"timeout after {timeout:.0f} s"}
    line = (r.stdout or "").strip().splitlines()
    rec: dict = {"model": model, "rc": r.returncode}
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
        "--models", default=",".join(ALL_MODELS),
        help="comma-separated model families to bench",
    )
    parser.add_argument(
        "--timeout", type=float, default=5400.0,
        help="per-model subprocess timeout in seconds (cold hierarchical "
        "compiles through the remote helper can take tens of minutes)",
    )
    args = parser.parse_args()

    records = []
    for model in args.models.split(","):
        print(f"=== {model} ===", file=sys.stderr)
        rec = run_one(model.strip(), args.timeout)
        print(json.dumps(rec))
        records.append(rec)

    out = REPO / "BENCH_FAMILY.json"
    out.write_text(json.dumps(records, indent=2) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    if any("error" in r for r in records):
        sys.exit(3)


if __name__ == "__main__":
    main()
