"""Where the cold compile goes: Mosaic kernel specialization census.

The default embed-fused MEPS train step cold-compiles 25-45 min through
the remote-compile helper (CLAUDE.md). This script quantifies the
driver of that cost — the number of DISTINCT Mosaic kernel payloads an
executable carries (each distinct payload is a separate Mosaic -> LLO
compile in the helper) — by lowering each config's TRAIN step and
hashing every ``tpu_custom_call`` backend payload in the HLO. It does NOT compile (lowering is host-side and takes seconds), so
it is safe to run between benchmarks; pair the census with the helper's
observed per-kernel compile time to get the cold-compile budget.

Usage (on the TPU host)::

    python scripts/compile_time.py [--models graph_lam hi_lam ...]
        [--time-compile]

``--time-compile`` additionally times ``.compile()`` per step with the
persistent cache ENABLED (i.e. what a user actually pays on this
machine); expect minutes-to-tens-of-minutes when the cache is cold.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Mosaic kernels appear as custom calls with an embedded payload;
# distinct payloads -> distinct helper compiles.
# StableHLO MLIR form: stablehlo.custom_call @tpu_custom_call(...)
#   {backend_config = "{\22custom_call_config\22: {\22body\22: \22<payload>..."}
_CC_RE = re.compile(r"custom_call @tpu_custom_call\(")
_PAYLOAD_RE = re.compile(r'backend_config = "((?:[^"\\]|\\.)*)"')


def census(hlo_text: str) -> dict:
    """Count total Mosaic custom calls and distinct payloads."""
    total = 0
    payloads: Counter = Counter()
    for line in hlo_text.splitlines():
        if not _CC_RE.search(line):
            continue
        total += 1
        m = _PAYLOAD_RE.search(line)
        key = (
            hashlib.sha1(m.group(1).encode()).hexdigest()[:12]
            if m
            else "<no-payload>"
        )
        payloads[key] += 1
    return {
        "mosaic_calls": total,
        "distinct_payloads": len(payloads),
        "payload_reuse": dict(payloads.most_common(10)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models", nargs="+", default=["graph_lam", "hi_lam"],
    )
    ap.add_argument("--time-compile", action="store_true")
    args = ap.parse_args()

    import jax

    import bench

    report = {"backend": jax.default_backend(), "configs": []}
    for model_name in args.models:
        trainer, ds = bench.build_trainer(model_name)
        step = trainer.make_train_step()
        n = ds.num_grid_points
        B = bench.BATCH
        rng = np.random.default_rng(0)
        init = rng.normal(size=(B, 2, n, bench.N_STATE)).astype(
            np.float32
        )
        target = rng.normal(size=(B, 1, n, bench.N_STATE)).astype(
            np.float32
        )
        forcing = rng.normal(
            size=(B, 1, n, bench.N_FORCING * 3)
        ).astype(np.float32)
        params, opt_state = trainer.init_state(jax.random.PRNGKey(0))

        t0 = time.perf_counter()
        lowered = step.lower(params, opt_state, init, target, forcing)
        t_lower = time.perf_counter() - t0
        row = {
            "model": model_name,
            "step": "train",
            "lower_seconds": round(t_lower, 1),
            **census(lowered.as_text()),
        }
        if args.time_compile:
            t0 = time.perf_counter()
            lowered.compile()
            row["compile_seconds"] = round(time.perf_counter() - t0, 1)
        report["configs"].append(row)
        print(json.dumps(row), file=sys.stderr)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
