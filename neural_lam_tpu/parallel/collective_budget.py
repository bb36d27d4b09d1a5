"""Per-step collective payload accounting + projected scaling efficiency.

The reference cannot measure its communication at all (DDP hides the
all-reduce inside torch, reference: neural_lam/train_model.py:517-530);
here the sharded executor's collectives are explicit shard_map ops, so
the compiled HLO names every transfer. This module turns that into a
quantitative budget: bytes per collective per training step, attributed
back to the edge sets that caused them, plus a projected grid-points/s
scaling efficiency at P chips from a measured single-chip step time and
the v5e ICI bandwidth — replacing the prose estimate that used to live
in docs/scaling.md.

Two sources, cross-checkable:

- :func:`hlo_collective_table` parses a compiled sharded train step
  (``.lower(...).compile().as_text()``) and tabulates every
  all-gather / collective-permute / all-reduce / reduce-scatter with
  its payload bytes. This is the ground truth (it also catches any
  resharding collective XLA inserts on its own).
- :func:`analytic_budget` computes the expected exchange bytes from the
  partition builder's :class:`EdgeMeta` tables alone (no compile), for
  quick what-if tables at other shard counts.

``scripts/collective_budget.py`` drives both at MEPS size on the
8-virtual-device CPU mesh and writes the docs artifact.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence

import numpy as np

# v5e ICI: one-way bandwidth per link (public "How to Scale Your Model"
# hardware table). A 1-D spatial axis maps onto a ring; neighbour
# ppermutes in both directions ride separate links concurrently, but
# the projection below conservatively serialises all payloads through
# ONE link direction.
V5E_ICI_ONEWAY_BYTES_S = 4.5e10
# Fixed cost per collective launch (dispatch + link latency), used for
# the many-tiny-permutes term of the projection.
COLLECTIVE_LATENCY_S = 1e-6

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVE_RE = re.compile(
    r"=\s*(?P<out>\([^)]*\)|[\w\[\],{}\s]*?)\s*"
    r"(?P<op>all-gather|all-reduce|collective-permute|reduce-scatter|"
    r"all-to-all)"
    r"(?P<async>-start|-done)?\("
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


@dataclasses.dataclass
class CollectiveRow:
    op: str
    count: int
    bytes_each: int
    bytes_total: int
    first_dims: tuple[int, ...]
    attributed: str = ""


def _shape_bytes(dtype: str, dims_str: str) -> tuple[int, int]:
    dims = [int(x) for x in dims_str.split(",") if x]
    elems = int(np.prod(dims)) if dims else 1
    return elems * _DTYPE_BYTES.get(dtype, 4), (dims[0] if dims else 1)


def hlo_collective_table(hlo_text: str) -> list[CollectiveRow]:
    """Every collective in a compiled HLO module, grouped by
    (op, payload bytes). ``-done`` halves of async pairs are skipped so
    each transfer counts once; a row's bytes are the op RESULT bytes
    (for a tiled all-gather that is the full gathered array; for a
    permute, the payload)."""
    rows: dict[tuple[str, int, int], int] = {}
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        if m.group("async") == "-done":
            continue
        out = m.group("out")
        shapes = _SHAPE_RE.findall(out)
        if not shapes:
            # async-start forms return (operand, result, ...) tuples;
            # fall back to every shape on the line's lhs
            shapes = _SHAPE_RE.findall(line.split("=", 1)[0])
        if not shapes:
            raise ValueError(
                "collective HLO line with no parseable shape "
                f"(format drift?): {line[:200]}"
            )
        # async tuples repeat operand+result; take the LARGEST single
        # shape as the transfer payload (result >= operand for gathers,
        # == for permutes).
        per = [
            _shape_bytes(d, s)
            for d, s in shapes
            if d in _DTYPE_BYTES
        ]
        if not per:
            continue
        nbytes, first = max(per)
        key = (m.group("op"), nbytes, first)
        rows[key] = rows.get(key, 0) + 1
    return [
        CollectiveRow(
            op=op, count=c, bytes_each=b, bytes_total=b * c,
            first_dims=(fd,),
        )
        for (op, b, fd), c in sorted(
            rows.items(), key=lambda kv: -kv[0][1] * kv[1]
        )
    ]


def attribute_rows(
    rows: Sequence[CollectiveRow], metas: dict
) -> list[CollectiveRow]:
    """Best-effort mapping of HLO collectives back to edge sets by
    matching the payload's leading (row-count) dimension against each
    set's halo table sizes / gathered extent."""
    dim_to_names: dict[int, set[str]] = {}
    for name, meta in metas.items():
        if meta.strategy == "all_gather":
            dim_to_names.setdefault(
                meta.n_send_local * meta.n_shards, set()
            ).add(f"{name}:all_gather")
        else:
            for h in meta.halo_sizes:
                dim_to_names.setdefault(h, set()).add(f"{name}:halo")
    out = []
    for r in rows:
        names = dim_to_names.get(r.first_dims[0], set())
        label = ",".join(sorted(names))
        if not label and r.op == "all-reduce":
            label = "grad psum / loss pmean"
        out.append(dataclasses.replace(r, attributed=label))
    return out


def hlo_wire_bytes(rows: Sequence[CollectiveRow], n_shards: int) -> int:
    """ICI wire bytes implied by an HLO collective table.

    The table records each op's RESULT bytes; the bytes that actually
    cross links differ per op: a tiled all-gather moves (P-1)/P of the
    gathered result (each shard already holds its slice), its
    reduce-scatter VJP returns a 1/P-sized shard after moving (P-1)
    shard-sizes, and a collective-permute's payload is exact. This is
    the quantity the analytic budget counts (rows_moved = halo rows, or
    ``n_send_local * (P-1)`` for gathered sets), so the two are
    comparable byte-for-byte. all-reduce (grad psum / loss pmean) is
    excluded — it is the data-parallel term, not the edge budget.
    """
    total = 0.0
    for r in rows:
        if r.op in ("all-gather", "all-to-all"):
            total += r.bytes_total * (n_shards - 1) / n_shards
        elif r.op == "reduce-scatter":
            total += r.bytes_total * (n_shards - 1)
        elif r.op == "collective-permute":
            total += r.bytes_total
    return int(round(total))


def analytic_budget(
    metas: dict,
    batch_local: int,
    hidden_dim: int,
    itemsize: int = 4,
    rounds: Optional[dict] = None,
) -> list[dict]:
    """Expected exchange bytes per edge set per training step, from the
    partition metadata alone. ``rounds`` maps edge-set name -> number
    of exchanges per FORWARD (default 1; GraphLAM's m2m runs once per
    processor layer); the backward mirrors each exchange (ppermute VJP
    is the reverse permute, tiled all_gather VJP is a same-size
    psum_scatter), hence the x2."""
    rounds = rounds or {}
    out = []
    for name, meta in metas.items():
        n_ex = rounds.get(name, 1) * 2
        if meta.strategy == "all_gather":
            rows_moved = meta.n_send_local * (meta.n_shards - 1)
            n_coll = 1
        else:
            rows_moved = sum(meta.halo_sizes)
            n_coll = len(meta.offsets)
        payload = rows_moved * batch_local * hidden_dim * itemsize
        out.append(
            {
                "edge_set": name,
                "strategy": meta.strategy,
                "offsets": list(meta.offsets),
                "rows_per_exchange": rows_moved,
                "exchanges_per_step": n_ex,
                "collectives_per_step": n_coll * n_ex,
                "bytes_per_step": payload * n_ex,
            }
        )
    return out


def projected_efficiency(
    step_time_s: float,
    bytes_per_step: float,
    n_collectives: int,
    n_shards: int,
    ici_bytes_s: float = V5E_ICI_ONEWAY_BYTES_S,
) -> dict:
    """Projected grid-points/s scaling efficiency at ``n_shards`` chips:
    compute shrinks ~1/P (measured executor overhead at P=1 is separate
    and <2%, docs/scaling.md), communication is added serially (no
    overlap credit — a conservative floor)."""
    t_comp = step_time_s / n_shards
    t_comm = (
        bytes_per_step / ici_bytes_s + n_collectives * COLLECTIVE_LATENCY_S
    )
    eff = t_comp / (t_comp + t_comm)
    return {
        "n_shards": n_shards,
        "t_comp_ms": t_comp * 1e3,
        "t_comm_ms": t_comm * 1e3,
        "efficiency": eff,
    }


def format_markdown(
    hlo_rows: Sequence[CollectiveRow],
    analytic: Sequence[dict],
    projections: Sequence[dict],
    header: str,
) -> str:
    lines = [f"## Collective budget — {header}", ""]
    lines += [
        "| op | payload bytes | count | total bytes | attributed |",
        "|---|---|---|---|---|",
    ]
    for r in hlo_rows:
        lines.append(
            f"| {r.op} | {r.bytes_each:,} | {r.count} |"
            f" {r.bytes_total:,} | {r.attributed} |"
        )
    lines += ["", "### Analytic per-edge-set budget", ""]
    lines += [
        "| edge set | strategy | offsets | rows/exchange |"
        " exchanges/step | bytes/step |",
        "|---|---|---|---|---|---|",
    ]
    for a in analytic:
        lines.append(
            f"| {a['edge_set']} | {a['strategy']} | {a['offsets']} |"
            f" {a['rows_per_exchange']:,} | {a['exchanges_per_step']} |"
            f" {a['bytes_per_step']:,} |"
        )
    lines += ["", "### Projected scaling efficiency (no-overlap floor)", ""]
    lines += [
        "| P | t_comp (ms) | t_comm (ms) | efficiency |",
        "|---|---|---|---|",
    ]
    for p in projections:
        lines.append(
            f"| {p['n_shards']} | {p['t_comp_ms']:.2f} |"
            f" {p['t_comm_ms']:.3f} | {p['efficiency'] * 100:.1f}% |"
        )
    lines.append("")
    return "\n".join(lines)
