"""HLO collective audit: verify the SPMD partitioner placed the collectives the
sharding design intends.

The gauss-sharded render step should communicate the SMALL projected splat
representation (all-gather of ~[C, few] f32 before the global depth sort /
binning) and psum gradients; it must NOT all-gather the raw learnable
parameter tensors (that would make primitive sharding pointless). This module
parses the optimized HLO of a compiled step and reports every collective with
its output byte size so tests (and the multi-chip dryrun) can assert the
contract.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1,
}

_COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|f8|s64|s32|s16|s8|u64|u32|u16|u8|pred)\[([0-9,]*)\]")


class Collective(NamedTuple):
    op: str  # HLO opcode, e.g. "all-gather"
    shapes: tuple  # dtype[dims] strings of the instruction outputs
    bytes: int  # total output bytes


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def collective_report(hlo_text: str) -> List[Collective]:
    """Parse optimized HLO text; return every collective instruction with its
    output payload size."""
    out = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # Instruction lines look like: "%name = TYPE op(...)" or "name = TYPE op(...)".
        m = re.match(r"%?[\w.\-]+\s*=\s*(.+)$", stripped)
        if not m:
            continue
        rest = m.group(1)
        opm = re.search(r"\b(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(", rest)
        if not opm:
            continue
        if opm.group(2) == "-done":
            # Async collectives appear as start/done pairs; counting both
            # double-counts the op and inflates byte totals.
            continue
        # Output shape(s) are everything before the opcode token.
        head = rest[: opm.start()]
        shapes = _SHAPE_RE.findall(head)
        total = sum(_shape_bytes(d, dims) for d, dims in shapes)
        out.append(
            Collective(
                op=opm.group(1),
                shapes=tuple(f"{d}[{dims}]" for d, dims in shapes),
                bytes=total,
            )
        )
    return out


def hlo_of_compiled(compiled) -> str:
    """Optimized HLO text of a jax compiled computation."""
    mods = compiled.runtime_executable().hlo_modules()
    return "\n".join(m.to_string() for m in mods)


def assert_no_large_gathers(report: List[Collective], max_gather_bytes: int):
    """Fail if any all-gather moves more than ``max_gather_bytes`` — the
    primitive-sharding contract (only the projected splat representation is
    gathered, never the raw parameters)."""
    offenders = [c for c in report if c.op == "all-gather" and c.bytes > max_gather_bytes]
    assert not offenders, (
        "all-gathers exceeding the projected-representation budget "
        f"({max_gather_bytes}B): {offenders}"
    )


def assert_no_param_gathers(report: List[Collective], trailing_dims, min_rows: int):
    """Fail if an all-gather output looks like a raw learnable-parameter tensor:
    trailing dims matching a distinctive param leaf (e.g. features_rest's
    (15, 3), rotation's (4,)) with a leading row count >= min_rows. The
    projected representation (means2d/conic/props rows of 2/3/16 floats) never
    has these trailing shapes, so this is robust where byte budgets are not."""
    offenders = []
    for c in report:
        if c.op != "all-gather":
            continue
        for s in c.shapes:
            m = _SHAPE_RE.match(s)
            dims = tuple(int(d) for d in m.group(2).split(",") if d)
            for tail in trailing_dims:
                tail = tuple(tail)
                if len(dims) >= len(tail) + 1 and dims[-len(tail):] == tail:
                    rows = 1
                    for d in dims[: -len(tail)]:
                        rows *= d
                    if rows >= min_rows:
                        offenders.append((c.op, s))
    assert not offenders, f"raw-parameter all-gathers detected: {offenders}"


def summarize(report: List[Collective]) -> str:
    lines = []
    for c in report:
        lines.append(f"  {c.op:20s} {c.bytes/1e6:10.3f} MB  {', '.join(c.shapes[:4])}")
    by_op = {}
    for c in report:
        by_op.setdefault(c.op, [0, 0])
        by_op[c.op][0] += 1
        by_op[c.op][1] += c.bytes
    head = [f"{op}: n={n} total={b/1e6:.2f}MB" for op, (n, b) in sorted(by_op.items())]
    return "; ".join(head) + "\n" + "\n".join(lines)
